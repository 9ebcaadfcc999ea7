package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Similarity-search correctness beyond the DuckDB oracle: brute-force
  * top-k agrees with a locally-computed exact answer, and IVF returns a
  * subset consistent with it.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()

  private lazy val localTop: Seq[(Long, Double)] = {
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val q = vecs.find(_._1 == 0L).get._2.map(_.toDouble)
    def cos(a: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nq = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * q(i); na += a(i) * a(i); nq += q(i) * q(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nq))
    }
    vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        val c = cos(v.map(_.toDouble))
        (id, BigDecimal(c).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(10).toSeq
  }

  test("brute-force top-10 equals local exact computation") {
    val got = Similarity.bruteForceTopK(
        emb.filter($"vec_id" =!= 0), "vec_id", "embedding",
        emb.filter($"vec_id" === 0), "embedding", 10)
      .as[(Long, Double)].collect().toSeq
      .sortBy { case (id, c) => (-c, id) }
    assert(got === localTop)
  }

  test("IVF top-k sims are bounded by the exact top-1 and non-empty") {
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        seedStride = 251, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(ivf.nonEmpty && ivf.size <= 10)
    val bestExact = localTop.head._2
    assert(ivf.forall(_._2 <= bestExact + 1e-9))
  }
}
