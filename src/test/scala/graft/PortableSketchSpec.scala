package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** The portable (md5-derived) SimHash and SRP twins (x71/x72): kernel ≡
  * the literal SQL spelling, and the chunk-banded join ≡ all-pairs
  * (the pigeonhole guarantee the oracle equality rests on).
  */
class PortableSketchSpec extends SparkSpec {

  /** Literal spelling of the x71 signature: hex-string md5, digit i's
    * high bit votes — character-level, exactly as the oracle SQL.
    */
  private def refSig32(toks: Seq[String]): Long = {
    val votes = new Array[Int](32)
    toks.foreach { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (0 until 32).foreach { i =>
        if ("89abcdef".contains(hex(i))) votes(i) += 1 else votes(i) -= 1
      }
    }
    (0 until 32).map(i => if (votes(i) > 0) 1L << i else 0L).sum
  }

  test("portable simhash kernel equals the hex-string spelling") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 50).map { i =>
      (i, (0 until rnd.nextInt(30)).map(_ => "w" + rnd.nextInt(10)))
    }
    val got = docs.toDF("id", "tok")
      .select(col("id"), graft.functions.PortableMinHashFunctions
        .portableSimhash32(col("tok")).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    docs.foreach { case (i, toks) =>
      assert(got(i) === refSig32(toks), s"doc $i toks=$toks")
    }
  }

  test("banded simhash pairs equal all-pairs (pigeonhole, fixture)") {
    val docs = Tables.load(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(col("text")).as("tok"))
    val banded = Dedup.portableSimhashPairs(docs, "doc_id", "tok", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = docs.select(col("doc_id"),
        graft.functions.PortableMinHashFunctions
          .portableSimhash32(col("tok")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val allPairs = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(banded === allPairs)
  }

  test("banded portable-srp pairs equal all-pairs (pigeonhole, fixture)") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
    val banded = Similarity.portableSrpPairs(
        vecs, "vec_id", "embedding", maxHamming = 7, numChunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent signature: quantize + integer ±1 dot per bit
    val qv = vecs.select(col("vec_id"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * lit(1000)).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val sigs = qv.map { case (id, q) =>
      val sig = (0 until 32).map { i =>
        val vote = q.indices.map(j =>
          q(j) * Similarity.portableSrpWeight(i, j)).sum
        if (vote > 0) 1L << i else 0L
      }.sum
      id -> sig
    }
    val allPairs = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (ia, ib, h.toLong)).toSet
    assert(banded === allPairs)
    assert(allPairs.nonEmpty, "threshold must keep the check non-vacuous")
  }
}
