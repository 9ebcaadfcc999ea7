package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity search over an embedding column (north star:
  * approximate-nearest-neighbor at 100 TB).
  *
  * Methods, in ascending scale:
  *  - cosine / brute-force top-k: exact, one broadcast of the query —
  *    the correctness baseline.
  *  - blocked near-dup pairs: brute force confined to a blocking key.
  *  - IVF: assign every vector to its nearest seed centroid (one
  *    broadcast join), search only the query's cell. Deterministic seed
  *    choice (vec_id stride) keeps it oracle-checkable; swap in k-means
  *    centroids at real scale without changing the plan shape.
  */
object Similarity {

  /** Cast array<float> → array<double> for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Native codegen dot product (graft.functions.DotProduct): float
    * arrays accumulate in double, bit-identical to cast-then-HOF but
    * ~30× faster (no per-element interpreted lambda).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force cosine top-k against a single query vector
    * (broadcast). Ranked on the rounded score with an id tie-break so
    * the cutoff is deterministic.
    */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val v = vectors.select(col(idCol), toDouble(col(vecCol)).as("_v"))
      .crossJoin(broadcast(
        query.select(toDouble(col(queryVecCol)).as("_q"))))
    v.select(col(idCol), round(cosine(col("_v"), col("_q")), 3).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Brute-force near-duplicate pairs within a blocking key. */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      blockCol: Column, minCosine: Double): DataFrame = {
    val base = vectors.select(col(idCol).as("_id"), blockCol.as("_block"),
      toDouble(col(vecCol)).as("_v"))
    val a = base.select(col("_id").as("a_id"), col("_block"), col("_v").as("a_v"))
    val b = base.select(col("_id").as("b_id"), col("_block"), col("_v").as("b_v"))
    a.join(b, Seq("_block"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select(col("a_id"), col("b_id"), round(col("cos"), 3).as("sim"))
  }

  /** The 100 TB embedding near-dup path — sign-random-projection LSH
    * (Charikar SimHash for vectors) generating candidates, exact cosine
    * verifying them. Mirrors Dedup.nearDupPairs' generator∘verifier
    * shape: signature per row (one codegen kernel pass), explode into
    * `bands` chunks, shuffle once on (band, chunk), id-only candidate
    * join, one vector re-join per unique pair, exact verify.
    *
    * Recall is the SRP S-curve: with chunk width w = 64/bands,
    * P(candidate) = 1 − (1 − (1 − θ/π)^w)^bands — near-1 for genuine
    * near-duplicates (θ→0), falling fast for unrelated vectors. No
    * false positives survive the exact verify.
    */
  def signLshPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bands: Int = 8, seed: Long = 42L,
      blockCol: Column = lit(0)): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val base = vectors.select(col(idCol).as("id"), blockCol.as("block"),
      toDouble(col(vecCol)).as("v"))
    val sigs = base.select(col("id"), col("block"),
      graft.functions.VectorFunctions.srpSignature(col("v"), seed).as("sig"))
    val chunkStructs = (0 until bands).map { j =>
      struct(lit(j).as("band_id"),
        shiftright(col("sig"), j * width).bitwiseAND(lit(mask))
          .as("band_val"))
    }
    val chunked = sigs.select(col("id"), col("block"),
        explode(array(chunkStructs: _*)).as("c"))
      .select(col("id"), col("block"), col("c.band_id"), col("c.band_val"))
    val a = chunked.select(col("block"), col("band_id"), col("band_val"),
      col("id").as("a_id"))
    val b = chunked.select(col("block"), col("band_id"), col("band_val"),
      col("id").as("b_id"))
    val candidates = a.join(b, Seq("block", "band_id", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    candidates
      .join(base.select(col("id").as("a_id"), col("v").as("a_v")), "a_id")
      .join(base.select(col("id").as("b_id"), col("v").as("b_v")), "b_id")
      .select(col("a_id"), col("b_id"),
        cosine(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select(col("a_id"), col("b_id"), round(col("cos"), 3).as("sim"))
  }

  /** IVF-style ANN: seeds are every `seedStride`-th vec_id (deterministic
    * stand-in for k-means centroids); every vector joins its arg-max
    * cosine seed; the query searches only its own cell.
    */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, queryId: Long, k: Int): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val seeds = base.filter(col("id") % seedStride === 0)
      .select(col("id").as("seed_id"), col("v").as("seed_v"))
    val assigned = base.crossJoin(broadcast(seeds))
      .select(col("id"), col("v"), col("seed_id"),
        cosine(col("v"), col("seed_v")).as("seed_cos"))
      .groupBy(col("id"))
      .agg(max_by(col("seed_id"), col("seed_cos")).as("cell"),
        first(col("v")).as("v"))
    val queryCell = assigned.filter(col("id") === queryId)
      .select(col("cell").as("q_cell"), col("v").as("q_v"))
    assigned.join(broadcast(queryCell), col("cell") === col("q_cell"))
      .filter(col("id") =!= queryId)
      .select(col("id"), round(cosine(col("v"), col("q_v")), 3).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Lloyd k-means on cosine assignment — the "swap in k-means without
    * changing the plan shape" step promised by [[ivfTopK]]'s stride
    * seeds. Deterministic: stride-seed init, fixed iteration count, and
    * every step is a plain DataFrame plan (assign = broadcast arg-max
    * join; recompute = [[graft.functions.VectorSumAgg]] / count — one
    * map-side-combinable aggregate shuffling k·dim doubles per task).
    * Returns `(cell, cv)` centroid rows.
    */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, iters: Int): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    var centroids = base.filter(col("id") % seedStride === 0)
      .select(col("id").as("cell"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = base.crossJoin(broadcast(centroids))
        .select(col("id"), col("v"), col("cell"),
          cosine(col("v"), col("cv")).as("c"))
        .groupBy(col("id"))
        .agg(max_by(col("cell"), col("c")).as("cell"), first(col("v")).as("v"))
      centroids = assigned.groupBy(col("cell"))
        .agg(graft.functions.VectorFunctions.vectorSum(col("v")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cell"),
          transform(col("s"), x => x / col("n")).as("cv"))
    }
    centroids
  }

  /** Multi-probe IVF ANN against precomputed centroids: vectors assign
    * to their arg-max cell; the query searches its `nProbe` closest
    * cells instead of one, trading a bounded fan-out for recall.
    */
  def ivfTopKWith(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryId: Long, k: Int,
      nProbe: Int = 1): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val assigned = base.crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cell"),
        cosine(col("v"), col("cv")).as("c"))
      .groupBy(col("id"))
      .agg(max_by(col("cell"), col("c")).as("cell"), first(col("v")).as("v"))
    val query = base.filter(col("id") === queryId)
      .select(col("v").as("q_v"))
    val probed = centroids.crossJoin(broadcast(query))
      .select(col("cell").as("q_cell"), col("q_v"),
        cosine(col("cv"), col("q_v")).as("qc"))
      .orderBy(col("qc").desc, col("q_cell"))
      .limit(nProbe)
      .select(col("q_cell"), col("q_v"))
    assigned.join(broadcast(probed), col("cell") === col("q_cell"))
      .filter(col("id") =!= queryId)
      .select(col("id"), round(cosine(col("v"), col("q_v")), 3).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }
}
