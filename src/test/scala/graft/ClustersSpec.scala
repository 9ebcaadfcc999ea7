package graft

import org.apache.spark.sql.functions._

import graft.ops.{Clusters, Dedup}

/** Connected-components clustering: known-graph cases plus the full
  * pairs → clusters → survivors dedup path on the fixture.
  */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components of a chain, a triangle, and an isolated pair") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("pointer jumping: a 200-hop chain converges well under its diameter") {
    // plain min-label propagation needs ~200 rounds here; the
    // path-halving step must get there in O(log d) — 12 rounds is
    // log2(200)≈7.6 plus slack, far under the diameter.
    // smallGraphThreshold = 0 forces the distributed loop (the default
    // adaptive path would union-find a 199-edge graph on the driver)
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b", maxIter = 12,
        smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (1L to 200L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("adaptive small-graph path labels exactly as the distributed loop") {
    // chain + triangle + isolated pair + a 40-vertex random-ish graph:
    // the driver union-find (default path at this size) and the forced
    // distributed fixpoint must agree row for row
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L)) ++
      (0L until 40L).map(i => (i * 7 % 40 + 100L, i * 13 % 40 + 100L)))
      .toDF("a", "b")
    val small = Clusters.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    val loop = Clusters.connectedComponents(pairs, "a", "b",
        smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(small == loop)
    // self-loops (i*7%40 == i*13%40) must label as their own component
    assert(small.contains(100L))
  }

  test("threshold boundary: a list one over the threshold takes the loop") {
    // 5 edges, threshold 4 → the probe sees 5 rows and falls through to
    // the distributed loop; result must be identical either way
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 10L), (10L, 11L))
      .toDF("a", "b")
    val viaLoop = Clusters.connectedComponents(pairs, "a", "b",
        smallGraphThreshold = 4)
      .as[(Long, Long)].collect().toMap
    assert(viaLoop == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L,
      8L -> 7L, 9L -> 9L, 10L -> 9L, 11L -> 9L))
  }

  test("reliable-checkpoint mode labels exactly as localCheckpoint mode") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    try {
      val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
        (11L, 12L), (20L, 21L)) ++ (30L until 60L).map(i => (i, i + 1)))
        .toDF("a", "b")
      // smallGraphThreshold = 0: checkpointing only exists on the
      // distributed loop, which the adaptive path would skip here
      val local = Clusters.connectedComponents(pairs, "a", "b",
          smallGraphThreshold = 0)
        .as[(Long, Long)].collect().toMap
      val reliable = Clusters.connectedComponents(pairs, "a", "b",
          checkpointDir = Some(dir), smallGraphThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(reliable == local)
      // the reliable mode actually wrote durable checkpoint state
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable checkpoint must write to the dir")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("non-convergence throws instead of returning partial labels") {
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Clusters.connectedComponents(pairs, "a", "b", maxIter = 2,
        smallGraphThreshold = 0)
    }
    assert(ex.getMessage.contains("fixpoint not confirmed"))
  }

  test("a conflicting pre-set checkpoint dir throws instead of hijacking it") {
    val sc = spark.sparkContext
    val preset = java.nio.file.Files
      .createTempDirectory("graft-cc-preset").toString
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(preset)
    val other = java.nio.file.Files
      .createTempDirectory("graft-cc-other").toString
    try {
      val pairs = Seq((1L, 2L)).toDF("a", "b")
      val ex = intercept[IllegalArgumentException] {
        Clusters.connectedComponents(pairs, "a", "b",
          checkpointDir = Some(other), smallGraphThreshold = 0)
      }
      assert(ex.getMessage.contains("refusing to redirect"))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(preset))
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(other))
    }
  }

  test("edge direction does not matter") {
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 1L)).toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.keySet == Set(1L, 2L, 5L, 9L))
  }

  test("fixture near-dup clusters agree with a driver-side union-find") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        Dedup.tokenSet(col("text")).as("tok"))
    val pairDf = Dedup.jaccardPairs(docs, "doc_id", "tok", "source", 0.9)
    val pairs = pairDf.select($"a_id", $"b_id").as[(Long, Long)].collect()

    // reference union-find on the collected edge list
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap

    val got = Clusters.connectedComponents(pairDf, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)

    // full-corpus assignment: every doc labeled, survivors = distinct
    // components, and filtering to representatives drops exactly the
    // duplicate count
    val assigned = Clusters.assignComponents(
      docs.select($"doc_id"), "doc_id", pairDf, "a_id", "b_id")
    val nDocs = docs.count()
    assert(assigned.count() == nDocs)
    val nComponents = assigned.select($"component").distinct().count()
    val survivors = assigned.filter($"doc_id" === $"component").count()
    assert(survivors == nComponents)
    val dupDocs = expected.size - expected.values.toSet.size
    assert(nComponents == nDocs - dupDocs)
  }
}
