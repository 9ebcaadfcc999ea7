package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Multimodal

/** Multimodal plumbing: binary payloads through the typed partition-level
  * pipeline (decode/featurize/resize/frame-sample stubs; the Spark-side
  * schema, Encoders, and batch shapes are the real contract).
  */
class MultimodalSpec extends SparkSpec {
  private implicit lazy val s: SparkSession = spark
  import org.apache.spark.sql.functions._

  private lazy val assets = Multimodal.assetsFromDocuments(
    Tables.load(spark, sf0001, "documents"))

  test("payload bytes equal n_chars (ASCII fixture)") {
    val feats = Multimodal.featurize(assets)
    val joined = feats.toDF().join(
      Tables.load(spark, sf0001, "documents").select("doc_id", "n_chars"),
      "doc_id")
    assert(joined.filter(col("byte_len") =!= col("n_chars")).count() === 0)
  }

  test("resize bounds payloads and is deterministic") {
    val resized = Multimodal.resize(assets, 64)
    val lens = resized.toDF().selectExpr("length(payload) AS l")
    assert(lens.filter(col("l") > 64).count() === 0)
    val a = resized.toDF().orderBy("doc_id").limit(3)
      .selectExpr("doc_id", "hex(payload)").collect().map(_.toString)
    val b = Multimodal.resize(assets, 64).toDF().orderBy("doc_id").limit(3)
      .selectExpr("doc_id", "hex(payload)").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("frameSample fans out n frames that reassemble the payload") {
    val frames = Multimodal.frameSample(assets, 4)
    val counts = frames.toDF().groupBy("doc_id").count()
    assert(counts.filter(col("count") =!= 4).count() === 0)
    val total = frames.toDF().selectExpr("sum(length(frame))").head().getLong(0)
    val expected = assets.toDF().selectExpr("sum(length(payload))").head().getLong(0)
    assert(total === expected)
  }
}
