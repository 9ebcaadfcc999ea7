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

  test("real ImageIO codec: decode, featurize, resize round-trip on generated PNGs") {
    import graft.ops.Multimodal.MediaAsset
    import graft.ops.ImageIoCodec
    import java.awt.image.BufferedImage
    // deterministic gradient images of varying dims, PNG-encoded —
    // actual image bytes through the actual codec, not the stub
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val v = (x * 7 + y * 13 + seed) % 256
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
      }
      ImageIoCodec.encodePng(img)
    }
    val spark2 = spark
    import spark2.implicits._
    val assets = Seq(
      MediaAsset(1L, "en", png(64, 48, 0)),
      MediaAsset(2L, "en", png(200, 100, 50)),
      MediaAsset(3L, "de", png(16, 16, 99)),
      MediaAsset(4L, "en", "not an image at all".getBytes("UTF-8")))
      .toDS()
    val feats = Multimodal.featurizeImages(assets)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).width === 64 &&
      feats(1L).height === 48)
    assert(feats(2L).decoded && feats(2L).width === 200 &&
      feats(2L).height === 100)
    assert(!feats(4L).decoded, "text bytes must not 'decode'")
    // gray gradient: luma == pixel value; mean must sit inside (0, 255)
    // and match a driver-side recompute exactly
    val localLuma = ImageIoCodec.meanLuma(
      ImageIoCodec.decode(png(64, 48, 0)).get)
    assert(feats(1L).mean_luma === localLuma)
    assert(feats(1L).mean_luma > 0.0 && feats(1L).mean_luma < 255.0)

    val resized = Multimodal.resizeImages(assets, 50)
      .collect().map(a => a.doc_id -> a.payload).toMap
    val r2 = ImageIoCodec.decode(resized(2L)).get
    assert(r2.getWidth === 50 && r2.getHeight === 25,
      "aspect-preserving scale to maxDim")
    // already-fitting image and non-image pass through byte-identical
    assert(resized(3L).toSeq === png(16, 16, 99).toSeq)
    assert(new String(resized(4L), "UTF-8") === "not an image at all")
    // re-encoded PNG stays decodable and keeps the scaled-down content
    assert(ImageIoCodec.meanLuma(r2) > 0.0)
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
