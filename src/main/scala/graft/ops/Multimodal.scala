package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-parallel over a typed Dataset.
  *
  * IMAGE payloads have a REAL pure-JVM codec ([[ImageIoCodec]]:
  * javax.imageio decode, Graphics2D resize, PNG re-encode) behind the
  * same Dataset contract — [[featurizeImages]] / [[resizeImages]].
  * The original STUB paths ([[featurize]] / [[resize]] /
  * [[frameSample]]) remain for the fixture's non-image payloads and
  * for the portable span/stride oracle math (audio/video codecs are
  * not available in this environment; their fakes stay clearly
  * marked). Everything around either codec (schema, Encoder-backed
  * batch shape, mapPartitions signature, partition-level batching) is
  * the same contract.
  */
object Multimodal {

  /** One media asset: payload is an opaque encoded blob. */
  final case class MediaAsset(doc_id: Long, lang: String, payload: Array[Byte])

  /** Extracted features. With a real codec, `fake_brightness` would be
    * e.g. mean luma of the decoded frame.
    */
  final case class MediaFeatures(
      doc_id: Long, lang: String, byte_len: Long, first_byte: Int,
      fake_brightness: Double)

  /** Wrap a text table as a binary-payload asset table (the fixture has
    * no real media; UTF-8 bytes stand in for an encoded blob).
    */
  def assetsFromDocuments(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    docs.select(col("doc_id"), col("lang"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaAsset]
  }

  /** Partition-parallel "decode" + feature extraction. One iterator per
    * partition: a real codec would allocate its native context once here
    * and stream assets through it — that is why this is mapPartitions
    * and not a per-row UDF.
    */
  def featurize(assets: Dataset[MediaAsset])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    assets.mapPartitions { it =>
      // >>> STUB DECODER: deterministic fake standing in for an
      // image/audio decode (libs unavailable in this container). <<<
      it.map { a =>
        val len = a.payload.length.toLong
        val first = if (a.payload.nonEmpty) a.payload(0) & 0xFF else 0
        MediaFeatures(a.doc_id, a.lang, len, first,
          len.toDouble / (first + 1))
      }
    }
  }

  /** "Resize" an asset to at most `targetBytes` (STUB: a real impl would
    * decode → scale → re-encode; the deterministic fake stride-samples
    * the payload bytes, preserving the batch/partition shape a real
    * scaler would have).
    */
  def resize(assets: Dataset[MediaAsset], targetBytes: Int)(implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.payload.length <= targetBytes) a
        else {
          // >>> STUB SCALER: deterministic stride sampling. <<<
          val stride = math.ceil(a.payload.length.toDouble / targetBytes)
          val out = Array.ofDim[Byte](
            math.ceil(a.payload.length / stride).toInt)
          var i = 0
          while (i < out.length) {
            out(i) = a.payload((i * stride).toInt)
            i += 1
          }
          a.copy(payload = out)
        }
      }
    }
  }

  /** Decoded-image features ([[featurizeImages]]): dimensions and mean
    * luma when the payload decoded, `decoded = false` passthrough row
    * (zero dims, NaN-free 0.0 luma) when no installed reader matched.
    */
  final case class ImageFeatures(
      doc_id: Long, lang: String, byte_len: Long, decoded: Boolean,
      width: Int, height: Int, mean_luma: Double)

  /** REAL image featurization — javax.imageio decode per asset, one
    * reader probe per partition iterator (the mapPartitions shape the
    * stub documented, now doing actual work). Undecodable payloads
    * become `decoded = false` rows instead of poisoning the partition:
    * at corpus scale some blobs are always corrupt, and a skipped row
    * is recoverable where a thrown task is not.
    */
  def featurizeImages(assets: Dataset[MediaAsset])(implicit s: SparkSession): Dataset[ImageFeatures] = {
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        ImageIoCodec.decode(a.payload) match {
          case Some(img) =>
            ImageFeatures(a.doc_id, a.lang, a.payload.length.toLong,
              decoded = true, img.getWidth, img.getHeight,
              ImageIoCodec.meanLuma(img))
          case None =>
            ImageFeatures(a.doc_id, a.lang, a.payload.length.toLong,
              decoded = false, 0, 0, 0.0)
        }
      }
    }
  }

  /** REAL image resize: decode → aspect-preserving scale so the longer
    * edge is at most `maxDim` → PNG re-encode. Payloads that do not
    * decode (or already fit) pass through byte-identical.
    */
  def resizeImages(assets: Dataset[MediaAsset], maxDim: Int)(implicit s: SparkSession): Dataset[MediaAsset] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        ImageIoCodec.decode(a.payload) match {
          case Some(img)
              if img.getWidth > maxDim || img.getHeight > maxDim =>
            a.copy(payload = ImageIoCodec.encodePng(
              ImageIoCodec.resizeToMaxDim(img, maxDim)))
          case _ => a
        }
      }
    }
  }

  /** One sampled "frame" of a video-like payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Sample `nFrames` evenly spaced frames (STUB: a real impl would seek
    * keyframes; the fake splits the payload into `nFrames` equal spans).
    * One input row fans out to `nFrames` rows — the flatMap shape a real
    * frame sampler has.
    */
  def frameSample(assets: Dataset[MediaAsset], nFrames: Int)(implicit s: SparkSession): Dataset[Frame] = {
    import s.implicits._
    assets.flatMap { a =>
      val n = math.max(1, math.min(nFrames, a.payload.length))
      val span = math.max(1, a.payload.length / n)
      (0 until n).map { i =>
        val start = i * span
        val end = if (i == n - 1) a.payload.length
          else math.min(a.payload.length, start + span)
        Frame(a.doc_id, i, a.payload.slice(start, end))
      }
    }
  }
}

/** Pure-JVM image codec (javax.imageio + java.awt — present in every
  * JRE, no native deps): the REAL decode/resize/encode a production
  * image pipeline plugs into [[Multimodal.featurizeImages]] /
  * [[Multimodal.resizeImages]]. Reads whatever ImageIO service
  * providers the JVM registers (PNG/JPEG/BMP/GIF/WBMP in a stock JRE).
  * All methods are thread-safe per call (fresh reader state; no shared
  * `ImageReader` instances), so executor-side task parallelism is safe.
  */
object ImageIoCodec {
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  /** None when no installed reader claims the bytes (text blobs, truncated
    * files) — the caller's skip-not-throw contract rests on this.
    */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** Mean Rec.601 luma (0.299 R + 0.587 G + 0.114 B) over all pixels,
    * in [0, 255]. Deterministic per decoded raster.
    */
  def meanLuma(img: BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sum / (w.toLong * h)
  }

  /** Aspect-preserving scale so max(width, height) == maxDim (no-op
    * upscale guard is the caller's: this always scales). Bilinear via
    * Graphics2D — the stock JVM resampler.
    */
  def resizeToMaxDim(img: BufferedImage, maxDim: Int): BufferedImage = {
    val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
    val w = math.max(1, math.round(img.getWidth * scale).toInt)
    val h = math.max(1, math.round(img.getHeight * scale).toInt)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** PNG bytes (lossless, always-available writer). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
