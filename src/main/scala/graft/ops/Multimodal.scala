package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-parallel over a typed Dataset.
  *
  * The actual media decode is a STUB — image/audio codecs are not
  * available in this environment — replaced by a clearly-marked
  * deterministic fake. Everything around it (schema, Encoder-backed
  * batch shape, mapPartitions signature, partition-level batching) is
  * the real contract a codec would drop into.
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
