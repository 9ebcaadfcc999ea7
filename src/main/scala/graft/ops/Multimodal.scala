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
  * AUDIO payloads have a REAL pure-JVM codec too ([[WavCodec]]:
  * hand-rolled RIFF/WAVE PCM chunk parser → mono mixdown → RMS /
  * zero-cross features, [[featurizeAudio]]), and multi-frame "video"
  * sampling is REAL over animated GIF ([[GifFrames]] +
  * [[frameSampleGif]] — the one multi-frame container a stock JRE
  * decodes; general video containers would need native codecs this
  * environment lacks). The original STUB paths ([[featurize]] /
  * [[resize]] / [[frameSample]]) remain for the fixture's non-media
  * payloads and the portable span/stride oracle math. Everything
  * around every codec (schema, Encoder-backed batch shape,
  * mapPartitions signature, partition-level batching) is the same
  * contract.
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

  final case class ImageHashRow(doc_id: Long, ahash: Long, decoded: Boolean)

  /** Deterministic 64×64 four-quadrant PNG per document (quadrant q's
    * gray level = `(doc_id%40 · 53 + q·17) % 256`) — the generated-
    * raster fixture for the image-dedup path: the pattern is an exact
    * arithmetic function of doc_id, so an oracle can predict the
    * [[ImageIoCodec.aHash64]] of the REAL encode→decode round trip
    * analytically (solid quadrants make every 8×8 aHash cell equal
    * its quadrant's gray). 40 patterns over the corpus → genuine
    * hash-duplicate groups.
    */
  def syntheticQuadImages(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    import java.awt.image.BufferedImage
    // codec kernels downstream serialize on a sub-splittable scan —
    // rescue here so encode AND decode run at session parallelism
    // (Parallelize.ensure; no-op at scale)
    Parallelize.ensure(
        docs.select(col("doc_id"), col("lang")).as[(Long, String)])
      .mapPartitions { it =>
        it.map { case (id, lang) =>
          val pid = (id % 40L).toInt
          val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
          val gfx = img.createGraphics()
          try {
            var q = 0
            while (q < 4) {
              val g = (pid * 53 + q * 17) % 256
              gfx.setColor(new java.awt.Color(g, g, g))
              gfx.fillRect((q % 2) * 32, (q / 2) * 32, 32, 32)
              q += 1
            }
          } finally gfx.dispose()
          MediaAsset(id, lang, ImageIoCodec.encodePng(img))
        }
      }
  }

  /** Perceptual aHash per asset — decode + [[ImageIoCodec.aHash64]],
    * skip-not-throw on undecodable payloads (the featurizeImages
    * contract). The hash is the exact-dedup/banding key for image
    * dedup at corpus scale: group equal hashes, or band the 64 bits
    * for hamming-tolerant buckets (the x8 LSH shape).
    */
  def imageAHashes(assets: Dataset[MediaAsset])(implicit s: SparkSession): Dataset[ImageHashRow] = {
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        ImageIoCodec.decode(a.payload) match {
          case Some(img) =>
            ImageHashRow(a.doc_id, ImageIoCodec.aHash64(img), decoded = true)
          case None => ImageHashRow(a.doc_id, 0L, decoded = false)
        }
      }
    }
  }

  /** 64-bit energy-envelope hash of decoded PCM audio — the audio
    * analog of [[ImageIoCodec.aHash64]] (bit k = "segment k is at
    * least as loud as the whole clip"), the cheap perceptual key for
    * audio dedup. ALL-INTEGER contract: each mono float is mapped
    * back to its exact 16-bit integer (`round(x·32768)` — lossless
    * for integer-PCM-decoded values, which are exact multiples of
    * 2⁻¹⁵), segments are the floor-boundary partition
    * `seg = i·64/n`, and the loudness test is the exact
    * cross-multiplication `segSum·n ≥ totalSum·segN` over absolute
    * sample values. Row-major bit order, bit k = `1L << k`; clips
    * shorter than 64 samples hash their present segments only.
    */
  def audioEnergyHash64(wav: WavCodec.WavAudio): Long = {
    val n = wav.mono.length
    if (n == 0) return 0L
    val segSum = new Array[Long](64)
    val segN = new Array[Long](64)
    var i = 0
    while (i < n) {
      val k = (i.toLong * 64L / n).toInt
      val r = math.abs(math.round(wav.mono(i) * 32768f).toLong)
      segSum(k) += r
      segN(k) += 1L
      i += 1
    }
    var totalSum = 0L
    var k = 0
    while (k < 64) { totalSum += segSum(k); k += 1 }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (segN(k) > 0L && segSum(k) * n >= totalSum * segN(k))
        hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Deterministic 16-bit mono square-wave WAV per document: 4
    * quarters of 512 samples, quarter q's amplitude
    * `((doc_id%25 · 31 + q·7) % 100) · 300` — the generated-clip
    * fixture for the audio-dedup path: amplitudes are exact
    * arithmetic of doc_id, |sample| is constant per quarter, so an
    * oracle predicts [[audioEnergyHash64]] of the REAL encode→decode
    * round trip analytically. 25 patterns → genuine duplicate groups.
    */
  def syntheticSquareWavs(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    // same degenerate-scan rescue as syntheticQuadImages
    Parallelize.ensure(
        docs.select(col("doc_id"), col("lang")).as[(Long, String)])
      .mapPartitions { it =>
        it.map { case (id, lang) =>
          val pid = (id % 25L).toInt
          val nSamples = 2048
          val data = new Array[Byte](nSamples * 2)
          var i = 0
          while (i < nSamples) {
            val q = i / 512
            val amp = ((pid * 31 + q * 7) % 100) * 300
            val v = if (i % 2 == 0) amp else -amp
            data(2 * i) = (v & 0xFF).toByte
            data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          def le32(v: Int): Unit = {
            bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
            bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
          }
          def le16(v: Int): Unit = {
            bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
          }
          bos.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
          bos.write("WAVE".getBytes("US-ASCII"))
          bos.write("fmt ".getBytes("US-ASCII")); le32(16)
          le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
          bos.write("data".getBytes("US-ASCII")); le32(data.length)
          bos.write(data)
          MediaAsset(id, lang, bos.toByteArray)
        }
      }
  }

  /** Energy hash per audio asset — decode + [[audioEnergyHash64]],
    * skip-not-throw on undecodable payloads.
    */
  def audioEnergyHashes(assets: Dataset[MediaAsset])(implicit s: SparkSession): Dataset[ImageHashRow] = {
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        WavCodec.decode(a.payload) match {
          case Some(wav) =>
            ImageHashRow(a.doc_id, audioEnergyHash64(wav), decoded = true)
          case None => ImageHashRow(a.doc_id, 0L, decoded = false)
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

  /** Decoded-audio features ([[featurizeAudio]]): format and signal
    * stats when the payload parsed as RIFF/WAVE PCM, `decoded = false`
    * passthrough otherwise (same skip-not-throw contract as images).
    */
  final case class AudioFeatures(
      doc_id: Long, lang: String, byte_len: Long, decoded: Boolean,
      sample_rate: Int, channels: Int, n_samples: Long,
      duration_s: Double, rms: Double, zero_cross_rate: Double)

  /** REAL audio featurization — [[WavCodec]] RIFF/WAVE PCM parse (pure
    * JVM, no native deps) per asset inside the same mapPartitions
    * contract: sample rate / channel count from the fmt chunk, RMS
    * energy and zero-crossing rate over the mono mixdown. The classic
    * cheap audio-quality gates (silence ⇒ rms ≈ 0; noise ⇒ high zcr)
    * a speech-data pipeline filters on before expensive ASR.
    */
  def featurizeAudio(assets: Dataset[MediaAsset])(implicit s: SparkSession): Dataset[AudioFeatures] = {
    import s.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        WavCodec.decode(a.payload) match {
          case Some(w) =>
            AudioFeatures(a.doc_id, a.lang, a.payload.length.toLong,
              decoded = true, w.sampleRate, w.channels,
              w.mono.length.toLong,
              w.mono.length.toDouble / w.sampleRate,
              WavCodec.rms(w.mono), WavCodec.zeroCrossRate(w.mono))
          case None =>
            AudioFeatures(a.doc_id, a.lang, a.payload.length.toLong,
              decoded = false, 0, 0, 0L, 0.0, 0.0, 0.0)
        }
      }
    }
  }

  /** One sampled, DECODED frame of a multi-frame (animated-GIF) payload
    * ([[frameSampleGif]]) with its per-frame features.
    */
  final case class ImageFrame(
      doc_id: Long, frame_idx: Int, src_frame: Int, width: Int,
      height: Int, mean_luma: Double)

  /** REAL frame sampling over multi-frame GIF payloads ([[GifFrames]]:
    * javax.imageio reads GIF sequences frame by frame): `nFrames`
    * evenly spaced frames are DECODED and featurized — the
    * keyframe-sampling shape of a video curation pass, on the one
    * multi-frame container a stock JRE can read. Undecodable payloads
    * yield no rows (skip-not-throw); payloads with fewer frames than
    * `nFrames` sample every frame once.
    */
  def frameSampleGif(assets: Dataset[MediaAsset], nFrames: Int)(implicit s: SparkSession): Dataset[ImageFrame] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    import s.implicits._
    assets.flatMap { a =>
      GifFrames.decode(a.payload) match {
        case Some(frames) if frames.nonEmpty =>
          val n = math.min(nFrames, frames.length)
          (0 until n).map { i =>
            // evenly spaced source indices, endpoints included
            val src = if (n == 1) 0
              else math.round(
                i.toDouble * (frames.length - 1) / (n - 1)).toInt
            val f = frames(src)
            ImageFrame(a.doc_id, i, src, f.getWidth, f.getHeight,
              ImageIoCodec.meanLuma(f))
          }
        case _ => Seq.empty
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

/** Pure-JVM RIFF/WAVE PCM codec — a hand-rolled chunk parser (no
  * javax.sound dependency, no native deps), the REAL audio decode
  * behind [[Multimodal.featurizeAudio]]. Supports the integer-PCM
  * subset (format tag 1; 8-bit unsigned / 16-bit signed
  * little-endian — what `ffmpeg -f wav` and every sound card emit),
  * mixes channels to mono floats in [-1, 1], and returns None on
  * anything else: truncated files, text blobs, compressed formats —
  * the caller's skip-not-throw contract. Chunk walking mirrors the
  * reference's footer-first file discipline
  * (`/root/reference/src/reader/metadata.cpp:198-243`): every length
  * is taken from the header actually present, never assumed.
  */
object WavCodec {

  /** Decoded PCM audio: `mono` is the channel-averaged signal. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      mono: Array[Float])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(payload: Array[Byte]): Option[WavAudio] = {
    if (payload.length < 44 || tag(payload, 0) != "RIFF" ||
        tag(payload, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(payload, off)
      val len = le32(payload, off + 4)
      if (len < 0 || off + 8 + len > payload.length) return None
      if (id == "fmt " && len >= 16)
        fmt = Some((le16(payload, off + 8), le16(payload, off + 10),
          le32(payload, off + 12), le16(payload, off + 22)))
      else if (id == "data") data = Some((off + 8, len))
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate, bits)), Some((dOff, dLen)))
          if ch >= 1 && rate >= 1 && (bits == 8 || bits == 16) =>
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = dLen / frameBytes
        val mono = new Array[Float](nFrames)
        var i = 0
        while (i < nFrames) {
          var sum = 0.0f
          var c = 0
          while (c < ch) {
            val p = dOff + i * frameBytes + c * bytesPerSample
            sum += (if (bits == 16) le16s(payload, p) / 32768.0f
              else ((payload(p) & 0xFF) - 128) / 128.0f)
            c += 1
          }
          mono(i) = sum / ch
          i += 1
        }
        Some(WavAudio(rate, ch, mono))
      case _ => None
    }
  }

  private def le16s(b: Array[Byte], off: Int): Short =
    ((b(off) & 0xFF) | (b(off + 1) << 8)).toShort

  /** Root-mean-square energy of the mono signal, in [0, 1]. */
  def rms(mono: Array[Float]): Double = {
    if (mono.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < mono.length) { s += mono(i).toDouble * mono(i); i += 1 }
    math.sqrt(s / mono.length)
  }

  /** Fraction of adjacent sample pairs whose signs differ — the classic
    * noisiness / voicing heuristic.
    */
  def zeroCrossRate(mono: Array[Float]): Double = {
    if (mono.length < 2) return 0.0
    var n = 0
    var i = 1
    while (i < mono.length) {
      if ((mono(i) >= 0) != (mono(i - 1) >= 0)) n += 1
      i += 1
    }
    n.toDouble / (mono.length - 1)
  }
}

/** Pure-JVM multi-frame GIF reader (javax.imageio's GIF service
  * provider reads sequences frame by frame) — the REAL frame-level
  * decode behind [[Multimodal.frameSampleGif]]. The canvas is the
  * logical screen from the stream metadata and each frame rectangle is
  * composited at its image-descriptor (left, top) offset over the
  * previous frame, so optimized GIFs storing partial-update
  * sub-rectangles land where the descriptor places them
  * (restore-to-previous disposal is treated as overwrite — fine for
  * the featurize path). None when the bytes are not a GIF.
  */
object GifFrames {
  import java.awt.image.BufferedImage
  import javax.imageio.ImageIO
  import javax.imageio.stream.MemoryCacheImageInputStream

  /** (left, top) offset of frame `i` from the GIF image descriptor —
    * optimized GIFs store partial-update sub-rectangles positioned on
    * the logical screen; compositing them at (0,0) would paint updates
    * in the wrong place. (0,0) when metadata is unreadable.
    */
  private def frameOffset(reader: javax.imageio.ImageReader,
      i: Int): (Int, Int) =
    try {
      val tree = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val descs = tree.getElementsByTagName("ImageDescriptor")
      if (descs.getLength == 0) (0, 0)
      else {
        val d = descs.item(0).asInstanceOf[org.w3c.dom.Element]
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Logical screen (w, h) from the GIF stream metadata — the canvas
    * every frame rectangle is positioned on. None when absent (then
    * frame 0's own size is the best available canvas).
    */
  private def logicalScreen(
      reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val tree = reader.getStreamMetadata()
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val descs = tree.getElementsByTagName("LogicalScreenDescriptor")
      if (descs.getLength == 0) None
      else {
        val d = descs.item(0).asInstanceOf[org.w3c.dom.Element]
        val w = d.getAttribute("logicalScreenWidth").toInt
        val h = d.getAttribute("logicalScreenHeight").toInt
        if (w > 0 && h > 0) Some((w, h)) else None
      }
    } catch { case _: Exception => None }

  def decode(payload: Array[Byte]): Option[Vector[BufferedImage]] = {
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    val stream = new MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(stream, false, false)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      var canvas: BufferedImage = null
      val out = Vector.newBuilder[BufferedImage]
      var i = 0
      while (i < n) {
        val frame = reader.read(i)
        val (left, top) = frameOffset(reader, i)
        if (canvas == null) {
          // canvas = the logical screen, so sub-rectangle frames at
          // nonzero offsets land where the descriptor places them (and
          // frames larger than frame 0 aren't cropped)
          val (cw, ch) = logicalScreen(reader).getOrElse(
            (frame.getWidth + left, frame.getHeight + top))
          canvas = new BufferedImage(
            math.max(cw, frame.getWidth + left),
            math.max(ch, frame.getHeight + top),
            BufferedImage.TYPE_INT_RGB)
        }
        val g = canvas.createGraphics()
        try g.drawImage(frame, left, top, null) finally g.dispose()
        val snap = new BufferedImage(canvas.getWidth, canvas.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g2 = snap.createGraphics()
        try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
        out += snap
        i += 1
      }
      Some(out.result())
    } catch {
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None
    } finally {
      reader.dispose()
      stream.close()
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

  // ImageIO defaults to DISK-backed image streams: every encode/decode
  // round-trips its bytes through a temp file. All payloads here are
  // in-memory byte arrays, so use memory-backed streams (bytes
  // produced are identical; this only removes temp-file I/O per call).
  ImageIO.setUseCache(false)

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
    // one bulk ARGB fetch (identical values to per-pixel getRGB, which
    // pays a color-model conversion call per pixel)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sum = 0.0
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      i += 1
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

  /** 64-bit average hash (aHash) — the classic perceptual image
    * fingerprint (bit i = "8×8-grid cell i is at least as bright as
    * the whole image"), the LAION-style image-dedup key. ALL-INTEGER
    * contract so an analytic oracle can predict it for generated
    * rasters: per-pixel luma is the exact integer `(r + g + b) / 3`
    * (truncating), grid cells are the floor-boundary partition
    * `cell = (y·8)/h · 8 + (x·8)/w`, and the brightness test is the
    * exact cross-multiplication `cellSum·totalPx ≥ totalSum·cellPx`
    * (no floating-point averages anywhere). Row-major bit order,
    * bit i = `1L << i`. Overflow headroom: the cross-product is
    * ≤ 255·px² — safe beyond 100-megapixel rasters.
    */
  def aHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    // one bulk ARGB fetch (identical values to per-pixel getRGB, which
    // pays a color-model conversion call per pixel)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      val rowOff = y * w
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val rgb = px(rowOff + x)
        val luma = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
          (rgb & 0xFF)) / 3
        val c = cy * 8 + cx
        cellSum(c) += luma
        cellPx(c) += 1L
        x += 1
      }
      y += 1
    }
    var totalSum = 0L
    var totalPx = 0L
    var i = 0
    while (i < 64) { totalSum += cellSum(i); totalPx += cellPx(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cellPx(i) > 0L && cellSum(i) * totalPx >= totalSum * cellPx(i))
        hash |= 1L << i
      i += 1
    }
    hash
  }
}
