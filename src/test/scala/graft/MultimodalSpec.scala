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

  /** 16-bit PCM mono/stereo WAV bytes with the exact RIFF layout the
    * codec must parse (44-byte canonical header).
    */
  private def wav16(rate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("real WAV codec: PCM parse, RMS, zero-cross rate, skip-not-throw") {
    import graft.ops.{Multimodal => M, WavCodec}
    // full-scale mono square wave at rate 8000: rms = 1, zcr = 1
    val square = Array.tabulate[Short](800)(i =>
      if (i % 2 == 0) 32767 else -32767)
    // constant positive half-scale: rms = 0.5-ish exact, zcr = 0
    val flat = Array.fill[Short](400)(16384)
    // stereo: L = +v, R = -v → mono mixdown ≈ 0 everywhere
    val stereo = Array.tabulate[Short](600)(i =>
      if (i % 2 == 0) 20000 else -20000)
    val media = Seq(
      M.MediaAsset(1L, "en", wav16(8000, 1, square)),
      M.MediaAsset(2L, "en", wav16(16000, 1, flat)),
      M.MediaAsset(3L, "en", wav16(8000, 2, stereo)),
      M.MediaAsset(4L, "en", "definitely not audio".getBytes("UTF-8")),
      M.MediaAsset(5L, "en", wav16(8000, 1, square).take(30))) // truncated
    val ds = spark.createDataset(media)(
      org.apache.spark.sql.Encoders.product[M.MediaAsset])
    val got = M.featurizeAudio(ds).collect().map(f => f.doc_id -> f).toMap
    val sq = got(1L)
    assert(sq.decoded && sq.sample_rate === 8000 && sq.channels === 1)
    assert(sq.n_samples === 800L && sq.duration_s === 0.1)
    assert(math.abs(sq.rms - 32767.0 / 32768.0) < 1e-9)
    assert(sq.zero_cross_rate === 1.0)
    val fl = got(2L)
    assert(fl.decoded && fl.rms === 16384.0 / 32768.0 &&
      fl.zero_cross_rate === 0.0)
    val st = got(3L)
    assert(st.decoded && st.channels === 2 && st.n_samples === 300L)
    assert(st.rms === 0.0, "opposite-phase stereo mixes to silence")
    assert(!got(4L).decoded && !got(5L).decoded,
      "non-audio and truncated payloads skip, not throw")
    // direct kernel edge: empty signal
    assert(WavCodec.rms(Array.empty[Float]) === 0.0)
    assert(WavCodec.zeroCrossRate(Array(0.5f)) === 0.0)
  }

  /** Animated GIF via javax.imageio's sequence writer: `lumas` solid
    * gray frames in order.
    */
  private def animatedGif(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    import javax.imageio.ImageIO
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      lumas.foreach { l =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(new java.awt.Color(l, l, l))
          g.fillRect(0, 0, w, h)
        } finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  test("real GIF frame sampling: decode, even spacing, per-frame luma") {
    import graft.ops.{Multimodal => M, GifFrames}
    val lumas = Seq(0, 50, 100, 150, 200, 250, 30, 80, 130, 180)
    val gif = animatedGif(20, 10, lumas)
    assert(GifFrames.decode(gif).get.length === 10)
    val media = Seq(
      M.MediaAsset(1L, "en", gif),
      M.MediaAsset(2L, "en", animatedGif(8, 8, Seq(60, 180))),
      M.MediaAsset(3L, "en", "not a gif".getBytes("UTF-8")))
    val ds = spark.createDataset(media)(
      org.apache.spark.sql.Encoders.product[M.MediaAsset])
    val got = M.frameSampleGif(ds, 4).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    // 10 frames sampled at 4: src indices round(i*9/3) = 0, 3, 6, 9
    assert(got(1L).map(_.src_frame).toSeq === Seq(0, 3, 6, 9))
    assert(got(1L).forall(f => f.width === 20 && f.height === 10))
    val expectedLumas = Seq(0, 150, 30, 180)
    got(1L).zip(expectedLumas).foreach { case (f, l) =>
      assert(math.abs(f.mean_luma - l) <= 3.0,
        s"frame ${f.frame_idx}: GIF-palette-quantized luma near $l") }
    // fewer frames than requested: every frame once
    assert(got(2L).map(_.src_frame).toSeq === Seq(0, 1))
    assert(!got.contains(3L), "non-GIF payloads yield no rows")
  }

  test("GIF partial-update frames composite at their descriptor offset") {
    import graft.ops.GifFrames
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage
    // frame 0: full 20x20 dark canvas; frame 1: a 10x10 bright
    // sub-rectangle whose image descriptor places it at (10, 10) — an
    // optimized partial update. Composited at (0, 0) (the pre-fix bug)
    // the bright patch lands top-LEFT; at the descriptor offset it
    // lands bottom-RIGHT.
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      def gray(w: Int, h: Int, l: Int): BufferedImage = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(l, l, l)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        img
      }
      writer.writeToSequence(
        new IIOImage(gray(20, 20, 10), null, null),
        writer.getDefaultWriteParam)
      val patch = gray(10, 10, 200)
      val md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(patch),
        writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", "10")
      desc.setAttribute("imageTopPosition", "10")
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new IIOImage(patch, null, md),
        writer.getDefaultWriteParam)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val frames = GifFrames.decode(bos.toByteArray).get
    assert(frames.length === 2)
    assert(frames.forall(f => f.getWidth === 20 && f.getHeight === 20),
      "canvas is the logical screen, not the sub-rectangle")
    // palette quantization keeps solid grays near-exact; compare coarsely
    def luma(img: BufferedImage, x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
    }
    val f1 = frames(1)
    assert(luma(f1, 15, 15) > 100, "patch composited at its (10,10) offset")
    assert(luma(f1, 2, 2) < 60, "top-left keeps the dark base frame")
    assert(luma(f1, 15, 2) < 60 && luma(f1, 2, 15) < 60,
      "patch covers ONLY its sub-rectangle")
  }

  test("aHash64: absolute pins, encode/decode round trip, skip-not-throw") {
    import java.awt.image.BufferedImage
    import graft.ops.{ImageIoCodec, Multimodal}
    def fill(img: BufferedImage, x0: Int, y0: Int, w: Int, h: Int,
        g: Int): Unit = {
      val gfx = img.createGraphics()
      try {
        gfx.setColor(new java.awt.Color(g, g, g))
        gfx.fillRect(x0, y0, w, h)
      } finally gfx.dispose()
    }
    // solid image: every cell equals the mean -> all 64 bits set
    val solid = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    fill(solid, 0, 0, 64, 64, 128)
    assert(ImageIoCodec.aHash64(solid) === -1L)
    // left half bright, right half dark: cells cx 0..3 set per row
    // -> low nibble of every byte = 0x0F pattern
    val half = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    fill(half, 0, 0, 32, 64, 200)
    fill(half, 32, 0, 32, 64, 20)
    assert(ImageIoCodec.aHash64(half) === 0x0F0F0F0F0F0F0F0FL)
    // non-multiple-of-8 dims: floor-boundary cells, still total order
    val odd = new BufferedImage(50, 30, BufferedImage.TYPE_INT_RGB)
    fill(odd, 0, 0, 50, 30, 77)
    assert(ImageIoCodec.aHash64(odd) === -1L) // solid -> all bits again
    // PNG round trip preserves the hash exactly (lossless)
    val rt = ImageIoCodec.decode(ImageIoCodec.encodePng(half)).get
    assert(ImageIoCodec.aHash64(rt) === 0x0F0F0F0F0F0F0F0FL)
    // undecodable payload -> decoded=false, not a thrown task
    import s.implicits._
    val junk = Seq(graft.ops.Multimodal.MediaAsset(9L, "en",
      Array[Byte](1, 2, 3))).toDS()
    val row = Multimodal.imageAHashes(junk).collect().head
    assert(!row.decoded && row.ahash === 0L)
    // the generated quad fixture matches the analytic hash
    val docs = Seq((7L, "en", "t")).toDF("doc_id", "lang", "text")
    val gen = Multimodal.imageAHashes(
      Multimodal.syntheticQuadImages(docs)).collect().head
    val pid = 7; val gs = (0 until 4).map(q => (pid * 53 + q * 17) % 256)
    val expected = Seq(0x0F0F0F0FL, 0xF0F0F0F0L,
      0x0F0F0F0F00000000L, 0xF0F0F0F000000000L)
      .zipWithIndex.map { case (m, q) =>
        if (4 * gs(q) >= gs.sum) m else 0L }.sum
    assert(gen.decoded && gen.ahash === expected)
  }

  test("audioEnergyHash64: absolute pins, round trip, short clips, junk") {
    import graft.ops.{Multimodal, WavCodec}
    import s.implicits._
    // the generated fixture matches the analytic hash for one doc
    val docs = Seq((11L, "en", "t")).toDF("doc_id", "lang", "text")
    val gen = Multimodal.audioEnergyHashes(
      Multimodal.syntheticSquareWavs(docs)).collect().head
    val pid = 11; val as = (0 until 4).map(q => (pid * 31 + q * 7) % 100)
    val expected = Seq(0xFFFFL, 0xFFFF0000L, 0xFFFF00000000L,
      0xFFFF000000000000L).zipWithIndex.map { case (m, q) =>
        if (4 * as(q) >= as.sum) m else 0L }.sum
    assert(gen.decoded && gen.ahash === expected)
    // silence: every segment ties the global mean -> all 64 bits
    val silent = WavCodec.WavAudio(16000, 1, new Array[Float](2048))
    assert(Multimodal.audioEnergyHash64(silent) === -1L)
    // clip shorter than 64 samples: only present segments hash
    val tiny = WavCodec.WavAudio(16000, 1, Array.fill(4)(0.5f))
    val h = Multimodal.audioEnergyHash64(tiny)
    assert(java.lang.Long.bitCount(h) === 4) // 4 samples -> 4 segments
    // junk payload: decoded=false, not a thrown task
    val junk = Seq(Multimodal.MediaAsset(9L, "en",
      Array[Byte](82, 73, 70, 70))).toDS()
    val row = Multimodal.audioEnergyHashes(junk).collect().head
    assert(!row.decoded && row.ahash === 0L)
  }
}
