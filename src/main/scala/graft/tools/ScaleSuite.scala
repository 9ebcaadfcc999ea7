package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Shared-vocabulary scale-fixture builder (the BENCH_LOCAL "sf1-shared"
  * check, round-8 VERDICT item 5).
  *
  * Round 7's 10× fixture suffixed every token `_<copy>`, making per-copy
  * vocabularies DISJOINT: cross-copy LSH buckets were collision-free by
  * construction, so the measured linear growth never exercised hot
  * buckets. This builder replicates `documents` `copies`× with the FULL
  * vocabulary shared:
  *
  *  - a 4% "hot" slice (`xxhash64(doc_id) % 25 == 0`) is copied
  *    verbatim — cross-copy exact duplicates, the boilerplate/template
  *    pages of a real crawl; these collide in EVERY band and form
  *    genuinely hot buckets;
  *  - every other document gets a per-copy token-MEMBERSHIP toggle: the
  *    occurrences of 5 hash-picked vocabulary types are dropped and 4
  *    other types appended, so copy-variants of a document share the
  *    vocabulary (and most of their tokens) but sit below the 0.9
  *    near-dup threshold, while two documents near-duplicate WITHIN a
  *    copy stay near-duplicate (the toggle is a per-copy constant, not
  *    per-document noise).
  *
  * The corpus's synthetic vocabulary is ~31 types with ~23 present per
  * document, so any two documents have unigram-set Jaccard ≥ (2·23−31)/31
  * ≈ 0.48 — at 96×24 banding that means nearly every intra-block pair is
  * an LSH candidate no matter how the fixture is built. The unigram
  * pipelines (x12/x33/x48) therefore measure the WORST-CASE candidate-
  * dense regime here; [[ScaleCheck]] also reports the 5-shingle regime,
  * where the shared-vocabulary shingle space is large and growth stays
  * linear — the production-realistic configuration.
  *
  * Deterministic (hash-driven, no RNG); driver state is the collected
  * vocabulary, guarded to ≤100k types — this is a fixture BUILDER run at
  * bench scale, not a production operator.
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1shared")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-scale-fixture")

    val base = spark.read.parquet(s"$src/documents.parquet")
    val vocab = base
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .filter(col("t") =!= "").distinct()
      .orderBy("t").collect().map(_.getString(0))
    require(vocab.length <= 100000,
      s"vocabulary ${vocab.length} exceeds the fixture-builder bound")
    val n = vocab.length

    // deterministic ring walk over the sorted vocabulary; stride 7 is
    // coprime with any realistic vocab size remainder classes we care
    // about (and collisions are filtered anyway)
    def pick(seed: Int, count: Int, excl: Set[String]): Seq[String] =
      Iterator.from(0).map(i => vocab(((seed + i * 7) % n + n) % n))
        .filterNot(excl).distinct.take(count).toSeq

    val hot = pmod(xxhash64(col("doc_id")), lit(25)) === 0
    val copyDfs = (0 until copies).map { c =>
      if (c == 0) base
      else {
        val dropC = pick(c * 13 + 5, 5, Set.empty).toSet
        val addC = pick(c * 29 + 11, 4, dropC)
        val toks = split(col("text"), " ", -1)
        val mutated = concat_ws(" ",
          concat(filter(toks, t => !t.isInCollection(dropC)),
            array(addC.map(lit): _*)))
        base.select(
          (col("doc_id") + c * 10000000L).as("doc_id"),
          when(hot, col("text")).otherwise(mutated).as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }
    val all = copyDfs.reduce(_ unionByName _)
    all.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    // the flagship pipelines read only `documents`; the remaining tables
    // are copied byte-for-byte so the dir is a complete fixture
    val srcDir = Paths.get(src)
    Files.list(srcDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        p.getFileName.toString != "documents.parquet" && Files.isRegularFile(p))
      .foreach { p =>
        val dst = Paths.get(out, p.getFileName.toString)
        Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"""{"fixture":"$out","copies":$copies,"vocab":$n,"docs":${all.count()}}""")
    spark.stop()
  }
}

/** Diagnostics for the shared-vocab scale check: per-dir LSH bucket
  * histogram, candidate/verified pair counts for the unigram AND
  * 5-shingle regimes, and (on request) an AQE skew-split demonstration
  * on the real fixture's hottest bucket join. Prints one JSON line per
  * dir — captured into BENCH_LOCAL.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1shared")
    val spark = Sessions.local("graft-scale-check")

    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val uni = docs.select(col("doc_id"), col("source"),
        Dedup.tokenSet(col("text")).as("tok"))
      val sh = docs.select(col("doc_id"), col("source"),
        Dedup.shingles(col("text"), 5).as("tok"))

      def stats(d: DataFrame): (Long, Seq[Long], Long, Long, Long) = {
        val banded = Dedup.bandedSignatures(d, "doc_id", "tok",
          numHashes = 96, bands = 24, blockCol = col("source"))
        val sizes = banded.groupBy("block", "band_id", "band_hash").count()
        val top = sizes.orderBy(col("count").desc).limit(10)
          .collect().map(_.getLong(3)).toSeq
        val volume = sizes
          .select(sum(col("count") * (col("count") - 1) / 2).cast("long"))
          .collect().head.getLong(0)
        val nBuckets = sizes.count()
        val cands = Dedup.lshCandidatePairs(d, "doc_id", "tok",
          numHashes = 96, bands = 24, blockCol = col("source")).count()
        val verified = Dedup.nearDupPairs(d, "doc_id", "tok", 0.9,
          numHashes = 96, bands = 24, blockCol = col("source")).count()
        (nBuckets, top, volume, cands, verified)
      }

      val nDocs = docs.count()
      val (ub, utop, uvol, ucand, uver) = stats(uni)
      val (sb, stop, svol, scand, sver) = stats(sh)
      println(s"""{"dir":"$dir","docs":$nDocs,""" +
        s""""unigram":{"buckets":$ub,"top_buckets":[${utop.mkString(",")}],""" +
        s""""pair_volume":$uvol,"candidates":$ucand,"verified":$uver},""" +
        s""""shingle5":{"buckets":$sb,"top_buckets":[${stop.mkString(",")}],""" +
        s""""pair_volume":$svol,"candidates":$scand,"verified":$sver}}""")
    }
    spark.stop()
  }
}

/** Forces AQE's skew-join thresholds down to fixture scale and runs the
  * REAL unigram LSH bucket join on the given dir, asserting the final
  * adaptive plan split the hot bucket partition (`skew=true`). The same
  * mechanism SkewEvidenceSpec pins on a synthetic hot bucket, here
  * demonstrated on the shared-vocab fixture's organically hot buckets.
  */
object SkewCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1shared")
    val spark = Sessions.local("graft-skew-check")
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    conf.set("spark.sql.shuffle.partitions", "64")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        Dedup.tokenSet(col("text")).as("tok"))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "tok",
      minEstSim = 0.9, numHashes = 96, bands = 24,
      blockCol = col("source"))
    val cnt = pairs.groupBy().count()
    val n = cnt.collect().head.getLong(0)
    val plan = cnt.queryExecution.executedPlan.toString
    val split = plan.contains("skew=true")
    // partition-level balance of the bucket join's shuffle key: rows per
    // hash partition of the banded-signature table — if max/median ~ 1,
    // organic hot buckets never form a skewed partition and AQE has
    // nothing to split (the adversarial case is pinned in
    // SkewEvidenceSpec); if it were >> 1, `skew_split` above must be true
    val perPart = Dedup.bandedSignatures(docs, "doc_id", "tok",
        numHashes = 96, bands = 24, blockCol = col("source"))
      .repartition(64, col("block"), col("band_id"), col("band_hash"))
      .select(spark_partition_id().as("p"))
      .groupBy("p").count()
      .select(col("count")).collect().map(_.getLong(0)).sorted
    val med = perPart(perPart.length / 2)
    val mx = perPart.last
    println(s"""{"dir":"$dir","est_pairs":$n,"skew_split":$split,""" +
      s""""partition_rows_median":$med,"partition_rows_max":$mx}""")
    spark.stop()
  }
}

/** Shared local-session builder for the scale tools (Bench's config). */
/** 10×-growth check for the round-9 ops: times [[graft.ops.Sampling
  * .dsirWeights]] and [[graft.ops.TextAnalysis.datasetCard]] on sf0.1 vs
  * the shared-vocabulary 10× fixture (building `/tmp/sf1shared` via
  * [[ScaleFixture]] if absent) and prints one JSON line with medians and
  * the growth factors. Linear-ish growth (≈10× work on 32 threads ⇒
  * well under 10× wall) is the pass signal; the DSIR ratio table stays
  * dim rows at ANY corpus size, the card's exchanges stay
  * aggregate-sized.
  */
object NewOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-newop-scale")

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def times(dir: String): (Double, Double, Double, Double, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val dsir = median3(() => graft.ops.Sampling.dsirWeights(
        docs, "doc_id", "text", col("source") === "src0", dim = 16))
      val card = median3(() => graft.ops.TextAnalysis.datasetCard(
        docs, "source", "text", "n_chars"))
      val score = median3(() => graft.ops.Sampling.dsirScore(
        docs, "doc_id", "text", graft.ops.Sampling.dsirModel(
          docs, "doc_id", "text", col("source") === "src0", 16)))
      val train = median3(() => graft.ops.TextAnalysis.perceptronTrain(
        docs, "doc_id", "text", col("source") === "src0",
        dim = 16, epochs = 3))
      (dsir, card, score, train, n)
    }
    val (d1, c1, s1, t1, n1) = times(small)
    val (d10, c10, s10, t10, n10) = times(big)
    println(f"""{"docs":[$n1,$n10],""" +
      f""""dsir_sec":[$d1%.2f,$d10%.2f],"dsir_growth":${d10 / d1}%.2f,""" +
      f""""card_sec":[$c1%.2f,$c10%.2f],"card_growth":${c10 / c1}%.2f,""" +
      f""""score_sec":[$s1%.2f,$s10%.2f],"score_growth":${s10 / s1}%.2f,""" +
      f""""train_sec":[$t1%.2f,$t10%.2f],"train_growth":${t10 / t1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the heavy LSH tail (x74 per-doc top-k
  * near-dups, x64 cross-source overlap matrix — the two most expensive
  * suite rows, previously absent from any growth suite) and the
  * round-10 ops (x86 BPE induction, x87 trained lang-ID), on sf0.1 vs
  * the shared-vocabulary 10× fixture. NOTE the unigram regime is the
  * DECLARED candidate-dense worst case (ScaleCheck r8: pair volume
  * grows 47× at 10× docs because the ~31-type vocabulary makes nearly
  * every intra-block pair a candidate) — super-linear wall growth HERE
  * measures that saturation, not a bucket-skew failure; the 5-shingle
  * production regime's volume stays candidate-sparse (247k pairs at
  * 50k docs). Big-dir reps default to 1 (these are minute-scale rows;
  * the cold run is still discarded).
  */
object HeavyOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    val bigReps = args.lift(2).map(_.toInt).getOrElse(1)
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-heavyop-scale")

    def medianN(reps: Int)(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(reps)(run()).sorted.apply(reps / 2)
    }
    def times(dir: String, reps: Int)
        : (Double, Double, Double, Double, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val uni = docs.select(col("doc_id"), col("source"),
        Dedup.tokenSet(col("text")).as("tok"))
      val knn = medianN(reps)(() => Dedup.knnNearDups(
        uni, "doc_id", "tok", 0.9, k = 5,
        numHashes = 96, bands = 24, blockCol = col("source")))
      // the x64 shape: deterministic half-sample, UNBLOCKED near-dup
      // matrix, per-source-pair rollup
      val overlap = medianN(reps)(() => {
        val half = docs
          .filter(graft.ops.Sampling.keepPredicate(col("doc_id"), 0.5))
          .select(col("doc_id"), col("source"),
            Dedup.tokenSet(col("text")).as("tok"))
        val src = half.select(col("doc_id"), col("source"))
        Dedup.nearDupPairs(half, "doc_id", "tok", 0.9,
            numHashes = 96, bands = 24)
          .join(src.select(col("doc_id").as("a_id"),
            col("source").as("_sa")), "a_id")
          .join(src.select(col("doc_id").as("b_id"),
            col("source").as("_sb")), "b_id")
          .select(least(col("_sa"), col("_sb")).as("source_a"),
            greatest(col("_sa"), col("_sb")).as("source_b"),
            col("jaccard"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
      })
      val bpe = medianN(reps)(() =>
        graft.ops.TextAnalysis.bpeLearnMerges(docs, "text", k = 10))
      val lang = medianN(reps)(() => {
        val m = graft.ops.TextAnalysis.langTrigramModel(
          docs, "lang", "text", 64)
        graft.ops.TextAnalysis.langIdScore(docs, "doc_id", "text", m)
      })
      (knn, overlap, bpe, lang, n)
    }
    val (k1, o1, b1, l1, n1) = times(small, 3)
    val (k10, o10, b10, l10, n10) = times(big, bigReps)
    println(f"""{"docs":[$n1,$n10],""" +
      f""""knn_sec":[$k1%.2f,$k10%.2f],"knn_growth":${k10 / k1}%.2f,""" +
      f""""overlap_sec":[$o1%.2f,$o10%.2f],"overlap_growth":${o10 / o1}%.2f,""" +
      f""""bpe_sec":[$b1%.2f,$b10%.2f],"bpe_growth":${b10 / b1}%.2f,""" +
      f""""lang_sec":[$l1%.2f,$l10%.2f],"lang_growth":${l10 / l1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-11 ops (x89 HTML main-content
  * extraction, x90 URL canonicalization + per-domain cap) on sf0.1 vs
  * the shared-vocabulary 10× fixture. Both are expected stage-floor
  * flat-to-linear: x89 is a pure per-row kernel projection
  * (embarrassingly parallel, zero shuffle), x90 is projections + one
  * keyed aggregate + one partitioned rank window whose exchanges carry
  * only (url, id) pairs.
  */
object R11OpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r11op-scale")

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def times(dir: String): (Double, Double, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
      val n = docs.count()
      // the x89 shape: fixture page wrap + the one-pass kernel
      val html = median3(() => {
        val page = concat(lit("<html><head><title>t</title>"),
          lit("<style>b{c:0}</style><script>var q=1;</script></head>"),
          lit("<body><div>nav | "), col("source"), lit("</div><p>"),
          col("text"), lit(" &amp; tail</p><!-- c --><p>"),
          substring(col("text"), 41, 100), lit("</p></body></html>"))
        val ex = graft.ops.TextAnalysis.htmlMainContent(page)
        docs.select(col("doc_id"),
          ex.getField("n_blocks").as("n_blocks"),
          ex.getField("n_kept").as("n_kept"),
          ex.getField("main_text").as("main_text"))
      })
      // the x90 shape: messy URL synth + canonicalize + dedup/cap
      val url = median3(() => {
        val raw = concat(
          when(col("doc_id") % 3 === 0, lit("HTTPS://WWW."))
            .otherwise(lit("http://")),
          upper(col("source")), lit(".Example.COM/d/"),
          (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 4 === 0,
            concat(lit("?utm_source=feed&id="),
              (col("doc_id") % 5).cast("string"))).otherwise(lit("")))
        graft.ops.UrlCanon.dedupWithDomainCap(
          docs.select(col("doc_id"), raw.as("url")),
          "doc_id", "url", cap = 3)
      })
      (html, url, n)
    }
    val (h1, u1, n1) = times(small)
    val (h10, u10, n10) = times(big)
    println(f"""{"docs":[$n1,$n10],""" +
      f""""html_sec":[$h1%.2f,$h10%.2f],"html_growth":${h10 / h1}%.2f,""" +
      f""""url_sec":[$u1%.2f,$u10%.2f],"url_growth":${u10 / u1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-11 batch-2 ops: x91 Gopher rules
  * (per-row kernel), x92 CCNet buckets (LM build + per-lang window),
  * x93 PQ (train + encode + ADC). Documents ops use the shared-vocab
  * sf1shared fixture; PQ uses a synthesized 10× embedding fixture
  * (id-shifted copies with a small deterministic per-copy perturbation
  * so codebooks actually move). One JSON line.
  */
object R11bOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r11b-scale")

    val pq10 = "/tmp/pq10"
    if (!Files.exists(Paths.get(s"$pq10/embeddings.parquet"))) {
      val e = spark.read.parquet(s"$small/embeddings.parquet")
      (0 until 10).map { c =>
        e.select((col("vec_id") + c * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.003f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$pq10/embeddings.parquet")
    }

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }

    def docTimes(dir: String): (Double, Double, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
      val n = docs.count()
      // the x91 shape: decoration + the one-pass kernel + thresholds
      val gopher = median3(() => {
        val deco = when(col("doc_id") % 5 === 0,
            concat(lit("# "), col("text"), lit(" ...")))
          .when(col("doc_id") % 5 === 1, concat(lit("- "), col("text")))
          .otherwise(col("text"))
        graft.ops.TextAnalysis.gopherRules(
          docs.select(col("doc_id"), deco.as("text")), "doc_id", "text")
      })
      // the x92 shape: corpus LM + per-lang tercile window
      val ccnet = median3(() =>
        graft.ops.TextAnalysis.ccnetBuckets(
          docs.select(col("doc_id"), col("text"), col("lang")),
          "doc_id", "text", "lang"))
      (gopher, ccnet, n)
    }
    // stride scales with the data so the CODEBOOK stays fixed (40
    // cells) — the realistic PQ regime: k constant, corpus grows, so
    // train/encode work should grow linearly with rows only
    def pqTime(dir: String, stride: Int): (Double, Long) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val sec = median3(() => {
        val model = graft.ops.Similarity.pqTrain(
          emb, "vec_id", "embedding",
          numSub = 4, subDim = 16, seedStride = stride, iters = 2)
        graft.ops.Similarity.pqTopK(
          emb, "vec_id", "embedding", model, 0L, 10)
      })
      (sec, n)
    }

    // same fixed-codebook regime for IVF-PQ: coarse cells and PQ
    // codebooks constant, corpus grows 10×
    def ivfPqTime(dir: String, cStride: Int, pStride: Int)
        : Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      median3(() => {
        val model = graft.ops.Similarity.ivfPqTrain(
          emb, "vec_id", "embedding", coarseStride = cStride,
          coarseIters = 1, numSub = 4, subDim = 16,
          pqStride = pStride, pqIters = 1)
        graft.ops.Similarity.ivfPqTopK(
          emb, "vec_id", "embedding", model, 0L, 10, nProbe = 2)
      })
    }

    val (g1, c1, n1) = docTimes(small)
    val (g10, c10, n10) = docTimes(big)
    val (p1, e1) = pqTime(small, 50)
    val (p10, e10) = pqTime(pq10, 500)
    val iv1 = ivfPqTime(small, 100, 50)
    val iv10 = ivfPqTime(pq10, 1000, 500)
    println(f"""{"docs":[$n1,$n10],"vecs":[$e1,$e10],""" +
      f""""gopher_sec":[$g1%.2f,$g10%.2f],"gopher_growth":${g10 / g1}%.2f,""" +
      f""""ccnet_sec":[$c1%.2f,$c10%.2f],"ccnet_growth":${c10 / c1}%.2f,""" +
      f""""pq_sec":[$p1%.2f,$p10%.2f],"pq_growth":${p10 / p1}%.2f,""" +
      f""""ivfpq_sec":[$iv1%.2f,$iv10%.2f],"ivfpq_growth":${iv10 / iv1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-11 batch-4 funnel pair: x96 (HTML
  * extract → Gopher gate → CCNet keep, audited per stage) and x97 (the
  * funnel survivors packed into 2048-token training sequences). Times
  * the DECLARED catalog queries verbatim — the measured shape IS the
  * shipped query, funnel builder included — on sf0.1 vs the shared-
  * vocab 10× fixture. One JSON line.
  */
object R11dOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r11d-scale")

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def times(dir: String): (Double, Double, Long) = {
      val n = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull).count()
      val funnel = median3(() =>
        graft.queries.ExtensionCatalog
          .queries("x96_curation_funnel")(spark, dir))
      val pack = median3(() =>
        graft.queries.ExtensionCatalog
          .queries("x97_funnel_pack")(spark, dir))
      (funnel, pack, n)
    }
    val (f1, p1, n1) = times(small)
    val (f10, p10, n10) = times(big)
    println(f"""{"docs":[$n1,$n10],""" +
      f""""funnel_sec":[$f1%.2f,$f10%.2f],"funnel_growth":${f10 / f1}%.2f,""" +
      f""""pack_sec":[$p1%.2f,$p10%.2f],"pack_growth":${p10 / p1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-11 batch-7 ops: x101 KN LM quality
  * (docs, sf1shared fixture) and x102 power-iteration top PC
  * (embeddings, the R11bOpScale pq10 fixture). Times the declared
  * query shapes verbatim. One JSON line.
  */
object R11eOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r11e-scale")
    val pq10 = "/tmp/pq10"
    if (!Files.exists(Paths.get(s"$pq10/embeddings.parquet"))) {
      val e = spark.read.parquet(s"$small/embeddings.parquet")
      (0 until 10).map { c =>
        e.select((col("vec_id") + c * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.003f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$pq10/embeddings.parquet")
    }

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def kn(dir: String): Double = median3(() =>
      graft.ops.TextAnalysis.knLmQuality(
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("text").isNotNull), "doc_id", "text"))
    def pc(dir: String): Double = median3(() =>
      graft.ops.Similarity.topPrincipalComponent(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding"))
    val (k1, k10) = (kn(small), kn(big))
    val (p1, p10) = (pc(small), pc(pq10))
    println(f"""{"kn_sec":[$k1%.2f,$k10%.2f],"kn_growth":${k10 / k1}%.2f,""" +
      f""""pc_sec":[$p1%.2f,$p10%.2f],"pc_growth":${p10 / p1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-12 ops: x111 trigram KN quality and
  * x112 sampled dedup-recall (documents, sf1shared), x113 capped
  * containment (cap scaled with block size so the keep-fraction regime
  * matches — cap 20 at 25-doc blocks ⇒ cap 200 at 250-doc blocks;
  * the verbatim cap would drop everything at 10× and time nothing),
  * and x114 portable KMV distinct (events, a 10× synthesized union
  * with disjoint user_id ranges). Times the declared query shapes;
  * one JSON line.
  */
object R12OpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r12-scale")
    val ev10 = "/tmp/ev10"
    if (!Files.exists(Paths.get(s"$ev10/events.parquet"))) {
      val e = spark.read.parquet(s"$small/events.parquet")
      (0 until 10).map { c =>
        e.select((col("event_id") + c * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + c * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$ev10/events.parquet")
    }

    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def docs(dir: String) =
      spark.read.parquet(s"$dir/documents.parquet")
    def tri(dir: String): Double = median3(() =>
      graft.ops.TextAnalysis.knTrigramQuality(
        docs(dir).filter(col("text").isNotNull), "doc_id", "text"))
    def recall(dir: String): Double = median3 { () =>
      val d = graft.ops.Sampling.hashSample(docs(dir), "doc_id", 0.5)
      val withSets = d.select(col("doc_id"), col("source"),
        graft.ops.Dedup.tokenSet(col("text")).as("tok"))
      val exact = graft.ops.Dedup.jaccardPairs(withSets, "doc_id",
          "tok", "source", 0.9)
        .select(col("a_id"), col("b_id"))
      val cand = graft.ops.Dedup.portableLshPairs(d, "doc_id", "text",
          minEst = 0.0, k = 8, bands = 4, blockCol = col("source"))
        .select(col("a_id"), col("b_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
        .crossJoin(broadcast(exact.join(cand, Seq("a_id", "b_id"))
          .agg(count(lit(1)).as("n_hit"))))
    }
    def capped(dir: String, cap: Long): Double = median3(() =>
      graft.ops.Dedup.containmentTopHost(docs(dir), "doc_id", "text",
        "source", minContainment = 0.5, dfCap = Some(cap)))
    def kmv(dir: String): Double = median3(() =>
      graft.ops.Cardinality.portableKmvDistinct(
        spark.read.parquet(s"$dir/events.parquet"),
        "event_type", "user_id", k = 64))
    val (t1, t10) = (tri(small), tri(big))
    val (r1, r10) = (recall(small), recall(big))
    val (c1, c10) = (capped(small, 20L), capped(big, 200L))
    val (k1, k10) = (kmv(small), kmv(ev10))
    println(f"""{"tri_sec":[$t1%.2f,$t10%.2f],"tri_growth":${t10 / t1}%.2f,""" +
      f""""recall_sec":[$r1%.2f,$r10%.2f],"recall_growth":${r10 / r1}%.2f,""" +
      f""""capped_sec":[$c1%.2f,$c10%.2f],"capped_growth":${c10 / c1}%.2f,""" +
      f""""kmv_sec":[$k1%.2f,$k10%.2f],"kmv_growth":${k10 / k1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-12 batch-2 ops: x115 KN terciles,
  * x116 S-curve calibration, x117 folded pad-pack, x118 Zipf audit
  * (documents, sf1shared), x119 embedding drift (the R11b pq10 10×
  * embedding fixture). Declared shapes, 3-warm medians, one JSON line.
  */
object R12bOpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1shared")
    if (!Files.exists(Paths.get(big)))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r12b-scale")
    val pq10 = "/tmp/pq10"
    if (!Files.exists(Paths.get(s"$pq10/embeddings.parquet"))) {
      val e = spark.read.parquet(s"$small/embeddings.parquet")
      (0 until 10).map { c =>
        e.select((col("vec_id") + c * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.003f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$pq10/embeddings.parquet")
    }
    def median3(mk: () => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      Seq.fill(3)(run()).sorted.apply(1)
    }
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def kn3b(dir: String): Double = median3(() =>
      graft.ops.TextAnalysis.ccnetBucketsKn3(docs(dir), "doc_id",
        "text", "lang"))
    def scurve(dir: String): Double = median3 { () =>
      val d = graft.ops.Sampling.hashSample(docs(dir), "doc_id", 0.5)
      val withSets = d.select(col("doc_id"), col("source"),
        graft.ops.Dedup.tokenSet(col("text")).as("tok"))
      val pairs = graft.ops.Dedup.jaccardPairs(withSets, "doc_id",
        "tok", "source", 0.0)
      val cand = graft.ops.Dedup.portableLshPairs(d, "doc_id", "text",
          minEst = 0.0, k = 8, bands = 4, blockCol = col("source"))
        .select(col("a_id"), col("b_id"), lit(1L).as("hit"))
      pairs.join(cand, Seq("a_id", "b_id"), "left")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("hit"), lit(0L))).as("h"))
    }
    def pack(dir: String): Double = median3(() =>
      graft.ops.TextAnalysis.foldPackReport(docs(dir), "doc_id",
        "text", "source", seqLen = 96))
    def zipf(dir: String): Double = median3(() =>
      graft.ops.TextAnalysis.zipfAudit(docs(dir), "doc_id", "text",
        "source"))
    def drift(dir: String): Double = median3(() =>
      graft.ops.Similarity.embeddingDriftReport(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", rate = 0.5))
    val (b1, b10) = (kn3b(small), kn3b(big))
    val (s1, s10) = (scurve(small), scurve(big))
    val (p1, p10) = (pack(small), pack(big))
    val (z1, z10) = (zipf(small), zipf(big))
    val (d1, d10) = (drift(small), drift(pq10))
    println(f"""{"kn3b_sec":[$b1%.2f,$b10%.2f],"kn3b_growth":${b10 / b1}%.2f,""" +
      f""""scurve_sec":[$s1%.2f,$s10%.2f],"scurve_growth":${s10 / s1}%.2f,""" +
      f""""pack_sec":[$p1%.2f,$p10%.2f],"pack_growth":${p10 / p1}%.2f,""" +
      f""""zipf_sec":[$z1%.2f,$z10%.2f],"zipf_growth":${z10 / z1}%.2f,""" +
      f""""drift_sec":[$d1%.2f,$d10%.2f],"drift_growth":${d10 / d1}%.2f}""")
    spark.stop()
  }
}

/** 10×-growth check for the round-14 wave (x133–x151, the r14
  * verdict's item 8): one combined 10× fixture dir (shared-vocab
  * documents from [[ScaleFixture]], id-offset events ×10, id-offset
  * embeddings ×10), then each declared query AS SHIPPED
  * (`SparkEntry.queries`, presentation sort included) timed 3-warm
  * median at sf0.1 and at the 10× dir. One JSON line of
  * per-op [small, big, growth] triples — captured into BENCH_LOCAL.
  */
object R14OpScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf10r14")
    // build the docs fixture BEFORE opening this run's session:
    // ScaleFixture stops its (shared-JVM) SparkContext on exit
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, "10"))
    val spark = Sessions.local("graft-r14-scale")
    // swap a freshly-written replicated table over the prefill copy.
    // deleteQuietly, not forceDelete: the target is ABSENT when a prior
    // run crashed between delete and move (or the prefill never copied
    // the table), and forceDelete's FileNotFoundException would wedge
    // the prefill permanently behind the never-created marker file.
    def swapIn(tmp: String, tgt: String): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(
        Paths.get(tgt).toFile)
      Files.move(Paths.get(tmp), Paths.get(tgt))
    }
    if (!Files.exists(Paths.get(s"$big/_events10"))) {
      val e = graft.Tables.load(spark, small, "events")
      (0 until 10).map { c =>
        e.select((col("event_id") + c * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + c * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/events.parquet")
      Files.createFile(Paths.get(s"$big/_events10"))
    }
    if (!Files.exists(Paths.get(s"$big/_orders10"))) {
      val o = spark.read.parquet(s"$small/orders.parquet")
      (0 until 10).map { c =>
        o.select((col("o_orderkey") + c * 100000000L).as("o_orderkey"),
          (col("o_custkey") + c * 10000000L).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/orders10.parquet")
      // swap in AFTER the write: the ScaleFixture prefill copied the
      // small orders verbatim; the x196/x197 growth rows need the
      // replicated one
      swapIn(s"$big/orders10.parquet", s"$big/orders.parquet")
      Files.createFile(Paths.get(s"$big/_orders10"))
    }
    // replicate the dimensions WITH the same key shifts the facts got:
    // without this, 9/10 of the shifted o_custkey/l_suppkey values
    // dangle and any dim-join query at 10× silently drops most facts
    // (skewing its growth row toward "too fast")
    if (!Files.exists(Paths.get(s"$big/_customer10"))) {
      val cu = spark.read.parquet(s"$small/customer.parquet")
      (0 until 10).map { c =>
        cu.select((col("c_custkey") + c * 10000000L).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      }.reduce(_ unionByName _)
        .repartition(8).write.mode("overwrite")
        .parquet(s"$big/customer10.parquet")
      swapIn(s"$big/customer10.parquet", s"$big/customer.parquet")
      Files.createFile(Paths.get(s"$big/_customer10"))
    }
    if (!Files.exists(Paths.get(s"$big/_supplier10"))) {
      val su = spark.read.parquet(s"$small/supplier.parquet")
      (0 until 10).map { c =>
        su.select((col("s_suppkey") + c * 10000000L).as("s_suppkey"),
          col("s_name"), col("s_nationkey"), col("s_acctbal"))
      }.reduce(_ unionByName _)
        .repartition(8).write.mode("overwrite")
        .parquet(s"$big/supplier10.parquet")
      swapIn(s"$big/supplier10.parquet", s"$big/supplier.parquet")
      Files.createFile(Paths.get(s"$big/_supplier10"))
    }
    if (!Files.exists(Paths.get(s"$big/_lineitem10"))) {
      val li = spark.read.parquet(s"$small/lineitem.parquet")
      (0 until 10).map { c =>
        li.select((col("l_orderkey") + c * 100000000L).as("l_orderkey"),
          col("l_partkey"),
          (col("l_suppkey") + c * 10000000L).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/lineitem10.parquet")
      swapIn(s"$big/lineitem10.parquet", s"$big/lineitem.parquet")
      Files.createFile(Paths.get(s"$big/_lineitem10"))
    }
    if (!Files.exists(Paths.get(s"$big/_emb10"))) {
      val e = spark.read.parquet(s"$small/embeddings.parquet")
      (0 until 10).map { c =>
        e.select((col("vec_id") + c * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.003f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/embeddings.parquet")
      Files.createFile(Paths.get(s"$big/_emb10"))
    }
    // MIN of 4 warm runs, not median: this host shows multi-second
    // CPU-steal windows (load spikes with no local process) that
    // inflate any single run ~10x — the min is the robust steady-state
    // estimator for a growth RATIO (both sides estimated the same way)
    def best4(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(4)(run()).min
    }
    val wave = (args.lift(2) match {
      case Some(range) =>
        val Array(a, b) = range.split("-").map(_.toInt); a to b
      case None => 133 to 156
    }).map(i =>
      graft.SparkEntry.queries.keys.find(_.startsWith(s"x${i}_")).get)
    val parts = wave.map { name =>
      val s = best4(name, small)
      val b = best4(name, big)
      f""""$name":[$s%.2f,$b%.2f,${b / s}%.2f]"""
    }
    println(parts.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Long-document growth check for the r16 n-gram generator respelling
  * (VERDICT r15 item 1): the old explode(sequence)+element_at row
  * extractors carried the FULL token array in every generated row —
  * bytes-in-stage O(tokens · docLen), invisible at the fixture's ~54
  * tokens/doc but quadratic on book-length documents. This fixture
  * holds doc COUNT low and doc LENGTH high: `docs` documents whose
  * text is the sf0.1 text repeated `reps`× (250 × 200 reps ≈ 10.8k
  * tokens/doc, ~2.7M total tokens = 10× the sf0.1 corpus), so a
  * ~linear wall ratio on x111/x124 certifies the generator stage now
  * moves O(tokens · n) bytes. Min-of-4 warm per side (host CPU-steal
  * protocol, BENCH_LOCAL "growth-check" section).
  */
object R16LongDocScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/longdoc16")
    val nDocs = args.lift(2).map(_.toInt).getOrElse(250)
    val reps = args.lift(3).map(_.toInt).getOrElse(200)
    val spark = Sessions.local("graft-r16-longdoc")
    if (!Files.exists(Paths.get(s"$big/documents.parquet"))) {
      val base = spark.read.parquet(s"$small/documents.parquet")
        .orderBy("doc_id").limit(nDocs)
      base.select(col("doc_id"),
          concat_ws(" ", array_repeat(col("text"), reps)).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/documents.parquet")
    }
    def best4(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(4)(run()).min
    }
    val names = if (args.length > 4) args.drop(4).toSeq
      else Seq("x111_kn_trigram_quality", "x124_kn5_quality")
    val parts = names.map { name =>
      val s = best4(name, small)
      val b = best4(name, big)
      f""""$name":[$s%.2f,$b%.2f,${b / s}%.2f]"""
    }
    println(parts.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Crossing-vs-scale retirement check for the two r16 weak rows
  * (VERDICT r16 item 2 — the exact x133/x45 protocol): x102_top_pc
  * (embeddings) and x122_portable_corpus_sig (documents), timed
  * min-of-4-warm at sf0.1 and on a shared-vocab `copies`× fixture.
  * Embeddings are replicated `copies`× with id offsets + a per-copy
  * scale perturbation (the R14OpScale convention), since
  * [[ScaleFixture]] copies non-document tables verbatim. The DuckDB
  * side of the crossing runs SEPARATELY via scripts/duck_time.py on
  * the same dirs (never concurrently with this — the CPU-contention
  * protocol in the verify skill).
  */
object R17WeakRowScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val big = args.lift(2).getOrElse(s"/tmp/sf${copies}r17")
    // fixture build BEFORE this run's session (ScaleFixture stops the
    // shared-JVM SparkContext on exit)
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, copies.toString))
    val spark = Sessions.local("graft-r17-weakrows")
    if (!Files.exists(Paths.get(s"$big/_emb"))) {
      val e = spark.read.parquet(s"$small/embeddings.parquet")
      (0 until copies).map { c =>
        e.select((col("vec_id") + c * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + (c % 200) * 0.003f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/emb_big.parquet")
      // swap over the prefill's verbatim copy (deleteQuietly — an
      // absent target must not wedge the prefill)
      org.apache.commons.io.FileUtils.deleteQuietly(
        Paths.get(s"$big/embeddings.parquet").toFile)
      Files.move(Paths.get(s"$big/emb_big.parquet"),
        Paths.get(s"$big/embeddings.parquet"))
      Files.createFile(Paths.get(s"$big/_emb"))
    }
    def best4(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(4)(run()).min
    }
    val names = if (args.length > 3) args.drop(3).toSeq
      else Seq("x102_top_pc", "x122_portable_corpus_sig")
    val parts = names.map { name =>
      val s = best4(name, small)
      val b = best4(name, big)
      f""""$name":[$s%.2f,$b%.2f,${b / s}%.2f]"""
    }
    println(s"""{"copies":$copies,""" +
      parts.mkString("", ",", "}"))
    spark.stop()
  }
}

/** Crossing-vs-scale trajectory rows for the four r18 fixture-layout
  * movers (VERDICT r18 item 5): x12_neardup_pairs /
  * x126_cluster_reps / x157_source_signature (documents — measured on
  * the standing shared-vocab [[ScaleFixture]] dirs, the exact
  * x133/x45 protocol) and x155_session_type_lift (events — measured
  * on an events-replicated fixture this object builds: `copies`×
  * user_id/event_id offsets over the same time span, i.e. more
  * concurrent users, the realistic session-growth axis; other tables
  * verbatim). Timing = 1 discarded cold + min-of-4 warm per (row,
  * dir). The DuckDB side of any crossing runs SEPARATELY via
  * scripts/duck_time.py on the same dirs (never concurrent — the
  * CPU-contention protocol in the verify skill); x12/x126's oracles
  * are all-pairs / recursive-CTE spellings that do not complete at
  * 100× in bounded time, so their trajectory rows are Spark-growth +
  * the committed 1× crossing (0.19× / 0.01×), the x34 precedent.
  */
object R19MoverScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val docsBig = args.lift(2).getOrElse(s"/tmp/sf${copies}r17w")
    val evtBig = args.lift(3).getOrElse(s"/tmp/sf${copies}r19evt")
    if (!Files.exists(Paths.get(s"$docsBig/documents.parquet")))
      ScaleFixture.main(Array(small, docsBig, copies.toString))
    val spark = Sessions.local("graft-r19-movers")
    if (!Files.exists(Paths.get(s"$evtBig/_evt"))) {
      Files.createDirectories(Paths.get(evtBig))
      val e = graft.Tables.load(spark, small, "events")
      (0 until copies).map { c =>
        e.select((col("event_id") + c * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + c * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$evtBig/events.parquet")
      // remaining tables verbatim so the dir is a complete fixture
      Files.list(Paths.get(small)).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          p.getFileName.toString != "events.parquet" &&
          Files.isRegularFile(p))
        .foreach(p => Files.copy(p,
          Paths.get(evtBig, p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING))
      Files.createFile(Paths.get(s"$evtBig/_evt"))
    }
    // SPARK_GRAFT_SCALE_WARM trims the warm count at 100× (the
    // SPARK_GRAFT_WARM_RUNS precedent: multi-minute rows can't afford
    // 4-warm mins); the 100× leg also needs SPARK_DRIVER_MEM ≥ 32g —
    // the pair-verify working set of 6M shared-vocab docs through ONE
    // 32-thread JVM overflows the default 8g heap (measured OOM, r19;
    // a deployment spreads the same join over executors whose
    // aggregate memory scales with the data, so the single-JVM heap is
    // a bench-host artifact, not a plan property)
    val warm = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM", "4").toInt
    def best4(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      Seq.fill(warm)(run()).min
    }
    val docRows = Seq("x12_neardup_pairs", "x126_cluster_reps",
      "x157_source_signature")
    val parts =
      docRows.map { name =>
        val s = best4(name, small)
        val b = best4(name, docsBig)
        f""""$name":[$s%.2f,$b%.2f,${b / s}%.2f]"""
      } :+ {
        val s = best4("x155_session_type_lift", small)
        val b = best4("x155_session_type_lift", evtBig)
        f""""x155_session_type_lift":[$s%.2f,$b%.2f,${b / s}%.2f]"""
      }
    println(s"""{"copies":$copies,""" + parts.mkString("", ",", "}"))
    spark.stop()
  }
}

private[tools] object Sessions {
  def local(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's AQE coalesce floor (r20) so tool-measured plans
      // and stages reproduce the bench's
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "131072"))
      // r21 (guide §2.3): shuffle/spill codec, env-parameterised for
      // the scale-fixture codec experiment (lz4 vs zstd rows in
      // BENCH_LOCAL.md). Default stays Spark's lz4 so tool runs match
      // the bench session.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
