package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic-sampling properties the oracle rows (x35/x36) cannot
  * see: boundary rates, stability under repartitioning, nested samples,
  * split totality, and duplicate-stratum resolution.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents")
    .select($"doc_id", $"source", $"n_chars").cache()

  test("rate 1.0 keeps every row; rate 0.0 keeps none") {
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() === docs.count())
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() === 0L)
  }

  test("rates under the 1/65536 granularity round to an empty sample") {
    // documented quantization, pinned so it can never become silent
    assert(Sampling.hashSample(docs, "doc_id", 1e-6).count() === 0L)
    intercept[IllegalArgumentException] { Sampling.hexThreshold(1e-6) }
    intercept[IllegalArgumentException] { Sampling.hexThreshold(0.9999999) }
    assert(Sampling.hexThreshold(0.5) === "8000")
  }

  test("sampling is deterministic and stable under repartitioning") {
    val ids = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val again = Sampling.hashSample(docs.repartition(7, $"source"), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    assert(ids === again)
  }

  test("sample size tracks the rate (4-sigma binomial window)") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, "doc_id", 0.25).count().toDouble
    assert(math.abs(k - 0.25 * n) <= 4 * math.sqrt(n * 0.25 * 0.75) + 1,
      s"sampled $k of $n at rate 0.25")
  }

  test("samples are nested: a lower rate is a subset of a higher rate") {
    val lo = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val hi = Sampling.hashSample(docs, "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(lo.nonEmpty && lo.subsetOf(hi))
  }

  test("splitAssign is total, disjoint, and stable as the corpus grows") {
    val split = Sampling.splitAssign(docs, "doc_id", 0.8, 0.1)
    assert(split.count() === docs.count()) // total: one row, one split
    assert(split.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // growing/shrinking the corpus never migrates an id between splits
    val full = split.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val sub = Sampling.splitAssign(docs.filter($"doc_id" % 3 === 0),
        "doc_id", 0.8, 0.1)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(sub.nonEmpty)
    sub.foreach { case (id, sp) => assert(full(id) === sp, s"doc $id migrated") }
    // boundary: train+val = 1.0 leaves test empty (rate-1 short-circuit)
    val noTest = Sampling.splitAssign(docs, "doc_id", 0.5, 0.5)
    assert(noTest.filter($"split" === "test").count() === 0L)
  }

  test("token-budget mix: generous budgets keep all, tight track budget") {
    val withTok = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source",
        graft.ops.TextAnalysis.tokenCount($"text").as("tok")).cache()
    val totals = withTok.groupBy("source").agg(sum($"tok").as("t"))
      .as[(String, Long)].collect().toMap
    // budget >= total → rate-1 short-circuit keeps the stratum intact
    val generous = Sampling.tokenBudgetSample(withTok, "doc_id", "source",
      $"tok", budgets = Map.empty, defaultBudget = totals.values.max * 2)
    assert(generous.count() === withTok.count())
    // tight budget → membership equals a locally-computed JVM-md5
    // reference (pins Spark's md5/substr/compare to the spec exactly;
    // at this fixture size the binomial window around the budget is too
    // wide to be a meaningful assertion — the oracle row x40 checks the
    // cross-engine contract instead)
    val budget = totals.values.min / 3
    val rows = withTok.select($"doc_id", $"source", $"tok")
      .as[(Long, String, Long)].collect()
    def localKeep(id: Long, rate: Double): Boolean = {
      val t = (rate * 65536).round
      if (t >= 65536L) true else if (t <= 0L) false else {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 4)
        hex < f"$t%04x"
      }
    }
    val expectedIds = rows.filter { case (id, src, _) =>
      localKeep(id, math.min(1.0, budget.toDouble / math.max(totals(src), 1L)))
    }.map(_._1).toSet
    val tightIds = Sampling.tokenBudgetSample(withTok, "doc_id", "source",
        $"tok", budgets = Map.empty, defaultBudget = budget)
      .select("doc_id").as[Long].collect().toSet
    assert(tightIds === expectedIds)
    assert(tightIds.nonEmpty && tightIds.size < rows.length)
    // monotone: a smaller budget's sample is contained in a bigger one's
    val lo = Sampling.tokenBudgetSample(withTok, "doc_id", "source",
        $"tok", Map.empty, budget).select("doc_id").as[Long].collect().toSet
    val hi = Sampling.tokenBudgetSample(withTok, "doc_id", "source",
        $"tok", Map.empty, budget * 2).select("doc_id").as[Long].collect().toSet
    assert(lo.nonEmpty && lo.subsetOf(hi))
    // stable under repartitioning (pure function of the id)
    val again = Sampling.tokenBudgetSample(withTok.repartition(7, $"source"),
        "doc_id", "source", $"tok", Map.empty, budget)
      .select("doc_id").as[Long].collect().toSet
    assert(again === lo)
  }

  test("stratified rates apply per stratum; the last duplicate entry wins") {
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "source",
        Seq("src0" -> 1.0, "src1" -> 0.0), 0.25)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sampled("src0") === totals("src0")) // rate-1 stratum intact
    assert(!sampled.contains("src1")) // rate-0 stratum dropped
    // duplicate stratum: the later entry shadows the earlier one
    val dup = Sampling.stratifiedSample(docs, "doc_id", "source",
      Seq("src0" -> 0.0, "src0" -> 1.0), 0.0)
    assert(dup.count() === totals("src0"))
  }

  test("shardRepack: total, dense 1-based positions, repartition-stable") {
    val packed = Sampling.shardRepack(docs, "doc_id", numShards = 8).cache()
    // total: every row gets exactly one (shard, pos) address
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // shards within range, positions dense 1..count(shard)
    assert(packed.filter($"shard" < 0 || $"shard" >= 8).count() === 0L)
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"),
        countDistinct($"pos").as("d"))
      .as[(Long, Long, Long, Long, Long)].collect().foreach {
        case (shard, n, lo, hi, d) =>
          assert(lo === 1L && hi === n && d === n,
            s"shard $shard positions not dense: n=$n lo=$lo hi=$hi d=$d")
      }
    // a pure function of the id: stable under repartitioning
    val again = Sampling.shardRepack(docs.repartition(7, $"source"),
        "doc_id", 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === packed.as[(Long, Long, Long)].collect().toSet)
    // uniform-ish: no shard holds more than 2× the fair share (md5 is
    // well-mixed; at n=500 the binomial tail past 2× is negligible)
    val maxShare = packed.groupBy("shard").count()
      .agg(max($"count")).as[Long].head()
    assert(maxShare <= 2L * docs.count() / 8,
      s"worst shard holds $maxShare of ${docs.count()}")
    packed.unpersist()
  }

  test("round-6 ops reject degenerate parameters loudly") {
    intercept[IllegalArgumentException] {
      Sampling.shardRepack(docs, "doc_id", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerStratum(docs, "source", Seq($"doc_id"), 0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.packSequences(
        Tables.load(spark, sf0001, "documents"), "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.vocabCoverage(
        Tables.load(spark, sf0001, "documents"), "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.hashClassifierScore(
        Tables.load(spark, sf0001, "documents"), "doc_id", "text",
        Seq.empty, 0.0)
    }
    // empty eval set: scrubSpans is the identity on token content
    val d = Tables.load(spark, sf0001, "documents").limit(20)
    val out = graft.ops.Contamination.scrubSpans(
      d, d.filter(lit(false)), "doc_id", "text", 5)
    assert(out.filter($"n_scrubbed" =!= 0L).count() === 0L)
    assert(out.count() === 20L)
  }

  test("capPerStratum keeps the best `cap` rows per stratum, deterministically") {
    val cap = 25
    val kept = Sampling.capPerStratum(docs, "source",
      Seq($"n_chars".desc, $"doc_id".asc), cap).cache()
    val perSource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    totals.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0L) === math.min(n, cap.toLong),
        s"source $src kept ${perSource.getOrElse(src, 0L)} of $n")
    }
    // best-first: every kept row beats every dropped row of its stratum
    // under the (n_chars desc, doc_id asc) order
    val dropped = docs.join(kept, Seq("doc_id"), "left_anti")
    val worstKept = kept.groupBy(kept("source").as("src"))
      .agg(max(struct(-$"n_chars", $"doc_id")).as("wk"))
    val beats = dropped.join(worstKept, dropped("source") === $"src")
      .filter(struct(-dropped("n_chars"), dropped("doc_id")) < $"wk")
    assert(beats.count() === 0L, "a dropped row outranks a kept row")
    kept.unpersist()
  }

  test("percentile gate keeps the exact top fraction of every stratum") {
    val scored = docs.select($"doc_id", $"source",
      $"n_chars".cast("double").as("score"))
    val kept = Sampling.percentileGate(scored, "doc_id", "source",
      "score", keepFrac = 0.25).cache()
    val perSource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = scored.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // pct = (rank-1)/(n-1) >= 0.75  ⇔  rank >= ceil(0.75(n-1)) + 1
    // (ranks are total under the id tie-break), so the kept count is a
    // pure function of n — the same-fraction-of-every-domain contract
    totals.foreach { case (src, n) =>
      val want = (1L to n).count(r => (r - 1).toDouble / (n - 1) >= 0.75)
      assert(perSource.getOrElse(src, 0L) === want.toLong,
        s"source $src kept ${perSource.getOrElse(src, 0L)} of $n")
    }
    // survivors are the top-scored rows: no dropped row may outscore a
    // kept row of the same stratum under (score, doc_id)
    val dropped = scored.join(kept.select("doc_id"), Seq("doc_id"),
      "left_anti")
    val worstKept = kept.groupBy(kept("source").as("src"))
      .agg(min(struct($"score", $"doc_id")).as("wk"))
    val beats = dropped.join(worstKept, dropped("source") === $"src")
      .filter(struct(dropped("score"), dropped("doc_id")) > $"wk")
    assert(beats.count() === 0L, "a dropped row outscores a kept row")
    kept.unpersist()
  }

  test("mixture weights: normalized, temperature flattens, alpha laws") {
    val full = Tables.load(spark, sf0001, "documents")
    def mix(alpha: Double) =
      Sampling.mixtureWeights(full, "source", "text", 1000000L, alpha)
        .select($"stratum", $"n_tokens", $"weight", $"draw_tokens", $"epochs")
        .as[(String, Long, Double, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
    val half = mix(0.5); val prop = mix(1.0); val unif = mix(0.0)
    // weights normalize (exact decimal total, so the drift is only the
    // per-stratum double divisions)
    assert(math.abs(half.values.map(_._3).sum - 1.0) < 1e-9)
    // alpha = 0 is exactly uniform
    val s = unif.size
    assert(unif.values.forall(v => v._3 === 1.0 / s))
    // temperature flattens: vs proportional, the smallest stratum gains
    // weight and the largest loses it
    val smallest = prop.values.minBy(_._2)._1
    val largest = prop.values.maxBy(_._2)._1
    assert(half(smallest)._3 > prop(smallest)._3)
    assert(half(largest)._3 < prop(largest)._3)
    // proportional epochs are uniform across strata (draws/size =
    // budget/total, up to the floor on draws)
    val eps = prop.values.map(_._5)
    assert(eps.max - eps.min < 1e-3)
    // draws never exceed the budget
    assert(half.values.map(_._4).sum <= 1000000L)
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(full, "source", "text", 1000000L, 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(full, "source", "text", -1L)
    }
  }

  test("dsirWeights matches a local exact-decimal fold; target-likeness orders logw") {
    import graft.functions.SketchKernels
    import org.apache.spark.unsafe.types.UTF8String
    // target (src0) speaks a/b bigrams; source speaks x/y; doc 5 mixes
    val rows = Seq(
      (1L, "a b a b a", "src0"), (2L, "b a b a", "src0"),
      (3L, "x y x y x", "src1"), (4L, "y x y x", "src1"),
      (5L, "a b x y", "src1"))
    val dim = 4
    val got = Sampling.dsirWeights(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", col("source") === "src0", dim)
      .as[(Long, Boolean, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // local recomputation with the same arithmetic contract
    def bucket(g: String): Long =
      SketchKernels.rollingFingerprint(UTF8String.fromString(g)) % dim
    val feats = rows.flatMap { case (id, text, src) =>
      val ts = text.split(" ")
      ts.zip(ts.tail).map { case (a, b) =>
        ((id, src == "src0", bucket(s"$a $b")), 1L) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // .toSeq first: collect on a Map would rebuild a Map and colliding
    // buckets would overwrite instead of accumulate
    val ct = feats.toSeq.collect { case (((_, true, b)), c) => b -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cs = feats.toSeq.collect { case (((_, false, b)), c) => b -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (tt, ts0) = (ct.values.sum, cs.values.sum)
    def lam(b: Long): BigDecimal = BigDecimal(
      math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + dim.toDouble)) -
        math.log((cs.getOrElse(b, 0L) + 1.0) / (ts0 + dim.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = feats.groupBy(_._1._1).map { case (id, fs) =>
      id -> fs.map { case ((_, _, b), c) => lam(b) * c }.sum.toDouble }
    rows.foreach { case (id, _, src) =>
      val (isT, nBg, logw) = got(id)
      assert(isT === (src == "src0"), s"doc $id")
      assert(nBg === rows.find(_._1 == id).get._2.split(" ").length - 1L)
      assert(logw === expected(id), s"doc $id")
    }
    // the selection property DSIR exists for: pure-target docs score
    // above the mixed doc, which scores above pure-source docs
    assert(got(1L)._3 > got(5L)._3 && got(2L)._3 > got(5L)._3)
    assert(got(5L)._3 > got(3L)._3 && got(5L)._3 > got(4L)._3)
    intercept[IllegalArgumentException] {
      Sampling.dsirWeights(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", col("source") === "src0", 1)
    }
  }

  test("dsirScore on the frozen model is bit-equal to the distributed aggregate") {
    val docs = Tables.load(spark, sf0001, "documents")
    val pred = col("source") === "src0"
    val viaAgg = Sampling.dsirWeights(docs, "doc_id", "text", pred, 16)
      .select("doc_id", "n_bigrams", "logw")
      .as[(Long, Long, Double)].collect().toSet
    val model = Sampling.dsirModel(docs, "doc_id", "text", pred, 16)
    val viaModel = Sampling.dsirScore(docs, "doc_id", "text", model)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaModel === viaAgg)
    assert(viaModel.nonEmpty)
    assert(model.lambdas.size === 16)
    // native kernel ≡ the interpreted HOF executable spec
    val viaSpec = Sampling.dsirScoreSpec(docs, "doc_id", "text", model)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaModel === viaSpec)
    intercept[IllegalArgumentException] {
      Sampling.dsirModel(docs, "doc_id", "text", pred, 2048)
    }
  }

  test("percentile gate boundaries: keepFrac 1 keeps all, singletons drop") {
    val scored = Seq(
      (1L, "a", 5.0), (2L, "a", 3.0), (3L, "a", 9.0), (4L, "a", 1.0),
      (5L, "solo", 7.0)).toDF("doc_id", "source", "score")
    assert(Sampling.percentileGate(scored, "doc_id", "source", "score",
      1.0).count() === 5L)
    val kept = Sampling.percentileGate(scored, "doc_id", "source", "score",
        0.25)
      .as[(Long, String, Double, Double)].collect().sortBy(_._1).toSeq
    // stratum a (n=4): pct = 0, 1/3, 2/3, 1 — only the top row passes
    // 0.75; the singleton stratum has pct 0 and drops
    assert(kept === Seq((3L, "a", 9.0, 1.0)))
    intercept[IllegalArgumentException] {
      Sampling.percentileGate(scored, "doc_id", "source", "score", 0.0)
    }
  }

  test("unimaxAllocation: caps, fair share, remainder token, surplus budget") {
    import spark.implicits._
    def doc(id: Long, s: String, nTok: Int) =
      (id, s, Seq.fill(nTok)("w").mkString(" "))
    val docs = Seq(doc(1, "a", 10), doc(2, "b", 100), doc(3, "c", 200))
      .toDF("doc_id", "source", "text")
    def run(budget: Long) = graft.ops.Sampling.unimaxAllocation(
        docs, "source", "text", budget, maxEpochs = 3L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // B=500: a caps at 30 (3 epochs), b/c split 470 -> 235 each
    assert(run(500L) === Map(
      "a" -> ((10L, 30L, 30L, 3.0)),
      "b" -> ((100L, 300L, 235L, 2.35)),
      "c" -> ((200L, 600L, 235L, 1.175))))
    // B=501: the 1-token remainder goes to the lower-rank free stratum
    val r501 = run(501L)
    assert(r501("b")._3 === 236L && r501("c")._3 === 235L)
    // surplus budget: every stratum capped, surplus unallocated
    assert(run(2000L).values.map(_._3).sum === 930L)
    assert(run(2000L).values.forall(v => v._3 === v._2))
    // fair share below every cap: nothing capped, floor-division split
    val r60 = run(60L)
    assert(r60.values.map(_._3).sum === 60L)
    assert(r60.values.forall(v => v._3 === 20L))
  }

  test("unimaxAllocation: non-BMP strata tie-break follows the " +
      "engines' UTF-8 collation, not UTF-16 code units") {
    import spark.implicits._
    // equal caps force the (cap, stratum) tie onto the string order.
    // 😀 (U+1F600) is f0 9f 98 80 in UTF-8 but a D83D-led surrogate
    // pair in UTF-16; ￮ (U+FFEE) is ef bf ae / FFEE: UTF-16 sorts
    // 😀 FIRST, UTF-8 sorts it LAST — the oracle (binary collation)
    // does the latter.
    val emoji = "😀"; val bmp = "￮"
    assert(Ordering.String.lt(emoji, bmp)) // the JVM trap is real
    assert(graft.ops.Sampling.utf8ByteOrder.gt(emoji, bmp))
    val docs = Seq((1L, emoji, "w w w"), (2L, bmp, "w w w"))
      .toDF("doc_id", "source", "text")
    // B=5, caps both 9: fair share 2 each, remainder 1 goes to the
    // FIRST free stratum in sorted order — bmp under UTF-8
    val got = graft.ops.Sampling.unimaxAllocation(
        docs, "source", "text", tokenBudget = 5L, maxEpochs = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map(bmp -> 3L, emoji -> 2L))
  }

  test("weightedSampleTopK: pure-Scala ES recompute is bit-equal; " +
      "ln micros sit clear of their FLOOR boundaries; weights bias") {
    val docs = Tables.load(spark, sf001, "documents")
      .select($"doc_id", $"source",
        coalesce(size(split($"text", " ")).cast("long"), lit(0L))
          .as("n_tokens"))
    val rows = docs.as[(Long, String, Long)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // local ES recompute: u from the 48-bit md5 dyadic, quantized ln,
    // integer floor-div by weight — the op's exact arithmetic
    case class K(id: Long, src: String, w: Long, lq: Long, key: Long)
    var minMargin = Double.MaxValue
    // r14 contract: weight < 1 rows are excluded (ES zero-weight =
    // zero inclusion probability), not clamped to 1
    val keys = rows.filter(_._3 >= 1L).map { case (id, src, nTok) =>
      val w = nTok
      val hex = md5hex(s"wsr|$id")
      val h48 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      val u = (h48 + 0.5) / 281474976710656.0
      val x = -math.log(u) * 1000000.0 + 0.5
      // distance of the pre-FLOOR value from an integer boundary:
      // conforming libm ln() implementations differ by ~1 ulp (~7e-9
      // absolute at this scale); require 10x clearance
      val frac = x - math.floor(x)
      minMargin = math.min(minMargin, math.min(frac, 1.0 - frac))
      val lq = math.floor(x).toLong
      K(id, src, w, lq, lq * 1000000L / w)
    }
    assert(minMargin >= 1e-7,
      f"a quantized ln draw sits $minMargin%.2e from its FLOOR " +
        "boundary — below the cross-libm safety margin")
    val expected = keys.groupBy(_.src).toSeq.flatMap { case (src, ks) =>
      ks.sortBy(k => (k.key, k.id)).take(20).zipWithIndex
        .map { case (k, i) => (src, k.id, k.w, k.key, (i + 1).toLong) }
    }.toSet
    val got = Sampling.weightedSampleTopK(
        docs, "doc_id", "source", "n_tokens", k = 20)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // weight-proportional WOR must over-represent heavy docs: the
    // sampled mean weight beats the corpus mean (deterministic on
    // this fixture, and a basic sanity of the estimator)
    val sampledMean = got.toSeq.map(_._3).sum.toDouble / got.size
    val corpusMean = keys.map(_.w).sum.toDouble / keys.length
    assert(sampledMean > corpusMean,
      s"sampled mean weight $sampledMean !> corpus mean $corpusMean")
  }

  test("esKeyed weight contract (r15): fractional, negative, and NULL " +
      "weights RAISE; integral zeros are dropped, not clamped") {
    def run(weights: Seq[Option[Double]]): Seq[Long] =
      Sampling.weightedSampleTopK(
          weights.zipWithIndex
            .map { case (w, i) => (i.toLong, "s", w) }
            .toDF("id", "stratum", "w"),
          "id", "stratum", "w", k = 10)
        .select($"id").as[Long].collect().toSeq.sorted
    // in contract: integral doubles >= 0; the zero is dropped
    assert(run(Seq(Some(3.0), Some(1.0), Some(0.0))) === Seq(0L, 1L))
    // out of contract: each variant must fail the JOB, not bias it
    for (bad <- Seq[Option[Double]](Some(0.5), Some(-2.0), None)) {
      val e = intercept[Exception] { run(Seq(Some(3.0), bad)) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("out of contract")),
        s"weight $bad did not raise the contract error: $e")
    }
  }

  test("bootstrapMeanCI (x148): a constant metric collapses the " +
      "interval to the exact point; weights average ~Poisson(1); " +
      "the report is deterministic") {
    // constant metric: every resample's weighted mean is the
    // constant EXACTLY (floor((Σw·c·1e6)/Σw) = c·1e6), so
    // ci_lo = mean = ci_hi with no tolerance
    val docs = (1L to 50L).map(i => (i, "A", 7L))
      .toDF("id", "src", "x")
    val got = Sampling.bootstrapMeanCI(docs, "id", "src", col("x"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(got === Set(("A", 50L, 7000000L,
      Some(7000000L), Some(7000000L))))
    // the quantized Poisson(1) CDF thresholds: the empirical mean
    // weight over 4000 independent (id, rep) draws must sit near 1
    val ids = (1L to 100L).map(i => (i, 0L)).toDF("id", "z")
    val meanW = ids.select(explode(sequence(lit(0), lit(39)))
        .as("b"), col("id"))
      .select(Sampling.poissonWeight(col("id"), col("b")).as("w"))
      .agg(avg(col("w"))).head().getDouble(0)
    assert(meanW > 0.85 && meanW < 1.15,
      s"mean Poisson weight $meanW drifted from 1")
    // determinism: a second evaluation is bit-identical
    val again = Sampling.bootstrapMeanCI(docs, "id", "src", col("x"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(again === got)
  }
}
