package graft

import org.apache.spark.sql.functions._

/** HLL++ approximate distinct (x16's engine) must stay inside its
  * advertised relative standard deviation against the exact count.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3 rsd of exact per group") {
    val e = Tables.load(spark, sf0001, "events")
    val rsd = 0.05
    val rows = e.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", rsd).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, exact, approx) =>
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 3 * rsd,
        s"$tpe: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("percentile_approx rank error bounded by n/accuracy (x52's engine)") {
    val e = Tables.load(spark, sf0001, "events")
    val acc = 100
    Seq(0.5, 0.9).foreach { p =>
      val rows = e.groupBy($"event_type")
        .agg(percentile_approx($"value", lit(p), lit(acc)).as("approx"),
          sort_array(collect_list($"value")).as("all"))
        .as[(String, Double, Seq[Double])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (tpe, approx, all) =>
        val n = all.size
        // GK contract: the returned value has SOME 1-based rank r in its
        // tie interval [count(<)+1, count(<=)] with |r − p·n| ≤
        // n/accuracy (+1 discretization). Testing against the interval,
        // not count(<=) alone, keeps duplicate values from inflating
        // the measured error past the sketch's actual guarantee.
        val rMin = all.count(_ < approx) + 1
        val rMax = all.count(_ <= approx)
        val bound = n.toDouble / acc + 1
        assert(p * n >= rMin - bound && p * n <= rMax + bound,
          s"$tpe p=$p: rank interval [$rMin,$rMax] target=${p * n} " +
            s"n=$n approx=$approx")
      }
    }
  }

  test("heavy hitters: >N/k survival and N/k error bound, any partitioning") {
    import graft.functions.HeavyHittersFunctions.heavyHitters
    val k = 32
    val toks = Tables.load(spark, sf0001, "documents")
      .select(explode(split($"text", " ", -1)).as("w")).cache()
    val n = toks.count()
    val exact = toks.groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 13)) {
      val got = toks.repartition(parts)
        .agg(heavyHitters($"w", k).as("hh"))
        .select(explode($"hh").as("h"))
        .select($"h.item", $"h.est").as[(String, Long)].collect().toMap
      assert(got.size <= k - 1, s"more than k-1 counters: ${got.size}")
      // GUARANTEE 1: every item with true count > N/k survives
      exact.filter(_._2 > n / k).foreach { case (w, c) =>
        assert(got.contains(w), s"parts=$parts: heavy item '$w' ($c) lost")
      }
      // GUARANTEE 2: estimates undercount by at most N/k, never over
      got.foreach { case (w, est) =>
        val truth = exact(w)
        assert(est <= truth && truth - est <= n / k,
          s"parts=$parts: '$w' est=$est true=$truth bound=${n / k}")
      }
    }
    // SQL surface + arity error
    toks.createOrReplaceTempView("hh_toks")
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT explode(heavy_hitters(w, 32)) AS h FROM hh_toks")
    assert(viaSql.count() >= 1)
    val err = intercept[Exception] { spark.sql("SELECT heavy_hitters('x')") }
    assert(err.getMessage.contains("heavy_hitters"))
    toks.unpersist()
  }

  test("portable KMV sketch (x114): estimator accuracy, sub-k exact " +
      "short-circuit, and the pure-Scala hash-order mini-oracle") {
    import graft.ops.Cardinality
    val e = Tables.load(spark, sf0001, "events")
    val k = 64
    val got = Cardinality.portableKmvDistinct(e, "event_type", "user_id", k)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = e.filter($"user_id".isNotNull).groupBy($"event_type")
      .agg(countDistinct($"user_id").as("x"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet === exact.keySet && got.nonEmpty)
    got.foreach { case (tpe, (nK, kthV, est)) =>
      val d = exact(tpe)
      if (d < k) {
        // sketch saw everything: exact short-circuit
        assert(nK === d && est === d, s"$tpe sub-k path broken")
      } else {
        assert(nK === k.toLong)
        // KMV rsd ~ 1/sqrt(k-1) = 0.126; allow 4 sigma + 16-bit grid
        val relErr = math.abs(est - d).toDouble / d
        assert(relErr <= 0.55, s"$tpe est=$est exact=$d relErr=$relErr")
        // mini-oracle: recompute the k-th smallest md5 prefix in pure
        // Scala over the group's distinct values — the exact integers
        // the published row must carry
        val vals = e.filter($"event_type" === tpe &&
            $"user_id".isNotNull)
          .select($"user_id").distinct().as[Long].collect()
        val kth = vals.map { u =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(u.toString.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
        }.sorted.apply(k - 1)
        val v = java.lang.Long.parseLong(kth.substring(0, 4), 16)
        assert(kthV === v, s"$tpe kth_v mismatch")
        assert(est === math.floor((k - 1) * 65536.0 / (v + 1)).toLong)
      }
    }
  }

  test("KMV sketch state is mergeable: per-shard k-smallest merge to " +
      "the global k-smallest (the production-aggregate contract)") {
    import graft.ops.Cardinality
    val e = Tables.load(spark, sf0001, "events")
    val k = 64
    def md5hex(u: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val byType = e.filter($"user_id".isNotNull)
      .select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect().groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (tpe, rows) =>
      val all = rows.map(r => md5hex(r._2)).distinct.sorted
      val global = all.take(k)
      // shard by an arbitrary partitioner, sketch each shard, merge
      for (shards <- Seq(2, 7)) {
        val perShard = rows.groupBy(_._2 % shards).values
          .map(_.map(r => md5hex(r._2)).distinct.sorted.take(k))
        val merged = perShard.flatten.toSeq.distinct.sorted.take(k)
        assert(merged === global.toSeq,
          s"$tpe: $shards-shard merge diverges from the global sketch")
      }
    }
    // and the DataFrame op is partitioning-invariant end to end
    val a = Cardinality.portableKmvDistinct(e.repartition(1),
      "event_type", "user_id", k).collect().map(_.toSeq).toSet
    val b = Cardinality.portableKmvDistinct(e.repartition(13),
      "event_type", "user_id", k).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("portable twins x120/x121/x122 equal pure-Scala recomputation " +
      "and sit consistently beside their production sketches") {
    // x120: exact disc quantiles == sorted-array picks
    val e = Tables.load(spark, sf0001, "events")
      .filter($"value".isNotNull)
    val gotQ = SparkEntry.queries("x120_portable_quantiles")(
        spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val byType = e.select($"event_type", $"value")
      .as[(String, Double)].collect().groupBy(_._1)
    assert(gotQ.keySet === byType.keySet)
    byType.foreach { case (tpe, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length.toLong
      def pick(num: Long, den: Long): Double =
        v((math.floor((num * n + num).toDouble / den) - 1).toInt)
      assert(gotQ(tpe) === ((n, pick(1, 2), pick(9, 10), pick(99, 100))))
    }
    // x121: exact top-8 == pure-Scala sort (the Misra-Gries survival
    // guarantee itself is pinned in the heavy-hitters test above)
    val gotT = SparkEntry.queries("x121_portable_topk")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val toks = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
      .select($"source", explode(split($"text", " ", -1)).as("w"))
      .as[(String, String)].collect()
    toks.groupBy(_._1).foreach { case (src, rows) =>
      val top = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(8)
      val got = gotT.filter(_._1 == src).sortBy(_._4)
        .map(r => (r._2, r._3))
      assert(got.toSeq === top, s"source $src top-8 mismatch")
    }
    // x122: each signature component recomputes in pure Scala; the
    // 8-component estimate is a coarse but sane Jaccard proxy
    def md5hexS(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val bySrc = toks.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    def sig(src: String): Seq[String] = (0 until 8).map { i =>
      bySrc(src).map(t => md5hexS(s"${i / 4}|$t")
        .substring((i % 4) * 8, (i % 4) * 8 + 8)).min
    }
    val gotP = SparkEntry.queries("x122_portable_corpus_sig")(
        spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(gotP.nonEmpty)
    gotP.take(5).foreach { case ((sa, sb), (nAgree, est)) =>
      val expect = sig(sa).zip(sig(sb)).count { case (x, y) => x == y }
      assert(nAgree === expect.toLong && est === expect / 8.0)
      val ja = {
        val (a, b) = (bySrc(sa), bySrc(sb))
        a.intersect(b).size.toDouble / a.union(b).size
      }
      assert(math.abs(est - ja) <= 0.5) // 8 components: coarse proxy
    }
  }
}
