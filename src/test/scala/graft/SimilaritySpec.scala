package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Similarity-search correctness beyond the DuckDB oracle: brute-force
  * top-k agrees with a locally-computed exact answer, and IVF returns a
  * subset consistent with it.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()

  private lazy val localTop: Seq[(Long, Double)] = {
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val q = vecs.find(_._1 == 0L).get._2.map(_.toDouble)
    def cos(a: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nq = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * q(i); na += a(i) * a(i); nq += q(i) * q(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nq))
    }
    vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        val c = cos(v.map(_.toDouble))
        (id, BigDecimal(c).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(10).toSeq
  }

  test("brute-force top-10 equals local exact computation") {
    val got = Similarity.bruteForceTopK(
        emb.filter($"vec_id" =!= 0), "vec_id", "embedding",
        emb.filter($"vec_id" === 0), "embedding", 10)
      .as[(Long, Double)].collect().toSeq
      .sortBy { case (id, c) => (-c, id) }
    assert(got === localTop)
  }

  test("PQ: local replay matches encode+ADC; top-k cuts per partition") {
    val model = Similarity.pqTrain(emb, "vec_id", "embedding",
      numSub = 4, subDim = 16, seedStride = 50, iters = 2)
    assert(model.codebooks.length === 4)
    model.codebooks.foreach(cb => assert(cb.cells.nonEmpty))
    val got = Similarity.pqTopK(emb, "vec_id", "embedding", model, 0L, 10)
    // the top-k must cut per partition before any exchange (the
    // orderBy+limit fuses to TakeOrderedAndProject)
    assert(got.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val rows = got.collect().map(r => (r.getLong(0),
      (1 to 4).map(r.getLong).toList, r.getLong(5))).toSeq
    // independent local replay of grid → codes → ADC over the trained
    // codebooks (the exact-Long contract: milli-grid centroids,
    // D = Σ(1000a − C)², (dist, cell) tie-break)
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.floor(x.toDouble * 1000).toLong) }.toMap
    def sq(sub: Array[Long], cv: Array[Long]): Long =
      sub.indices.map { i =>
        val d = 1000L * sub(i) - cv(i); d * d
      }.sum
    def codeOf(q: Array[Long], m: Int): Long = {
      val b = model.codebooks(m)
      b.cells.indices.map(i =>
        (sq(q.slice(m * 16, m * 16 + 16), b.cents(i)), b.cells(i))).min._2
    }
    val q0 = vecs(0L)
    val tables = (0 until 4).map { m =>
      val b = model.codebooks(m)
      b.cells.indices.map(i =>
        b.cells(i) -> sq(q0.slice(m * 16, m * 16 + 16), b.cents(i))).toMap
    }
    val local = vecs.toSeq.filter(_._1 != 0L).map { case (id, q) =>
      val codes = (0 until 4).map(m => codeOf(q, m)).toList
      (id, codes, codes.zipWithIndex.map { case (c, m) => tables(m)(c) }.sum)
    }.sortBy(r => (r._3, r._1)).take(10)
    assert(rows === local)
    // ADC distances are non-negative and the cut is ascending
    assert(rows.forall(_._3 >= 0L))
    assert(rows.map(_._3) === rows.map(_._3).sorted)
  }

  test("IVF-PQ: local replay matches probe+residual+encode+ADC") {
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding",
      coarseStride = 100, coarseIters = 1, numSub = 4, subDim = 16,
      pqStride = 50, pqIters = 1)
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding", model,
      0L, 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (2 to 5).map(r.getLong).toList, r.getLong(6))).toSeq
    // independent local replay over the trained model (exact Longs;
    // the two rounded divisions replayed via the BigDecimal HALF_UP
    // twin of both engines' ROUND)
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.floor(x.toDouble * 1000).toLong) }.toMap
    def sqD(a: Array[Long], c: Array[Long]): Long =
      a.indices.map { i => val d = 1000L * a(i) - c(i); d * d }.sum
    def coarseCell(g: Array[Long]): Long =
      model.coarse.cells.indices
        .map(i => (sqD(g, model.coarse.cents(i)), model.coarse.cells(i)))
        .min._2
    def residual(g: Array[Long]): Array[Long] = {
      val ci = model.coarse.cells.indexOf(coarseCell(g))
      val cv = model.coarse.cents(ci)
      Array.tabulate(g.length)(i =>
        BigDecimal((1000L * g(i) - cv(i)) / 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    def codes(rq: Array[Long]): List[Long] =
      (0 until 4).map { m =>
        val sub = rq.slice(m * 16, (m + 1) * 16)
        val b = model.pq.codebooks(m)
        b.cells.indices.map(i => (sqD(sub, b.cents(i)), b.cells(i))).min._2
      }.toList
    val q0 = vecs(0L)
    val probed = model.coarse.cells.indices
      .map(i => (sqD(q0, model.coarse.cents(i)), model.coarse.cells(i)))
      .sorted.take(2).map(_._2)
    val tables = probed.map { cell =>
      val ci = model.coarse.cells.indexOf(cell)
      val cv = model.coarse.cents(ci)
      val rq = Array.tabulate(q0.length)(i =>
        BigDecimal((1000L * q0(i) - cv(i)) / 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      cell -> (0 until 4).map { m =>
        val sub = rq.slice(m * 16, (m + 1) * 16)
        val b = model.pq.codebooks(m)
        b.cells.indices.map(i => b.cells(i) -> sqD(sub, b.cents(i))).toMap
      }
    }.toMap
    val local = vecs.toSeq
      .filter { case (id, g) => id != 0L && probed.contains(coarseCell(g)) }
      .map { case (id, g) =>
        val cell = coarseCell(g)
        val cs = codes(residual(g))
        val adc = cs.zipWithIndex.map { case (c, m) => tables(cell)(m)(c) }.sum
        (id, cell, cs, adc)
      }.sortBy(r => (r._4, r._1)).take(10)
    assert(got === local)
    // the prune is real: every candidate lives in a probed cell
    assert(got.map(_._2).toSet.subsetOf(probed.toSet))
    assert(got.nonEmpty)
  }

  test("sign-LSH recalls every planted near-duplicate, no false positives") {
    // planted corpus: 200 deterministic pseudo-random 64-dim vectors,
    // ids 1000+i are tiny perturbations of i → cosine ≈ 0.999
    def lcg(seed: Long): Iterator[Double] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
        .map(s => ((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5).drop(1)
    val base = (0 until 200).map { i =>
      (i.toLong, lcg(i * 7919L + 13).take(64).toArray)
    }
    val planted = base.take(50).map { case (id, v) =>
      val noise = lcg(id * 104729L + 7).take(64).toArray
      (id + 1000L, v.zip(noise).map { case (x, e) => x + 0.01 * e })
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val truth = Similarity.cosinePairs(df, "vec_id", "embedding",
        lit(0), 0.95)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(truth.size === 50, s"expected the 50 planted pairs, got ${truth.size}")
    val got = Similarity.signLshPairs(df, "vec_id", "embedding",
        minCosine = 0.95)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // SRP S-curve at cos 0.999 with 8x8-bit bands: P(miss) ≈ 2e-8
    assert(got === truth,
      s"missed=${(truth -- got).size} extra=${(got -- truth).size}")
  }

  test("IVF search plans zero exchanges: assignment is a projection") {
    // the round-4 assign was crossJoin(broadcast)+groupBy arg-max — a
    // full shuffle of every vector per call; the literal-centroid
    // arg-max must plan scan → project → filter → top-k with NO
    // exchange anywhere (top-k is TakeOrderedAndProject, driver-merged)
    val df = Similarity.ivfTopK(emb, "vec_id", "embedding",
      seedStride = 251, queryId = 0L, k = 10)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"IVF plan shuffles:\n$plan")
  }

  test("IVF top-k sims are bounded by the exact top-1 and non-empty") {
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        seedStride = 251, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(ivf.nonEmpty && ivf.size <= 10)
    val bestExact = localTop.head._2
    assert(ivf.forall(_._2 <= bestExact + 1e-9))
  }

  // deterministic pseudo-random stream shared by the planted-data tests
  private def lcgStream(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5).drop(1)

  test("k-means centroids converge to pure planted clusters") {
    // 4 well-separated cluster directions in 16 dims, 50 members each:
    // member = direction + small noise → cosine(member, direction) ≈ 1
    val dirs = (0 until 4).map { c =>
      val v = new Array[Double](16)
      v(c * 4) = 1.0; v(c * 4 + 1) = 0.7
      v
    }
    val rows = for (c <- 0 until 4; m <- 0 until 50) yield {
      val noise = lcgStream(c * 1000L + m * 17 + 5).take(16).toArray
      ((c * 50 + m).toLong, c,
        dirs(c).zip(noise).map { case (x, e) => x + 0.12 * e })
    }
    val df = rows.toDF("vec_id", "truth", "embedding")
    // stride 50 seeds one member per planted cluster (ids c*50+m)
    val centroids = Similarity.kmeansCentroids(
      df, "vec_id", "embedding", seedStride = 50, iters = 3)
    // assignment under the trained centroids must be cluster-pure:
    // every truth-cluster maps to exactly one centroid cell
    val assigned = df.crossJoin(broadcast(centroids))
      .select($"vec_id", $"truth", $"cell",
        Similarity.cosine(Similarity.toDouble($"embedding"), $"cv").as("c"))
      .groupBy($"vec_id", $"truth")
      .agg(max_by($"cell", $"c").as("cell"))
    val purity = assigned.groupBy("truth")
      .agg(countDistinct($"cell").as("cells"))
      .collect()
    purity.foreach(r => assert(r.getLong(1) === 1L,
      s"cluster ${r.get(0)} split over ${r.getLong(1)} cells"))
    // and distinct clusters get distinct centroids
    assert(assigned.select("cell").distinct().count() === 4)
  }

  test("IVF failure modes are explicit errors, not analysis mysteries") {
    val df = (0L until 10L).map { i =>
      (i, Array.fill(4)(1.0 + i))
    }.toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("cell", "cv")
    // missing query id → IllegalArgumentException naming the id
    val missing = intercept[IllegalArgumentException] {
      Similarity.ivfTopKWith(df, "vec_id", "embedding", cents,
        queryId = 999L, k = 3)
    }
    assert(missing.getMessage.contains("999"))
    // empty centroid set → explicit require, not NullType analysis error
    val empty = intercept[IllegalArgumentException] {
      Similarity.ivfTopKWith(df, "vec_id", "embedding",
        cents.filter($"cell" < 0), queryId = 0L, k = 3)
    }
    assert(empty.getMessage.contains("centroid"))
    // all-zero centroids are dropped by unitNorm → same explicit error
    val zeros = intercept[IllegalArgumentException] {
      Similarity.ivfTopKWith(df, "vec_id", "embedding",
        Seq((0L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("cell", "cv"),
        queryId = 0L, k = 3)
    }
    assert(zeros.getMessage.contains("non-zero"))
  }

  test("zero-norm centroid is dropped, not scored at dot=0") {
    // one zero centroid + one real one: every vector must land in the
    // real cell (oracle engines NaN on cosine-vs-zero; we never ask)
    val df = (0L until 8L).map(i => (i, Array(1.0, 0.5, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((7L, Seq(0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.4, 0.0, 0.0))).toDF("cell", "cv")
    val got = Similarity.ivfTopKWith(df, "vec_id", "embedding", cents,
        queryId = 0L, k = 10, nProbe = 2)
      .as[(Long, Double)].collect()
    assert(got.length === 7, "all non-query vectors live in the real cell")
  }

  test("data-proportional centroid sets are rejected at MaxPlanCentroids") {
    val df = (0L until 4L).map(i => (i, Array(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val tooMany = (0L until (Similarity.MaxPlanCentroids + 1).toLong)
      .map(i => (i, Seq(1.0, i.toDouble))).toDF("cell", "cv")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopKWith(df, "vec_id", "embedding", tooMany,
        queryId = 0L, k = 3)
    }
    assert(err.getMessage.contains("MaxPlanCentroids"))
  }

  test("multi-probe IVF recalls the exact top-k on clustered data") {
    val dirs = (0 until 4).map { c =>
      val v = new Array[Double](16); v(c * 4) = 1.0; v
    }
    val rows = for (c <- 0 until 4; m <- 0 until 50) yield {
      val noise = lcgStream(c * 777L + m * 31 + 3).take(16).toArray
      ((c * 50 + m).toLong,
        dirs(c).zip(noise).map { case (x, e) => x + 0.15 * e })
    }
    val df = rows.toDF("vec_id", "embedding")
    val centroids = Similarity.kmeansCentroids(
      df, "vec_id", "embedding", seedStride = 50, iters = 2)
    val ivf2 = Similarity.ivfTopKWith(df, "vec_id", "embedding",
        centroids, queryId = 0L, k = 5, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(
        df.filter($"vec_id" =!= 0), "vec_id", "embedding",
        df.filter($"vec_id" === 0), "embedding", 5)
      .as[(Long, Double)].collect().toSeq
    // query 0 lives deep inside cluster 0: its true top-5 share the
    // cluster, so probing its top cells must recover the exact answer
    assert(ivf2.toSet === brute.toSet,
      s"ivf=$ivf2 vs brute=$brute")
  }

  test("int8 quantization: error bounded by half a step, zero vecs counted") {
    val d = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(-2.0f, 1.99f, 0.001f, -1.0f), 1),
      (4L, Array.empty[Float], 0)).toDF(
      "vec_id", "embedding", "label")
    val got = Similarity.quantizationReport(d, "embedding", "label")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(0)._1 === 3L)
    assert(got(0)._2 === 2L,
      "zero AND empty vectors counted degenerate, not NaN/Inf/crash")
    assert(got(1)._2 === 0L)
    // symmetric int8: reconstruction error <= (m/127)/2 per element
    assert(got(0)._4 <= 1.0 / 254 + 1e-12)
    assert(got(1)._4 <= 2.0 / 254 + 1e-12)
    assert(got(0)._3 >= 0.0 && got(1)._3 > 0.0, "real error, not zero")
    // fixture-wide: every label's max_err respects the half-step bound
    // for the largest component magnitude in the corpus
    val embs = Tables.load(spark, sf0001, "embeddings")
    val mGlobal = embs.select(
        max(array_max(transform(Similarity.toDouble($"embedding"),
          x => abs(x))))).as[Double].head()
    val worst = Similarity.quantizationReport(embs, "embedding", "label")
      .select(max($"max_err")).as[Double].head()
    assert(worst <= mGlobal / 254 + 1e-12,
      s"max_err $worst exceeds half-step bound ${mGlobal / 254}")
  }

  test("centroid confusion: totals preserved, planted clusters fully diagonal") {
    // planted: three tight clusters, labels match the clusters → the
    // confusion matrix must be exactly diagonal with the cluster sizes
    val dim = 8
    def vec(center: Int, j: Int): Seq[Float] =
      Seq.tabulate(dim)(d =>
        (if (d == center) 10f else 0f) + 0.01f * ((j + d) % 3))
    val planted = (0 until 30).map { j =>
      val c = j % 3
      (j.toLong, vec(c, j), c)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidConfusion(planted, "vec_id", "embedding",
        "label")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 10L), (1L, 1L, 10L), (2L, 2L, 10L)))
    // fixture: one row per vector overall, preds drawn from real labels
    val embs = Tables.load(spark, sf0001, "embeddings")
    val conf = Similarity.centroidConfusion(embs, "vec_id", "embedding",
      "label").cache()
    assert(conf.agg(sum($"n")).as[Long].head() === embs.count())
    val labels = embs.select($"label".cast("long")).distinct()
      .as[Long].collect().toSet
    assert(conf.select($"pred").distinct().as[Long].collect().toSet
      .subsetOf(labels))
    conf.unpersist()
  }

  test("batch brute top-k agrees with the single-query path per query") {
    val batch = Similarity.bruteTopKBatch(emb, "vec_id", "embedding",
        queryStride = 97, k = 10)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val qIds = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id").as[Long].collect().toSeq
    assert(batch.keySet === qIds.toSet)
    qIds.foreach { q =>
      val single = Similarity.bruteForceTopK(
          emb.filter($"vec_id" =!= q), "vec_id", "embedding",
          emb.filter($"vec_id" === q), "embedding", 10)
        .as[(Long, Double)].collect().toSet
      assert(batch(q) === single, s"batch != single for query $q")
    }
  }

  test("recall report: probing every cell recovers recall 1.0 exactly") {
    // seedStride 100 → 5 cells at 500 vectors; nProbe = 5 probes them
    // all, so IVF degenerates to brute force and recall must be exactly
    // 1.0 for every query — any miss is a ranking-determinism bug
    val rep = Similarity.annRecallReport(emb, "vec_id", "embedding",
        seedStride = 100, queryStride = 97, k = 10, nProbe = 5)
      .as[(Long, Long, Double)].collect()
    assert(rep.length === 6)
    assert(rep.forall { case (_, m, r) => m === 10L && r === 1.0 },
      rep.mkString(", "))
  }

  test("recall report bounds hold under a lossy single-probe config") {
    val rep = Similarity.annRecallReport(emb, "vec_id", "embedding",
        seedStride = 100, queryStride = 97, k = 10, nProbe = 1)
      .as[(Long, Long, Double)].collect()
    assert(rep.length === 6)
    rep.foreach { case (q, m, r) =>
      assert(m >= 0L && m <= 10L, s"query $q n_match $m out of range")
      assert(r === m / 10.0, s"query $q recall $r != n_match/k")
    }
  }

  test("truncation recall (x136): keeping every dimension recovers " +
      "recall 1.0 exactly; bounds hold under a real cut") {
    // mDims = 64 keeps the whole vector — truncated brute force IS
    // full brute force, so recall must be exactly 1.0 per query
    val full = Similarity.truncationRecallReport(emb, "vec_id",
        "embedding", queryStride = 97, k = 10, mDims = 64)
      .as[(Long, Long, Double)].collect()
    assert(full.length === 6)
    assert(full.forall { case (_, m, r) => m === 10L && r === 1.0 },
      full.mkString(", "))
    // a real 16-of-64 cut: one row per query, exact n/k arithmetic
    val cut = Similarity.truncationRecallReport(emb, "vec_id",
        "embedding", queryStride = 97, k = 10, mDims = 16)
      .as[(Long, Long, Double)].collect()
    assert(cut.length === 6)
    cut.foreach { case (q, m, r) =>
      assert(m >= 0L && m <= 10L, s"query $q n_match $m out of range")
      assert(r === m / 10.0, s"query $q recall $r != n_match/k")
    }
    // monotonicity sanity on the aggregate: the full-dim report can
    // never match fewer neighbors than the truncated one in total
    assert(full.map(_._2).sum >= cut.map(_._2).sum)
  }

  test("batch top-k ranks cut per partition before the exchange") {
    // the q_id-partitioned row_number cut must plan a WindowGroupLimit
    // (k rows kept per partition pre-shuffle — the x74 contract), and
    // the query fan-out must be a broadcast, never a shuffled cross
    val plan = Similarity.bruteTopKBatch(emb, "vec_id", "embedding",
        queryStride = 97, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "batch brute top-k lost the WindowGroupLimit partial top-k")
    assert(!plan.contains("CartesianProduct"),
      "batch brute top-k plans a CartesianProduct")
  }

  test("cluster-balanced sample: per-cell quota, closest-first, plan cut") {
    val got = graft.ops.Similarity.clusterBalancedSample(emb, "vec_id",
      "embedding", seedStride = 97, cap = 5).cache()
    // quota: no cell exceeds cap, ranks are dense 1..n(cell)
    val perCell = got.groupBy("cell")
      .agg(count(lit(1)).as("n"), max($"rnk").as("hi"),
        countDistinct($"rnk").as("d"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perCell.nonEmpty)
    perCell.foreach { case (cell, n, hi, d) =>
      assert(n <= 5 && hi === n && d === n, s"cell $cell: n=$n hi=$hi d=$d")
    }
    // closest-first: within a cell, a kept row's (sim, id) order beats
    // every dropped row of the same cell
    val all = graft.ops.Similarity.clusterBalancedSample(emb, "vec_id",
      "embedding", seedStride = 97, cap = Int.MaxValue)
    val dropped = all.join(got.select("vec_id"), Seq("vec_id"), "left_anti")
    val worstKept = got.groupBy(got("cell").as("c"))
      .agg(min(struct($"sim", -$"vec_id")).as("wk"))
    val beats = dropped.join(worstKept, dropped("cell") === $"c")
      .filter(struct(dropped("sim"), -dropped("vec_id")) > $"wk")
    assert(beats.count() === 0L, "a dropped row outranks a kept row")
    // the rank window must cut per partition before the exchange, and
    // assignment must stay a projection (no join, no cartesian)
    val plan = graft.ops.Similarity.clusterBalancedSample(emb, "vec_id",
      "embedding", 97, 5).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "cluster-balanced sample lost the WindowGroupLimit partial cut")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      "centroid assignment stopped being a plan-literal projection")
    // production path: trained k-means centroids, same laws
    val km = graft.ops.Similarity.kmeansCentroids(emb, "vec_id",
      "embedding", seedStride = 97, iters = 3)
    val kmGot = graft.ops.Similarity.clusterBalancedWith(emb, "vec_id",
      "embedding", km, cap = 5)
    val kmCells = kmGot.groupBy("cell").count()
      .as[(Long, Long)].collect()
    assert(kmCells.nonEmpty && kmCells.forall(_._2 <= 5L))
    got.unpersist()
  }

  test("semantic dedup: scaled copies collapse, orthogonals survive") {
    // v and 2v have cosine exactly 1 and identical SRP sign votes (the
    // projection is linear, positive scaling preserves every sign), so
    // they share a bucket and collapse; one-hot vectors on distinct
    // dims have cosine 0 < threshold and each stays its own rep even
    // if a bucket collides
    def oneHot(i: Int, s: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(i) = s; a
    }
    val vecs = Seq(
      (10L, oneHot(0, 1f)), (11L, oneHot(0, 2f)),
      (20L, oneHot(1, 1f)), (30L, oneHot(2, 3f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding", 0.35)
      .select($"vec_id", $"rep_id", $"is_rep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq((10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (30L, 30L, true)))
  }

  test("semantic dedup fixture laws: total, canonical, bucket-closed") {
    val dd = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.35)
      .cache()
    // total: one decision row per vector
    assert(dd.count() === emb.count())
    // canonical: rep is the component minimum, so rep_id <= vec_id and
    // is_rep exactly when a vector is its own rep; every rep_id refers
    // to a row that is itself a rep (the keep-set is closed)
    assert(dd.filter($"rep_id" > $"vec_id").count() === 0L)
    assert(dd.filter($"is_rep" =!= ($"vec_id" === $"rep_id")).count() === 0L)
    val reps = dd.filter($"is_rep").select($"vec_id".as("rep_id"))
    assert(dd.select("rep_id").distinct()
      .join(reps, Seq("rep_id"), "left_anti").count() === 0L,
      "a rep_id points at a non-rep row")
    // bucket-closed: edges only form within buckets, so every component
    // lives in exactly one bucket
    assert(dd.groupBy("rep_id")
      .agg(countDistinct($"bucket").as("nb"))
      .filter($"nb" > 1).count() === 0L)
    // it actually dedups the fixture's planted duplicates: some
    // non-rep rows must exist at this threshold
    assert(dd.filter(!$"is_rep").count() > 0L)
    dd.unpersist()
  }

  test("topPrincipalComponent: distributed S equals local, direction finds the dominant axis") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 40 vectors hugging axis 0 (alternating sign), small noise on the
    // other axes -> dominant second-moment direction is e0
    val dim = 4
    val vecs = (0 until 40).map { n =>
      val sign = if (n % 2 == 0) 1.0f else -1.0f
      (n.toLong, Array.tabulate(dim)(d =>
        if (d == 0) 0.8f * sign
        else 0.02f * ((n * 7 + d * 3) % 5 - 2)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val iters = 6; val scale = 1000L
    val got = graft.ops.Similarity.topPrincipalComponent(
        df, "vec_id", "embedding", iters, scale)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    // exactness: replay the SAME integer algorithm locally from the
    // grid floors -- pins the distributed aggregate == local S
    val grids = vecs.map(_._2.map(x => math.floor(x.toDouble * 1000).toLong))
    val sMat = Array.tabulate(dim, dim)((i, j) =>
      grids.map(g => g(i) * g(j)).sum)
    var v = Array.fill(dim)(scale)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => sMat(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = if (m == 0L) Array.fill(dim)(0L)
      else w.map(x => math.signum(x) *
        ((2L * scale * math.abs(x) + m) / (2L * m)))
    }
    assert(got === v.zipWithIndex.map { case (x, i) => i -> x }.toMap)
    // the direction is the dominant axis: |v0| = scale, others tiny
    assert(math.abs(got(0)) === scale)
    (1 until dim).foreach(d =>
      assert(math.abs(got(d)) < scale / 10, s"component $d too large"))
  }

  test("embeddingDriftReport (x119): pure-Scala recomputation of the " +
      "all-integer contract on a hand corpus") {
    // grid-exact coords (multiples of 0.001 are NOT float-exact; use
    // halves/quarters which are): the contract floors x*1000 anyway,
    // so recompute the grid in Scala with the same expression
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f)), (2L, Array(1.0f, 0.75f)),
      (3L, Array(-0.5f, 0.25f)), (4L, Array(0.25f, 0.5f)),
      (5L, Array(0.75f, -1.0f)), (6L, Array(-0.25f, -0.75f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.embeddingDriftReport(df, "vec_id", "embedding",
      rate = 0.5).collect().head
    // replicate the split predicate: md5 4-hex prefix < threshold
    val thr = graft.ops.Sampling.hexThreshold(0.5)
    def side(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 4)
      if (hex < thr) 0 else 1
    }
    def grid(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000).toLong)
    val bySide = vecs.groupBy(v => side(v._1))
    assert(bySide.keySet === Set(0, 1), "fixture ids must split 2-ways")
    val sa = bySide(0).map(v => grid(v._2)).transpose.map(_.sum)
    val sb = bySide(1).map(v => grid(v._2)).transpose.map(_.sum)
    val (nA, nB) = (bySide(0).size.toLong, bySide(1).size.toLong)
    val dot = sa.zip(sb).map { case (x, y) => x * y }.sum
    val naSq = sa.map(x => x * x).sum
    val nbSq = sb.map(x => x * x).sum
    val msq = sa.zip(sb).map { case (x, y) =>
      val d = BigDecimal(x * nB - y * nA); d * d }.sum
    assert(got.getLong(0) === nA && got.getLong(1) === nB)
    assert(got.getLong(2) === dot)
    assert(got.getLong(3) === naSq && got.getLong(4) === nbSq)
    // r14: mean_shift_sq publishes BIGINT (the precision-38 decimal
    // was the r13 driver-divergent surface)
    assert(BigDecimal(got.getLong(5)) === msq)
    // the r13 portable-quantize contract: BIGINT micros via
    // FLOOR(x·10⁶ + 0.5), never an engine ROUND on a raw double
    val cosRaw =
      dot.toDouble / (math.sqrt(naSq.toDouble) * math.sqrt(nbSq.toDouble))
    val msRaw = math.sqrt(msq.toDouble) / (nA.toDouble * nB.toDouble)
    assert(got.getLong(6) ===
      math.floor(cosRaw * 1000000.0 + 0.5).toLong)
    assert(got.getLong(7) ===
      math.floor(msRaw * 1000000.0 + 0.5).toLong)
  }

  test("normSpectrum (x159): unit vector lands at q=10000/bucket 14, " +
      "the zero vector in bucket 0, a 2-norm vector in bucket 16") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f), 0),
      (3L, Seq(2.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.normSpectrum(vecs, "embedding",
        "label")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0, 14L, 1L, 10000L), // 10000 is 14 binary digits
      (0, 0L, 1L, 0L),
      (1, 16L, 1L, 40000L))) // 2^15 <= 40000 < 2^16
    // fixture: every vector lands in exactly one bucket; totals match
    val fx = graft.ops.Similarity.normSpectrum(
      Tables.load(spark, sf0001, "embeddings"), "embedding", "label")
    val n = fx.agg(org.apache.spark.sql.functions.sum($"n_vecs"))
      .as[Long].head()
    assert(n === Tables.load(spark, sf0001, "embeddings").count())
  }

  test("annMarginReport (x166): hand vectors — exact top-2 ranks, id " +
      "tie-break, and integer milli margins") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.6f, 0.8f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.annMarginReport(vecs, "vec_id",
        "embedding", sampleRate = 1.0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      // q1: v4 is an exact dup (sim 1.0), then v2 at 0.6
      (1L, 4L, 2L, 400L),
      // q2: v3 at 0.8; v1 and v4 tie at 0.6 -> id 1 wins rank 2
      (2L, 3L, 1L, 200L),
      // q3: v2 at 0.8; v1/v4 tie at 0.0 -> id 1
      (3L, 2L, 1L, 800L),
      (4L, 1L, 2L, 400L)))
  }

  test("knnLabelPurity (x170): hand vectors — exact match counts and " +
      "floor-division purity at k = 2") {
    import spark.implicits._
    // labels: 1,4 -> 0; 2,3 -> 1. Neighbors by cosine:
    // q1 top2 = v4 (1.0, label 0), v2 (0.6, label 1) -> 1 match
    // q2 top2 = v3 (0.8, 1), v1 (0.6, 0)             -> 1 match
    // q3 top2 = v2 (0.8, 1), v1 (0.0, 0)             -> 1 match
    // q4 top2 = v1 (1.0, 0), v2 (0.6, 1)             -> 1 match
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.6f, 0.8f), 1),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.knnLabelPurity(vecs, "vec_id",
        "embedding", "label", k = 2, sampleRate = 1.0)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0, 1L, 500000L), (2L, 1, 1L, 500000L),
      (3L, 1, 1L, 500000L), (4L, 0, 1L, 500000L)))
  }

  test("labelProfile (x189): exact balance shares and mean quantized " +
      "squared norm per label") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(3.0f, 4.0f), 0),  // normsq 25 -> q 250000
      (2L, Seq(1.0f, 0.0f), 0),  // q 10000
      (3L, Seq(0.0f, 2.0f), 1))  // q 40000
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.labelProfile(vecs, "embedding",
        "label").as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0, 2L, 666666L, 130000L),
      (1, 1L, 333333L, 40000L)))
  }
}
