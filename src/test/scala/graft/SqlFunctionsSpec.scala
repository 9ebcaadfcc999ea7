package graft

/** The native expressions are reachable from SQL after registration
  * (GraftExtensions), and agree with their DataFrame-API twins.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  size(minhash_sig(array('a','b'), 16)) AS mh_len,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  set_jaccard(array('a','b'), array('b','c')) AS sj
        |""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getInt(1) === 16)
    assert(row.getDouble(2) === 11.0)
    assert(row.getDouble(3) === (1.0 / 3.0))
  }

  test("registered SQL aggregates and srp_signature evaluate") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  srp_signature(array(1.0D, -2.0D, 0.5D)) AS srp,
        |  srp_signature(array(1.0D, -2.0D, 0.5D), 7) AS srp7
        |""".stripMargin).head()
    assert(row.getLong(0) != row.getLong(1), "seed must change the signature")
    val agg = spark.sql(
      """SELECT g,
        |  size(minhash_agg(tok, 16)) AS mh,
        |  vector_sum(v) AS vs
        |FROM VALUES
        |  (1, array('a','b'), array(1.0D, 2.0D)),
        |  (1, array('b','c'), array(3.0D, 4.0D)),
        |  (2, array('d'),     array(5.0D, 6.0D))
        |AS t(g, tok, v) GROUP BY g ORDER BY g
        |""".stripMargin).collect()
    assert(agg(0).getInt(1) === 16)
    assert(agg(0).getSeq[Double](2) === Seq(4.0, 6.0))
    assert(agg(1).getSeq[Double](2) === Seq(5.0, 6.0))
    val more = spark.sql(
      """SELECT sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS sa,
        |  (SELECT pair_count(v) FROM VALUES (1), (2), (2), (3) AS t(v)) AS pc
        |""".stripMargin).head()
    assert(more.getDouble(0) === 0.5)
    assert(more.getLong(1) === 5L) // C(4,2)=6 minus one tied pair
  }

  test("doc_freq keeps the exact df while capping the id list") {
    GraftExtensions.register(spark)
    // group 'a' has 4 distinct ids but cap=2: df stays exact, ids stop
    // at 2 entries; group 'b' is under the cap → complete list.
    // repartition forces partial buffers through merge + serde.
    val rows = spark.sql(
      """SELECT g, doc_freq(id, 2) AS f FROM (
        |  SELECT /*+ REPARTITION(4) */ * FROM VALUES
        |    (1L,'a'), (2L,'a'), (3L,'a'), (4L,'a'), (5L,'b')
        |  AS t(id, g)) GROUP BY g ORDER BY g
        |""".stripMargin).collect()
    val a = rows(0).getStruct(1)
    assert(a.getLong(0) === 4L && a.getSeq[Long](1).length === 2)
    assert(a.getSeq[Long](1).forall(Set(1L, 2L, 3L, 4L)))
    val b = rows(1).getStruct(1)
    assert(b.getLong(0) === 1L && b.getSeq[Long](1) === Seq(5L))
  }

  test("min_ids returns the n smallest ids sorted, under any partitioning") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    // fixture-driven reference: min_ids(doc_id, 3) per source must equal
    // the sorted-ascending prefix of each source's full id list, and df
    // the exact count — across partitionings (merge + serde paths)
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"))
    val expected = docs.collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        val ids = rs.map(_.getLong(1)).sorted
        s -> ((ids.length.toLong, ids.take(3).toSeq))
      }
    for (parts <- Seq(1, 7)) {
      val got = docs.repartition(parts)
        .groupBy("source")
        .agg(graft.functions.DocFreqFunctions.minIds(col("doc_id"), 3)
          .as("m"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getStruct(1).getLong(0), r.getStruct(1).getSeq[Long](1))))
        .toMap
      assert(got === expected, s"parts=$parts")
    }
    // SQL surface + arity error
    val viaSql = spark.sql(
      """SELECT min_ids(id, 2) AS m FROM VALUES
        |  (9L), (1L), (5L), (3L) AS t(id)
        |""".stripMargin).head().getStruct(0)
    assert(viaSql.getLong(0) === 4L)
    assert(viaSql.getSeq[Long](1) === Seq(1L, 3L))
    val err = intercept[Exception] { spark.sql("SELECT min_ids(1)") }
    assert(err.getMessage.contains("min_ids"))
  }

  test("simhash_agg(group) equals simhash64 of the concatenated group") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    // repartition so groups span partitions: partial aggregation, merge
    // and serialize/deserialize of the vote buffer all execute
    val docs = Tables.load(spark, sf0001, "documents").limit(200)
      .select(col("source").as("g"), split(col("text"), " ", -1).as("tok"))
      .repartition(8)
    val viaAgg = docs.groupBy("g")
      .agg(expr("simhash_agg(tok)").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // documented invariant: votes commute, so the group sketch equals
    // simhash64 of any concatenation of the group's arrays
    val viaConcat = docs.groupBy("g")
      .agg(flatten(collect_list("tok")).as("all_tok"))
      .selectExpr("g", "simhash64(all_tok) AS s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaConcat)
    assert(viaAgg.nonEmpty)
  }

  test("wrong arity raises IllegalArgumentException, not NoSuchElement") {
    GraftExtensions.register(spark)
    def analyzedFailure(sql: String): Throwable = {
      val t = intercept[Throwable](spark.sql(sql).collect())
      // walk to the root cause: the analyzer may wrap our exception
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .find(_.isInstanceOf[IllegalArgumentException])
        .getOrElse(t)
    }
    assert(analyzedFailure("SELECT simhash_agg() FROM VALUES (1) t(v)")
      .getMessage.contains("simhash_agg expects"))
    assert(analyzedFailure(
      "SELECT simhash_agg(tok, 16) FROM VALUES (array('a')) t(tok)")
      .getMessage.contains("simhash_agg expects"))
    assert(analyzedFailure("SELECT simhash64() ")
      .getMessage.contains("simhash64 expects"))
    assert(analyzedFailure("SELECT dot_product(array(1.0D))")
      .getMessage.contains("dot_product expects"))
    assert(analyzedFailure("SELECT ngram_hashes(array('a'))")
      .getMessage.contains("ngram_hashes expects"))
    // literal scalar params: a column or NULL argument must die as a
    // clean analysis error, not an NPE/ClassCast from the eager eval
    assert(analyzedFailure(
      "SELECT ngram_hashes(array('a'), v) FROM VALUES (1) t(v)")
      .getMessage.contains("must be a literal"))
    assert(analyzedFailure("SELECT ngram_hashes(array('a'), 2, NULL)")
      .getMessage.contains("must not be NULL"))
    assert(analyzedFailure(
      "SELECT minhash_sig(array('a'), v) FROM VALUES (1) t(v)")
      .getMessage.contains("must be a literal"))
  }

  test("SQL ngram_hashes equals DataFrame-API ngramHashes") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sf0001, "documents").limit(50)
      .select(split(col("text"), " ", -1).as("tok"))
    val viaSql = df.selectExpr("ngram_hashes(tok, 3) AS h")
      .collect().map(_.getSeq[Long](0))
    val viaApi = df.select(
        graft.functions.HashFunctions.ngramHashes(col("tok"), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.exists(_.nonEmpty))
    // keepPartial third arg: sub-n docs yield exactly one clipped gram
    val kp = spark.sql(
      "SELECT ngram_hashes(array('a','b'), 5, true) AS h")
      .collect().head.getSeq[Long](0)
    assert(kp.length === 1)
  }

  test("SQL simhash64 equals DataFrame-API simhash64") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sf0001, "documents").limit(50)
      .select(split(col("text"), " ", -1).as("tok"))
    val viaSql = df.selectExpr("simhash64(tok) AS s").collect().map(_.getLong(0))
    val viaApi = df.select(
      graft.functions.HashFunctions.simhash64(col("tok")).as("s"))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("SQL portable kernels equal their DataFrame-API twins") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sf0001, "documents").limit(50)
      .select(split(col("text"), " ", -1).as("tok"))
    val viaSql = df.selectExpr(
        "portable_minhash_sig(tok, 8) AS mh",
        "portable_simhash32(tok) AS sh")
      .collect().map(r => (r.getSeq[String](0), r.getLong(1)))
    val viaApi = df.select(
        graft.functions.PortableMinHashFunctions
          .portableMinhashSig(col("tok"), 8).as("mh"),
        graft.functions.PortableMinHashFunctions
          .portableSimhash32(col("tok")).as("sh"))
      .collect().map(r => (r.getSeq[String](0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
    val srp = spark.sql(
      """SELECT portable_srp_sig(array(1000L, -2000L, 500L), 8, 3) AS s
        |""".stripMargin).head().getLong(0)
    val srpApi = spark.range(1).select(
      graft.functions.PortableMinHashFunctions.portableSrpSig(
        typedlit(Seq(1000L, -2000L, 500L)), 8, 3).as("s"))
      .head().getLong(0)
    assert(srp === srpApi)
    val scrub = spark.sql(
      """SELECT scrub_tokens(array('a','b','c','d','e'),
        |                    array(1L), 2) AS s
        |""".stripMargin).head().getStruct(0)
    assert(scrub.getLong(0) === 2L)      // positions 1,2 covered
    assert(scrub.getString(1) === "a d e")
  }

  test("SQL scrub_tokens sorts unsorted starts (kernel needs ascending)") {
    GraftExtensions.register(spark)
    // starts deliberately DESCENDING: the registration must sort before
    // the two-pointer kernel, or the scrub silently under-covers
    val scrub = spark.sql(
      """SELECT scrub_tokens(array('a','b','c','d','e','f'),
        |                    array(4L, 0L), 2) AS s
        |""".stripMargin).head().getStruct(0)
    assert(scrub.getLong(0) === 4L)      // positions 0,1 and 4,5 covered
    assert(scrub.getString(1) === "c d")
  }

  test("SQL ws_tokens / fold_tokens match the TextAnalysis columns") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT ws_tokens(' (Héllo),\tWORLD  x9! ') AS ws,
        |       fold_tokens(ws_tokens(' (Héllo),\tWORLD  x9! ')) AS f
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("(Héllo),", "WORLD", "x9!"))
    assert(row.getSeq[String](1) === Seq("héllo", "world", "x9"))
  }
}
