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
}
