package graft

/** t1 smoke (SURVEY.md §5): every declared query runs at sf0.001 and is
  * non-empty except the ones whose fixture-dependent result is legitimately
  * empty (anti-join / HAVING>1 on a dup-free fixture).
  */
class SmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("q6a_anti_join", "q19d_dup_groups")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
