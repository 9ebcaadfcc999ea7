package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark has no native node for —
  * composed Spark-first (preference (a) of the custom-operator ladder:
  * built-ins before custom plans): union both sides with a side marker,
  * run one `last(_, ignoreNulls)` window per key over (time, marker),
  * keep the left rows. One shuffle on the key, no range join, no
  * broadcast — the standard scalable formulation (each key's timeline is
  * processed in a single sorted pass, so a 100 TB event stream asof-joins
  * a reference feed at sort-shuffle cost).
  *
  * Right rows sort before left rows at equal time (marker 0 < 1), so a
  * left row at time t matches right rows with time ≤ t. `rightOrder`
  * breaks ties among right rows sharing a timestamp deterministically
  * (the later `rightOrder` wins, matching "most recent").
  *
  * Requirements: `keyCols ⊆ left.columns`; right contains `keyCols`,
  * `timeCol`, `rightOrder`, `payloadCols`; payload names must not clash
  * with left column names (alias beforehand).
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, rightOrder: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val ordType = right.schema(rightOrder).dataType
    val l = left.select(
      leftCols.map(col) ++ Seq(
        col(timeCol).as("_asof_t"), lit(1).as("_asof_side"),
        lit(null).cast(ordType).as("_asof_ord")) ++
        payloadCols.map(p =>
          lit(null).cast(right.schema(p).dataType).as(s"_asof_$p")): _*)
    val r = right.select(
      leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(timeCol).as("_asof_t"), lit(0).as("_asof_side"),
        col(rightOrder).as("_asof_ord")) ++
        payloadCols.map(p => col(p).as(s"_asof_$p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_side"), col("_asof_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select(leftCols.map(col) ++ Seq(col("_asof_side")) ++
        payloadCols.map(p =>
          last(col(s"_asof_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("_asof_side") === 1)
      .drop("_asof_side")
  }

  /** Forward as-of join: each left row matches the NEAREST right row
    * with `right.time >= left.time` (inclusive), optionally only within
    * `toleranceOn` time units. Same single-shuffle union+window shape as
    * [[asofBackward]], traversed in descending time so the carried
    * right row is the earliest one at-or-after the left row; among
    * right rows sharing a timestamp the smallest `rightOrder` wins.
    *
    * For tolerance, `timeCol` must be numeric (convert timestamps to
    * epoch micros first) — the bound is `right.time - left.time <=
    * toleranceOn`, and out-of-tolerance matches null out (left-join
    * semantics preserved).
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, rightOrder: String,
      payloadCols: Seq[String], toleranceOn: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val ordType = right.schema(rightOrder).dataType
    val tType = right.schema(timeCol).dataType
    val l = left.select(
      leftCols.map(col) ++ Seq(
        col(timeCol).as("_asof_t"), lit(1).as("_asof_side"),
        lit(null).cast(ordType).as("_asof_ord"),
        lit(null).cast(tType).as("_asof_rt")) ++
        payloadCols.map(p =>
          lit(null).cast(right.schema(p).dataType).as(s"_asof_$p")): _*)
    val r = right.select(
      leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(timeCol).as("_asof_t"), lit(0).as("_asof_side"),
        col(rightOrder).as("_asof_ord"),
        col(timeCol).as("_asof_rt")) ++
        payloadCols.map(p => col(p).as(s"_asof_$p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_t").desc, col("_asof_side").asc,
        col("_asof_ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.union(r)
      .select(leftCols.map(col) ++ Seq(
        col("_asof_side"), col("_asof_t"),
        last(col("_asof_rt"), ignoreNulls = true).over(w).as("_asof_rt")) ++
        payloadCols.map(p =>
          last(col(s"_asof_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("_asof_side") === 1)
    val bounded = toleranceOn match {
      case None => carried
      case Some(tol) =>
        val inTol = col("_asof_rt").isNotNull &&
          (col("_asof_rt") - col("_asof_t")) <= tol
        carried.select(leftCols.map(col) ++ Seq(col("_asof_side")) ++
          payloadCols.map(p => when(inTol, col(p)).as(p)): _*)
    }
    bounded.drop("_asof_side", "_asof_t", "_asof_rt")
  }
}
