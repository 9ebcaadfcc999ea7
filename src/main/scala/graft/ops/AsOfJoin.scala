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
}
