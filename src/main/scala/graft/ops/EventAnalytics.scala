package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table — the classic
  * product-analytics reports, built from the same keyed-aggregate
  * primitives as the curation ops (the reference has no event
  * semantics; this extends the declared surface like q20/q25 do).
  */
object EventAnalytics {

  /** Retention cohort matrix — the standard growth-analytics artifact:
    * users are grouped into a COHORT by the calendar day of their
    * first event, and the report counts, for each (cohort day, day
    * offset), how many of that cohort's users were active `offset`
    * days after joining. Row (c, 0) is the cohort's size by
    * construction (every user is active on their first day), and each
    * cohort's row series is non-increasing in unique users only if
    * activity is; the matrix itself makes no smoothing assumptions.
    *
    * Determinism: pure date arithmetic on exact values — `date_trunc`
    * day truncation, `datediff` integer day difference; counts are
    * exact BIGINTs. No FP anywhere. The cohort day publishes as a
    * TIMESTAMP (midnight), not a DATE — the repo's proven-portable
    * publishing convention (q15/q20/x53 precedent; the driver's
    * compare stack renders DATE differently per engine, and
    * PublishedTypeSpec bans it).
    *
    * Scale: (1) one user-keyed aggregate for the first-day table
    * (user-sized result), (2) one distinct over (user, day) — both
    * map-side combinable, shuffling id+date rows only; (3) the
    * activity⋈first join is a co-partitioned equi-join on the user
    * key (both sides just shuffled on it — at 1000 executors this is
    * the textbook co-located join, no broadcast needed and no text
    * ever moves); (4) the final (cohort, offset) aggregate is
    * calendar-bounded (days × days), tiny at any corpus size.
    *
    * Returns `(cohort_date TIMESTAMP, day_offset BIGINT,
    * n_users BIGINT)`.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol).as("_u"))
      .agg(min(date_trunc("day", col(tsCol))).as("cohort_date"))
    val activity = events
      .select(col(userCol).as("_u"),
        date_trunc("day", col(tsCol)).as("_d"))
      .distinct()
    activity.join(first, "_u")
      .groupBy(col("cohort_date"),
        datediff(col("_d"), col("cohort_date")).cast(LongType)
          .as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
