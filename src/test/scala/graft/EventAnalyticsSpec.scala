package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("retentionCohorts (x130): hand corpus matrix, day-0 row equals " +
      "cohort size, multi-event days count once") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 joins day 1, active days 1,2,4 (twice on day 2 — counts once)
    // u2 joins day 1, active days 1,4
    // u3 joins day 2, active days 2,3
    // u4 joins day 3, active day 3 only
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 21:00:00")), (1L, ts("2024-01-04 07:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-04 11:00:00")),
      (3L, ts("2024-01-02 12:00:00")), (3L, ts("2024-01-03 13:00:00")),
      (4L, ts("2024-01-03 14:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .as[(Timestamp, Long, Long)].collect().toSet
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (d("2024-01-01"), 0L, 2L), // u1, u2
      (d("2024-01-01"), 1L, 1L), // u1
      (d("2024-01-01"), 3L, 2L), // u1, u2
      (d("2024-01-02"), 0L, 1L), // u3
      (d("2024-01-02"), 1L, 1L), // u3
      (d("2024-01-03"), 0L, 1L))) // u4
    // law: every cohort's day-0 count equals its cohort size
    val day0 = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    val sizes = Map(d("2024-01-01") -> 2L, d("2024-01-02") -> 1L,
      d("2024-01-03") -> 1L)
    assert(day0 === sizes)
  }

  test("retentionCohorts fixture sanity: day-0 user total equals " +
      "distinct users; offsets non-negative") {
    val events = Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .as[(Timestamp, Long, Long)].collect()
    val nUsers = events.select(countDistinct($"user_id"))
      .as[Long].head()
    assert(got.filter(_._2 == 0L).map(_._3).sum === nUsers)
    assert(got.forall(_._2 >= 0L))
    assert(got.forall(_._3 >= 1L))
  }
}
