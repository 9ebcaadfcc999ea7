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

  test("funnelReport (x135): hand corpus — ordered completion only, " +
      "strictly-after semantics, exact conversion micros") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 completes A -> B -> C in order
    // u2 does B before A, A, then nothing: reaches A only (its B
    //    precedes its first A — strictly-after excludes it)
    // u3 completes A then B at a LATER ts; its C predates B: reaches B
    // u4 never does A: contributes to no step
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), "A"),
      (1L, ts("2024-01-01 09:00:00"), "B"),
      (1L, ts("2024-01-01 10:00:00"), "C"),
      (2L, ts("2024-01-02 07:00:00"), "B"),
      (2L, ts("2024-01-02 08:00:00"), "A"),
      (3L, ts("2024-01-03 08:00:00"), "A"),
      (3L, ts("2024-01-03 08:30:00"), "C"),
      (3L, ts("2024-01-03 09:00:00"), "B"),
      (4L, ts("2024-01-04 08:00:00"), "B"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelReport(events, "user_id", "ts",
      "event_type", Seq("A", "B", "C"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, "A", 3L, 1000000L, 1000000L),
      (2L, "B", 2L, 666666L, 666666L), // 2*1e6 div 3, floored
      (3L, "C", 1L, 500000L, 333333L)))
  }

  test("funnelReport: empty first step publishes zero counts and " +
      "zero downstream conversions; step-1 identity convention") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq((1L, ts("2024-01-01 08:00:00"), "B"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelReport(events, "user_id", "ts",
      "event_type", Seq("A", "B"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, "A", 0L, 1000000L, 1000000L),
      (2L, "B", 0L, 0L, 0L)))
  }

  test("funnelReport fixture sanity: counts non-increasing along the " +
      "funnel and bounded by distinct users") {
    val events = Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.funnelReport(events, "user_id", "ts",
      "event_type", Seq("signup", "view", "click", "purchase"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    val nUsers = events.select(countDistinct($"user_id")).as[Long].head()
    assert(got.length === 4)
    assert(got.head._3 <= nUsers)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"funnel counts must be non-increasing: $got")
    }
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    assert(got.forall(r => r._5 >= 0L && r._5 <= 1000000L))
  }

  test("transitionReport (x138): hand corpus — tie-free (ts, id) " +
      "ordering, per-user chains only, exact row-normalized micros") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: A -> B -> A   (transitions A->B, B->A)
    // u2: A -> A        (A->A); same ts as u1's events — chains never
    //                   cross users
    // u3: single event  (no transition)
    val events = Seq(
      (10L, 1L, ts("2024-01-01 08:00:00"), "A"),
      (11L, 1L, ts("2024-01-01 09:00:00"), "B"),
      (12L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (20L, 2L, ts("2024-01-01 08:00:00"), "A"),
      (21L, 2L, ts("2024-01-01 09:00:00"), "A"),
      (30L, 3L, ts("2024-01-01 08:00:00"), "B"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.transitionReport(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    // from A: A->B once, A->A once → 500000 micros each
    assert(got === Set(
      ("A", "B", 1L, 500000L),
      ("A", "A", 1L, 500000L),
      ("B", "A", 1L, 1000000L)))
  }

  test("transitionReport: equal timestamps fall back to the id " +
      "tie-break deterministically") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (2L, 1L, ts("2024-01-01 08:00:00"), "B"),
      (1L, 1L, ts("2024-01-01 08:00:00"), "A"),
      (3L, 1L, ts("2024-01-01 09:00:00"), "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.transitionReport(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("A", "B", 1L, 1000000L),
      ("B", "C", 1L, 1000000L)))
  }

  test("transitionReport fixture sanity: total transitions = events " +
      "minus users; probabilities sum to ~1e6 per live from-row") {
    val events = Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.transitionReport(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
    val nEvents = events.count()
    val nUsers = events.select(countDistinct($"user_id")).as[Long].head()
    assert(got.map(_._3).sum === nEvents - nUsers)
    // each from-row's micros sum within the floor-division slack
    got.groupBy(_._1).foreach { case (from, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"row $from micros sum $s out of range")
    }
  }

  test("activeUsersReport (x141): hand corpus — trailing windows " +
      "count distinct users, report keyed on dau days only") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 active day1 and day3; u2 active day1 (twice — counts once)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.activeUsersReport(events, "user_id", "ts")
      .as[(Timestamp, Long, Long, Long, Long)].collect().toSet
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (d("2024-01-01"), 2L, 2L, 2L, 1000000L),
      // day 3: only u1 active that day, but day-1 activity is inside
      // both trailing windows → wau = mau = 2, stickiness = 1/2
      (d("2024-01-03"), 1L, 2L, 2L, 500000L)))
  }

  test("activeUsersReport fixture sanity: dau <= wau <= mau <= " +
      "distinct users; stickiness bounded by 1e6") {
    val events = Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.activeUsersReport(events, "user_id", "ts")
      .as[(Timestamp, Long, Long, Long, Long)].collect()
    val nUsers = events.select(countDistinct($"user_id")).as[Long].head()
    assert(got.nonEmpty)
    got.foreach { case (day, dau, wau, mau, st) =>
      assert(dau >= 1L && dau <= wau && wau <= mau && mau <= nUsers,
        s"$day: $dau/$wau/$mau vs $nUsers")
      assert(st >= 0L && st <= 1000000L)
    }
  }

  test("interArrivalSpectrum (x142): exact base-2 buckets with " +
      "same-second gaps in bucket 0; bounds are the binary decades") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: A --1s--> B --9s--> C; u2: one event (no gap);
    // u3: two same-second events (gap 0)
    val events = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 08:00:01"), "B"),
      (3L, 1L, ts("2024-01-01 08:00:10"), "C"),
      (4L, 2L, ts("2024-01-01 08:00:00"), "A"),
      (5L, 3L, ts("2024-01-01 09:00:00"), "D"),
      (6L, 3L, ts("2024-01-01 09:00:00"), "E"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.interArrivalSpectrum(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 1L, 1L, 1L, 1L),   // 1 s  → bin len 1, range [1, 1]
      ("B", 4L, 1L, 8L, 15L),  // 9 s  → bin(9)=1001, range [8, 15]
      ("D", 0L, 1L, 0L, 0L)))  // same-second gap
  }

  test("interArrivalSpectrum fixture sanity: total gaps = events " +
      "minus users; ranges nest the bucket exactly") {
    val events = Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.interArrivalSpectrum(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, Long, Long, Long, Long)].collect()
    val nEvents = events.count()
    val nUsers = events.select(countDistinct($"user_id")).as[Long].head()
    assert(got.map(_._3).sum === nEvents - nUsers)
    got.foreach { case (_, b, _, lo, hi) =>
      if (b == 0L) assert(lo == 0L && hi == 0L)
      else {
        assert(lo === (1L << (b - 1)) && hi === (1L << b) - 1L)
      }
    }
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

  test("sessionStats (x152): hand-built sessions, durations, and " +
      "floor-division shares; fixture sessions match q25's count") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // u1: events at 0s, 60s | gap > 600 s | 1000s, 1030s → two
    // 2-event sessions; u2: one lone event → one 1-event session
    val events = Seq(
      (1L, ts(0), 10L), (2L, ts(60), 10L),
      (3L, ts(1000), 10L), (4L, ts(1030), 10L),
      (5L, ts(0), 20L)
    ).toDF("event_id", "ts", "user_id")
    val got = EventAnalytics.sessionStats(events, "user_id", "ts",
        "event_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 0L, 333333L),
      (2L, 2L, 90000000L, 666666L)))
    // fixture: session total equals q25's sessionization row count
    val fx = Tables.load(spark, sf0001, "events")
    val nSessions = EventAnalytics.sessionStats(fx, "user_id", "ts",
      "event_id").agg(sum($"n_sessions")).as[Long].head()
    assert(nSessions === SparkEntry.queries("q25_sessionize")(
      spark, sf0001).count())
  }

  test("hourlyProfile (x153): shares sum within a quantum of 1e6 per " +
      "type, exactly one peak per type, peak has the max count") {
    val got = EventAnalytics.hourlyProfile(
        Tables.load(spark, sf0001, "events"), "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall(r => r._2 >= 0 && r._2 <= 23))
    got.groupBy(_._1).foreach { case (t, rows) =>
      val share = rows.map(_._4).sum
      assert(share <= 1000000L && share > 1000000L - rows.length,
        s"$t shares sum $share")
      val peaks = rows.filter(_._5 == 1L)
      assert(peaks.length === 1, s"$t has ${peaks.length} peaks")
      assert(peaks.head._3 === rows.map(_._3).max)
    }
  }

  test("userLifespan (x154): hand fixture — span, active days, " +
      "density micros; fixture user total matches") {
    def ts(day: Long) = new Timestamp(day * 86400L * 1000L)
    // u1 active days {0, 2}: span 3, adays 2, density 666666
    // u2 active day {5}: span 1, adays 1, density 1000000
    val events = Seq(
      (1L, ts(0), 1L), (2L, ts(0), 1L), (3L, ts(2), 1L),
      (4L, ts(5), 2L)
    ).toDF("event_id", "ts", "user_id")
    val got = EventAnalytics.userLifespan(events, "user_id", "ts")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (3L, 1L, 2L, 666666L),
      (1L, 1L, 1L, 1000000L)))
    val fx = Tables.load(spark, sf0001, "events")
    val nUsers = EventAnalytics.userLifespan(fx, "user_id", "ts")
      .agg(sum($"n_users")).as[Long].head()
    assert(nUsers === fx.select(countDistinct($"user_id"))
      .as[Long].head())
  }

  test("sessionTypeLift (x155): hand fixture — independent-ish pair " +
      "lands at exactly 1e6; pairs are lexicographic") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // sessions: u1-s1 {a,b}, u1-s2 {a} (after a >10-min gap),
    // u2-s1 {a,b} → S=3, n_a=3, n_b=2, n_ab=2 →
    // lift = 2·3·1e6 div (3·2) = 1000000 exactly
    val events = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(10), 1L, "b"),
      (3L, ts(2000), 1L, "a"),
      (4L, ts(0), 2L, "b"), (5L, ts(5), 2L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.sessionTypeLift(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L, 1000000L)))
    // fixture sanity: every pair lexicographic, lifts positive
    val fx = EventAnalytics.sessionTypeLift(
        Tables.load(spark, sf0001, "events"), "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
    assert(fx.nonEmpty)
    assert(fx.forall(r => r._1 < r._2 && r._4 > 0L))
  }

  test("conversionLagSpectrum (x158): hand fixture — 9s lag lands in " +
      "bucket 4, same-second conversion in bucket 0, non-converters " +
      "excluded") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(9), 1L, "purchase"),
      (3L, ts(0), 2L, "purchase"),
      (4L, ts(0), 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.conversionLagSpectrum(events, "user_id",
        "ts", "event_type", "purchase")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((4L, 1L, 8L, 15L), (0L, 1L, 0L, 0L)))
  }

  test("transitionEntropy (x161): deterministic next-action scores 0 " +
      "exactly; a 2/1 split matches the hand-quantized arithmetic") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // u1: A B A B  → A→B ×2 (and B→A ×1); u2: A C → A→C ×1
    // from A: n=3, counts {B:2, C:1}: qs = q(2)+q(1) = 1386294 + 0,
    //   hn = FLOOR(3·ln3·1e6+0.5) = 3295837 →
    //   H = (3295837−1386294) div 3 = 636514 (≈ ln3 − (2/3)ln2)
    // from B: n=1 single successor → 0 exactly
    val events = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(1), 1L, "B"),
      (3L, ts(2), 1L, "A"), (4L, ts(3), 1L, "B"),
      (5L, ts(0), 2L, "A"), (6L, ts(1), 2L, "C")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.transitionEntropy(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("A", 3L, 636514L), ("B", 1L, 0L)))
  }

  test("userEntropyReport (x149): one-type users land in bucket 0 " +
      "exactly, a 50/50 two-type user lands at ln(2), quantization " +
      "matches hand arithmetic") {
    // u1: 4 events of one type → H = 0 (hn = qs bit-exactly)
    // u2: 2+2 events over two types → H = ln 2:
    //   q(2) = floor(2·ln2·1e6 + .5) = 1386294, qs = 2772588
    //   hn = floor(4·ln4·1e6 + .5) = 5545177
    //   em = (5545177 − 2772588) div 4 = 693147 → bucket 13
    // u3: a single event → N = 1, hn = qs = 0 → bucket 0
    val events = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"), (2L, "b"),
      (3L, "c")
    ).toDF("user_id", "event_type")
    val got = EventAnalytics.userEntropyReport(events, "user_id",
        "event_type")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 2L, 5L, 0L, 49999L),
      (13L, 1L, 4L, 650000L, 699999L)))
  }

  test("entryTypeLift (x162): hand fixture — struct-min first event, " +
      "exact conv and lift floor divisions") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 enters via 'ad' (tie on ts broken by event_id 1 < 2),
    //   converts; u2 enters 'ad', no purchase; u3 enters 'organic',
    //   converts. Totals: tu=3, tc=2.
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "ad"),
      (2L, ts("2024-01-01 08:00:00"), 1L, "organic"),
      (3L, ts("2024-01-02 08:00:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "ad"),
      (5L, ts("2024-01-01 10:00:00"), 3L, "organic"),
      (6L, ts("2024-01-01 11:00:00"), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.entryTypeLift(events, "user_id", "ts",
        "event_id", "event_type", target = "purchase")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // ad: 2 users, 1 converted -> conv 500000, lift (1*3*1e6)//(2*2)
    // organic: 1 user, 1 converted -> conv 1e6, lift (1*3*1e6)//(1*2)
    assert(got === Set(
      ("ad", 2L, 1L, 500000L, 750000L),
      ("organic", 1L, 1L, 1000000L, 1500000L)))
  }

  test("entryTypeLift: zero-conversion corpus publishes NULL lift") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq((1L, ts("2024-01-01 08:00:00"), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.entryTypeLift(events, "user_id", "ts",
        "event_id", "event_type", target = "purchase")
      .collect()
    assert(got.length == 1 && got.head.getLong(2) == 0L &&
      got.head.isNullAt(4))
  }

  test("repeatIntervalSpectrum (x163): hand fixture — only " +
      "target-to-target gaps, truncated-second buckets") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 purchases at 0s, 9s, 10s (gaps 9 -> bucket 4, 1 -> bucket 1);
    // the intervening 'view' at 5s must NOT split the 9 s gap;
    // u2's single purchase yields no gap
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "purchase"),
      (2L, ts("2024-01-01 08:00:05"), 1L, "view"),
      (3L, ts("2024-01-01 08:00:09"), 1L, "purchase"),
      (4L, ts("2024-01-01 08:00:10"), 1L, "purchase"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.repeatIntervalSpectrum(events, "user_id",
        "ts", "event_id", "event_type", target = "purchase")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((4L, 1L, 8L, 15L), (1L, 1L, 1L, 1L)))
  }

  test("sessionEntryExit (x167): hand sessions — 10-min gap splits, " +
      "id-order entry/exit, exact row normalization") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 session A: ids 1,2,3 (view -> click -> purchase);
    // 20-min gap; session B: id 4 alone (view -> view).
    // u2 session: ids 5,6 (view -> click).
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 08:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 08:02:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 08:22:01"), 1L, "view"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 09:05:00"), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.sessionEntryExit(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    // entry 'view' rows: ->purchase 1, ->view 1, ->click 1 (3 total)
    assert(got === Set(
      ("view", "purchase", 1L, 333333L),
      ("view", "view", 1L, 333333L),
      ("view", "click", 1L, 333333L)))
  }

  test("sessionConversionByLength (x172): hand sessions — depth-keyed " +
      "rates and baseline lift, NULL lift when nothing converts") {
    def ts(s: String) = Timestamp.valueOf(s)
    // 3-event session WITH purchase; 3-event session without;
    // 1-event session without. Totals: ts=3 sessions, tc=1.
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 08:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 08:02:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 09:01:00"), 2L, "view"),
      (6L, ts("2024-01-01 09:02:00"), 2L, "click"),
      (7L, ts("2024-01-01 10:00:00"), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.sessionConversionByLength(events,
        "user_id", "ts", "event_id", "event_type",
        target = "purchase")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // len 3: 2 sessions, 1 converted -> conv 500000,
    //   lift (1*3*1e6)//(2*1) = 1500000
    // len 1: 1 session, 0 converted -> conv 0, lift 0
    assert(got === Set(
      (3L, 2L, 1L, 500000L, 1500000L),
      (1L, 1L, 0L, 0L, 0L)))
    // zero-conversion corpus: NULL lift everywhere
    val none = EventAnalytics.sessionConversionByLength(
        events.filter($"event_type" =!= "purchase"), "user_id", "ts",
        "event_id", "event_type", target = "purchase").collect()
    assert(none.nonEmpty && none.forall(_.isNullAt(4)))
  }

  test("hoppingProfile (x173): each event lands in length/hop " +
      "epoch-aligned windows, straddling burst seen whole") {
    def ts(s: String) = Timestamp.valueOf(s)
    // 2024-01-01 00:00:00 UTC is a multiple of 300 s since epoch, so
    // hop slots align with the clock times below.
    // e1 at 00:02:00 -> windows [23:55 prev day, 00:00]
    // e2 at 00:07:30 -> windows [00:00, 00:05]
    // the 00:00 window sees BOTH events (a tumbling 5-min grid
    // would split them across 00:00 and 00:05)
    val events = Seq(
      (ts("2024-01-01 00:02:00"), 1L, "a"),
      (ts("2024-01-01 00:07:30"), 1L, "a"))
      .toDF("ts", "user_id", "event_type")
    val got = EventAnalytics.hoppingProfile(events, "ts", "user_id",
        "event_type", lengthSec = 600, hopSec = 300)
      .as[(Timestamp, String, Long, Long)].collect().toSet
    assert(got === Set(
      (ts("2023-12-31 23:55:00"), "a", 1L, 1L),
      (ts("2024-01-01 00:00:00"), "a", 2L, 1L),
      (ts("2024-01-01 00:05:00"), "a", 1L, 1L)))
    // length must be a multiple of hop
    intercept[IllegalArgumentException] {
      EventAnalytics.hoppingProfile(events, "ts", "user_id",
        "event_type", lengthSec = 500, hopSec = 300)
    }
  }

  test("rfmSegments (x174): lower-median splits, strict-above bits, " +
      "no-spend user holds monetary 0") {
    def ts(s: String) = Timestamp.valueOf(s)
    // corpus max day = Jan 3.
    // u1: 3 events (last Jan 3), one 10.0 purchase -> rec 0, f 3, m 10e6
    // u2: 1 purchase 2.0 on Jan 3                  -> rec 0, f 1, m 2e6
    // u3: 2 non-purchases (last Jan 2)             -> rec 1, f 2, m 0
    // lower medians (n=3, rank 2): rec 0, freq 2, mon 2e6
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), "view", Some(0.5)),
      (2L, ts("2024-01-02 08:00:00"), "purchase", Some(10.0)),
      (3L, ts("2024-01-03 08:00:00"), "view", None),
      (4L, ts("2024-01-03 09:00:00"), "purchase", Some(2.0)),
      (5L, ts("2024-01-01 10:00:00"), "view", Some(1.0)),
      (6L, ts("2024-01-02 10:00:00"), "click", None))
      .toDF("event_id", "ts", "event_type", "value")
      .withColumn("user_id",
        when($"event_id" <= 3, 1L)
          .otherwise(when($"event_id" === 4, 2L).otherwise(3L)))
    val got = EventAnalytics.rfmSegments(events, "user_id", "ts",
        "event_type", "value", target = "purchase")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 1L, 1L, 1L, 3L, 10000000L), // u1: recent, busy, paying
      (0L, 0L, 0L, 1L, 1L, 2000000L),  // u2: at-median everywhere
      (1L, 0L, 0L, 1L, 2L, 0L)))       // u3: stale, no spend
  }

  test("transition2Report (x175): per-user (ts,id)-ordered triples, " +
      "context-normalized micros") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: a b a b -> (a,b,a), (b,a,b); u2: a b c -> (a,b,c)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 08:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 08:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 08:03:00"), 1L, "b"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (6L, ts("2024-01-01 09:01:00"), 2L, "b"),
      (7L, ts("2024-01-01 09:02:00"), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.transition2Report(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", "a", 1L, 500000L),
      ("a", "b", "c", 1L, 500000L),
      ("b", "a", "b", 1L, 1000000L)))
  }

  test("cohortValueCurves (x176): Monday-aligned weekly cohorts, " +
      "exact decimal money, cohort-partitioned cumulative") {
    def ts(s: String) = Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. u1 cohort week Jan 1: 1.5 + 2.5 in
    // week 0, 1.0 in week 1. u2 cohort week Jan 8: NULL value -> 0.
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(1.5)),
      (1L, ts("2024-01-03 08:00:00"), Some(2.5)),
      (1L, ts("2024-01-08 08:00:00"), Some(1.0)),
      (2L, ts("2024-01-08 09:00:00"), None))
      .toDF("user_id", "ts", "value")
    val got = EventAnalytics.cohortValueCurves(events, "user_id",
        "ts", "value")
      .as[(Timestamp, Long, Long, Long, Long)].collect().toSet
    def mon(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (mon("2024-01-01"), 0L, 1L, 4000000L, 4000000L),
      (mon("2024-01-01"), 1L, 1L, 1000000L, 5000000L),
      (mon("2024-01-08"), 0L, 1L, 0L, 0L)))
  }

  test("dailyAnomaly (x178): MAD-normalized z flags the spike; " +
      "MAD=0 degenerates to the strict any-deviation flag") {
    def ts(d: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-0$d%d 08:${i / 60}%02d:${i % 60}%02d")
    def day(d: Int) = Timestamp.valueOf(f"2024-01-0$d%d 00:00:00")
    // counts [8, 9, 10, 11, 50]: med 10, MAD 1 -> only day 5 flags
    val events = Seq(8, 9, 10, 11, 50).zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (ts(d + 1, i), 1L))
    }.toDF("ts", "user_id")
    val got = EventAnalytics.dailyAnomaly(events, "ts")
      .as[(Timestamp, Long, Long, Option[Long], Long)].collect().toSet
    assert(got === Set(
      (day(1), 8L, -2L, Some(2000000L), 0L),
      (day(2), 9L, -1L, Some(1000000L), 0L),
      (day(3), 10L, 0L, Some(0L), 0L),
      (day(4), 11L, 1L, Some(1000000L), 0L),
      (day(5), 50L, 40L, Some(40000000L), 1L)))
    // counts [10, 10, 10, 10, 100]: MAD 0 -> NULL z, dev<>0 flags
    val flat = Seq(10, 10, 10, 10, 100).zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (ts(d + 1, i), 1L))
    }.toDF("ts", "user_id")
    val deg = EventAnalytics.dailyAnomaly(flat, "ts")
      .as[(Timestamp, Long, Long, Option[Long], Long)].collect().toSet
    assert(deg === Set(
      (day(1), 10L, 0L, None, 0L), (day(2), 10L, 0L, None, 0L),
      (day(3), 10L, 0L, None, 0L), (day(4), 10L, 0L, None, 0L),
      (day(5), 100L, 90L, None, 1L)))
  }

  test("benfordAudit (x179): digits from integer micros, NULL/" +
      "non-positive excluded, all nine rows publish") {
    val events = Seq(Some(1.5), Some(25.0), Some(0.25), Some(-3.0),
      Some(0.0), None).toDF("value")
    val got = EventAnalytics.benfordAudit(events, "value")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // digits: 1.5 -> 1; 25.0 and 0.25 -> 2; total 3
    assert(got.size === 9)
    assert(got.contains((1L, 1L, 333333L, 301029L, 32304L)))
    assert(got.contains((2L, 2L, 666666L, 176091L, 490575L)))
    assert(got.filter(r => r._1 >= 3L)
      .forall(r => r._2 == 0L && r._3 == 0L &&
        r._5 == -r._4))
    // empty-corpus guard: zero shares, no division error
    val empty = EventAnalytics.benfordAudit(
      Seq(Option.empty[Double]).toDF("value"), "value")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(empty.length === 9 && empty.forall(r =>
      r._2 == 0L && r._3 == 0L))
  }

  test("calendarDensify (x180): gap day publishes a zero row with " +
      "the flag set") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 08:00:00"), 1L), (ts("2024-01-01 09:00:00"), 2L),
      (ts("2024-01-03 10:00:00"), 1L))
      .toDF("ts", "user_id")
    val got = EventAnalytics.calendarDensify(events, "ts", "user_id")
      .as[(Timestamp, Long, Long, Long)].collect().toSet
    def day(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (day("2024-01-01"), 2L, 2L, 0L),
      (day("2024-01-02"), 0L, 0L, 1L),
      (day("2024-01-03"), 1L, 1L, 0L)))
  }

  test("peakConcurrency (x181): inclusive-endpoint overlap at the " +
      "shared instant, midnight-spanning session clips to both days") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 session [10:00, 10:05]; u2 point session AT 10:05 (overlaps
    // u1's endpoint -> peak 2); u3 session 23:58 -> 00:04 next day
    // (6-min gap, one session, clipped to both days)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L),
      (3L, ts("2024-01-01 10:05:00"), 2L),
      (4L, ts("2024-01-01 23:58:00"), 3L),
      (5L, ts("2024-01-02 00:04:00"), 3L))
      .toDF("event_id", "ts", "user_id")
    val got = EventAnalytics.peakConcurrency(events, "user_id", "ts",
        "event_id").as[(Timestamp, Long, Long)].collect().toSet
    def day(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (day("2024-01-01"), 3L, 2L),
      (day("2024-01-02"), 1L, 1L)))
  }

  test("audienceOverlap (x183): inclusion-exclusion Jaccard, NULL " +
      "users dropped, zero-overlap pairs absent") {
    val events = Seq(
      ("A", Some(1L)), ("A", Some(2L)), ("A", Some(3L)),
      ("A", Some(2L)),                      // dup (A,2) counts once
      ("B", Some(2L)), ("B", Some(3L)),
      ("C", Some(4L)),                      // disjoint from A and B
      ("A", Option.empty[Long]))            // NULL user dropped
      .toDF("event_type", "user_id")
    val got = EventAnalytics.audienceOverlap(events, "user_id",
        "event_type").as[(String, String, Long, Long)].collect().toSet
    // |A|=3 |B|=2, A∩B={2,3} -> 2/3; (A,C),(B,C) never co-occur
    assert(got === Set(("A", "B", 2L, 666666L)))
  }

  test("weekHeatmap (x184): integer dow (0=Sunday), hour cells, " +
      "lift vs the uniform 1/168 cell") {
    def ts(s: String) = Timestamp.valueOf(s)
    // 2024-01-01 is a Monday (dow 1); 2024-01-07 a Sunday (dow 0)
    val events = Seq(
      ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00"),
      ts("2024-01-07 23:30:00")).map(Tuple1(_)).toDF("ts")
    val got = EventAnalytics.weekHeatmap(events, "ts")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 10L, 2L, 666666L, 112000000L),
      (0L, 23L, 1L, 333333L, 56000000L)))
  }

  test("transitionLatency (x185): per-pair mean/max gap micros, " +
      "same-instant transitions contribute zero") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 08:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 08:01:00"), 1L, "c"), // tie -> id order
      (4L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (5L, ts("2024-01-01 09:02:00"), 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.transitionLatency(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 90000000L, 120000000L),
      ("b", "c", 1L, 0L, 0L)))
  }

  test("sessionSurvival (x188): suffix-accumulated reach counts " +
      "and survival shares") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: one 3-event session; u2: two 1-event sessions (20-min gap)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L),
      (2L, ts("2024-01-01 08:01:00"), 1L),
      (3L, ts("2024-01-01 08:02:00"), 1L),
      (4L, ts("2024-01-01 09:00:00"), 2L),
      (5L, ts("2024-01-01 09:20:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = EventAnalytics.sessionSurvival(events, "user_id", "ts",
        "event_id").as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (3L, 1L, 1L, 333333L),
      (1L, 2L, 3L, 1000000L)))
  }

  test("propsProfile (x190): null/malformed/missing k share, " +
      "mean guarded NULL for all-null types") {
    val events = Seq(
      ("a", Some("""{"k": 5}""")),
      ("a", Some("""{"k": 7}""")),
      ("a", Option.empty[String]),      // NULL props
      ("b", Some("""{"x": 1}""")))      // missing key
      .toDF("event_type", "props")
    val got = EventAnalytics.propsProfile(events, "props",
        "event_type")
      .as[(String, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSet
    assert(got === Set(
      ("a", 3L, 333333L, Some(6000000L), Some(5L), Some(7L)),
      ("b", 1L, 1000000L, None, None, None)))
  }

  test("valueSpectrum (x191): bit-length buckets on exact micros, " +
      "zero/negative in bucket 0, NULL excluded") {
    val events = Seq(
      ("a", Some(1.0)),   // 1e6 micros -> 20 bits
      ("a", Some(3.5)),   // 3.5e6 -> 22 bits
      ("a", Some(0.0)), ("a", Some(-1.0)), // bucket 0
      ("a", Option.empty[Double]))
      .toDF("event_type", "value")
    val got = EventAnalytics.valueSpectrum(events, "event_type",
        "value").as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 20L, 1L, 1000000L),
      ("a", 22L, 1L, 3500000L),
      ("a", 0L, 2L, -1000000L)))
  }

  test("bounceRate (x192): one-event sessions count as bounces per " +
      "entry type") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"), // session 1 (len 2)
      (2L, ts("2024-01-01 10:05:00"), 1L, "b"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "a"), // session 2: bounce
      (4L, ts("2024-01-01 11:00:00"), 2L, "b")) // u2: bounce
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.bounceRate(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 2L, 1L, 500000L),
      ("b", 1L, 1L, 1000000L)))
  }

  test("hourlyConversion (x193): integer hours, x162 lift vs the " +
      "all-hours baseline") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:10:00"), "view"),
      (ts("2024-01-01 10:20:00"), "purchase"),
      (ts("2024-01-01 11:10:00"), "view"))
      .toDF("ts", "event_type")
    val got = EventAnalytics.hourlyConversion(events, "ts",
        "event_type", target = "purchase")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    // hour 10: 1/2 convert, lift (1*3e6) div (2*1) = 1.5e6
    assert(got === Set(
      (10L, 2L, 1L, 500000L, Some(1500000L)),
      (11L, 1L, 0L, 0L, Some(0L))))
    // no-target corpus: lift NULL, rate 0
    val none = EventAnalytics.hourlyConversion(
      events.filter($"event_type" =!= "purchase"), "ts",
      "event_type", target = "purchase")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(none.nonEmpty && none.forall(r => r._4 == 0L &&
      r._5.isEmpty))
  }

  test("growthAccounting (x195): new/retained/resurrected split, " +
      "right-censored next-week churn") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")), // u1 w1
      (1L, ts("2024-01-08 08:00:00")), // u1 w2 (retained)
      (2L, ts("2024-01-02 08:00:00")), // u2 w1
      (2L, ts("2024-01-16 08:00:00")), // u2 w3 (resurrected)
      (3L, ts("2024-01-09 08:00:00"))) // u3 w2 (new)
      .toDF("user_id", "ts")
    val got = EventAnalytics.growthAccounting(events, "user_id", "ts")
      .as[(Timestamp, Long, Long, Long, Long, Long)].collect().toSet
    def mon(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (mon("2024-01-01"), 2L, 2L, 0L, 0L, 1L), // u2 misses w2
      (mon("2024-01-08"), 2L, 1L, 1L, 0L, 2L), // both miss w3
      (mon("2024-01-15"), 1L, 0L, 0L, 1L, 1L))) // censored tail
    // the split always partitions the actives
    val fx = EventAnalytics.growthAccounting(
      Tables.load(spark, sf0001, "events"), "user_id", "ts")
    assert(fx.filter($"n_active" =!=
      $"n_new" + $"n_retained" + $"n_resurrected").count() === 0L)
  }

  test("cadenceSpectrum (x197): day-grain base-2 gap buckets, " +
      "same-day repeat in bucket 0, single-order key emits nothing") {
    def ts(s: String) = Timestamp.valueOf(s)
    val orders = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L),
      (2L, ts("2024-01-01 18:00:00"), 1L), // same day -> bucket 0
      (3L, ts("2024-01-04 08:00:00"), 1L), // gap 3 days -> bucket 2
      (4L, ts("2024-01-02 08:00:00"), 2L)) // single order: no gap
      .toDF("o_orderkey", "o_orderdate", "o_custkey")
    val got = EventAnalytics.cadenceSpectrum(orders, "o_custkey",
        "o_orderdate", "o_orderkey")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 0L, 0L), (2L, 1L, 2L, 3L)))
  }

  test("trailingRevenue (x198): explode-forward trailing 7-day " +
      "total, all-NULL day coalesces to 0") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 08:00:00"), Some(1.0)),
      (ts("2024-01-02 08:00:00"), Some(2.0)),
      (ts("2024-01-03 08:00:00"), Option.empty[Double]), // rev 0 day
      (ts("2024-01-10 08:00:00"), Some(5.0)))
      .toDF("ts", "value")
    val got = EventAnalytics.trailingRevenue(events, "ts", "value")
      .as[(Timestamp, Long, Long)].collect().toSet
    def day(s: String) = Timestamp.valueOf(s + " 00:00:00")
    assert(got === Set(
      (day("2024-01-01"), 1000000L, 1000000L),
      (day("2024-01-02"), 2000000L, 3000000L),
      (day("2024-01-03"), 0L, 3000000L),
      (day("2024-01-10"), 5000000L, 5000000L))) // Jan 4-10 window
  }

  test("sessionGapSpectrum (x199): end-to-next-start gaps at visit " +
      "grain, single-session user emits nothing") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L), // session 1 ends 10:05
      (3L, ts("2024-01-01 11:00:00"), 1L), // session 2: gap 3300 s
      (4L, ts("2024-01-01 09:00:00"), 2L)) // single session: no gap
      .toDF("event_id", "ts", "user_id")
    val got = EventAnalytics.sessionGapSpectrum(events, "user_id",
        "ts", "event_id").as[(Long, Long, Long, Long)].collect().toSet
    // 2^11 = 2048 <= 3300 < 4096 -> bucket 12
    assert(got === Set((12L, 1L, 2048L, 4095L)))
  }

  test("monthlyGrowth (x200): INTERVAL 1 MONTH adjacency, NULL " +
      "first-month/absent/zero-predecessor branches") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-10 08:00:00"), Some(2.0)),
      (ts("2024-02-10 08:00:00"), Some(3.0)),
      (ts("2024-03-10 08:00:00"), Option.empty[Double]), // rev-0 month
      (ts("2024-04-10 08:00:00"), Some(1.0)))
      .toDF("ts", "value")
    val got = EventAnalytics.monthlyGrowth(events, "ts", "value")
      .as[(Timestamp, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    def mon(s: String) = Timestamp.valueOf(s + "-01 00:00:00")
    assert(got === Set(
      (mon("2024-01"), 2000000L, None, None, None),
      (mon("2024-02"), 3000000L, Some(2000000L), Some(1000000L),
        Some(1500000L)),
      (mon("2024-03"), 0L, Some(3000000L), Some(-3000000L), Some(0L)),
      (mon("2024-04"), 1000000L, Some(0L), Some(1000000L), None)))
  }

  test("transitionAsymmetry (x201): canonical pairs, one-way edge " +
      "publishes 1e6, self-loops excluded") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 08:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 08:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 08:03:00"), 1L, "b"),
      (5L, ts("2024-01-01 08:04:00"), 1L, "a"), // a<->b fully balanced
      (6L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (7L, ts("2024-01-01 09:01:00"), 2L, "c"), // a->c one-way
      (8L, ts("2024-01-01 10:00:00"), 3L, "d"),
      (9L, ts("2024-01-01 10:01:00"), 3L, "d")) // self-loop: excluded
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.transitionAsymmetry(events, "user_id",
        "ts", "event_id", "event_type")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 2L, 0L),
      ("a", "c", 1L, 0L, 1000000L)))
  }
}
