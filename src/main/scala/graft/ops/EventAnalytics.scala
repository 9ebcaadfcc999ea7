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

  /** Ordered conversion funnel — the other canonical product-analytics
    * report: for a declared step sequence (e.g. signup → view → click
    * → purchase), count the users who completed each step IN ORDER,
    * where step k+1 only counts events strictly AFTER the user's
    * first completion of step k. Per step: users reaching it, plus
    * step-over-step and step-over-first conversion rates in micros.
    *
    * Semantics (deterministic, tie-free): t₁ = MIN(ts) of the user's
    * step-1 events; tₖ₊₁ = MIN(ts) of step-(k+1) events with
    * ts > tₖ. Every tₖ is a MIN over a timestamp set — unique values,
    * no tie-break needed — and the conversion micros are exact
    * floor divisions of BIGINT counts (non-negative operands, so
    * truncating and flooring engines agree). Step 1's conversions
    * publish the 1 000 000 identity by convention. No FP anywhere —
    * unconditionally portable.
    *
    * Scale: one linear chain of 2(k−1) user-keyed equi-joins — each
    * step filters `events` by its type (predicate pushed to the scan),
    * inner-joins the user-sized frontier, re-aggregates MIN per user
    * (map-side combinable), and LEFT-joins back onto the user-sized
    * funnel frame; no event text or payload ever shuffles, only
    * (user, ts). The final report is ONE aggregate over the funnel
    * frame (k counts) exploded to k rows — a single action, k bounded
    * by the declared funnel (not the data).
    *
    * Returns `(step BIGINT, event_type STRING, n_users BIGINT,
    * conv_prev_micros BIGINT, conv_first_micros BIGINT)`.
    */
  def funnelReport(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("t1"))
    val funnel = steps.tail.zipWithIndex.foldLeft(first) {
      case (f, (st, i)) =>
        val prev = s"t${i + 1}"
        val cur = s"t${i + 2}"
        val nxt = events.filter(col(typeCol) === st)
          .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
          .join(f.select(col("_u"), col(prev)), "_u")
          .filter(col("_ts") > col(prev))
          .groupBy("_u").agg(min(col("_ts")).as(cur))
          .select(col("_u"), col(cur))
        f.join(nxt, Seq("_u"), "left")
    }
    val nCols = steps.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val agg = funnel.agg(nCols.head, nCols.tail: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val n = col(s"n${i + 1}")
      val convPrev =
        if (i == 0) lit(1000000L)
        else {
          val p = s"n$i"
          when(col(p) === 0L, 0L)
            .otherwise(expr(s"(n${i + 1} * 1000000) div $p"))
        }
      val convFirst =
        if (i == 0) lit(1000000L)
        else when(col("n1") === 0L, 0L)
          .otherwise(expr(s"(n${i + 1} * 1000000) div n1"))
      struct(lit((i + 1).toLong).as("step"), lit(st).as("event_type"),
        n.cast(LongType).as("n_users"),
        convPrev.cast(LongType).as("conv_prev_micros"),
        convFirst.cast(LongType).as("conv_first_micros"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Event-type transition report — the first-order Markov view of
    * user behavior: per user, events are put in the (ts, id) total
    * order (event ids are unique, so the order is tie-free), every
    * consecutive pair becomes one (from_type, to_type) transition,
    * and the report publishes per ordered pair the exact transition
    * count and the row-normalized probability in micros
    * (`n · 10⁶ div Σ_to n` — exact BIGINT floor division,
    * non-negative operands). The companion diagnostic to x135: the
    * funnel asks "do users follow THIS path", the matrix shows which
    * paths they actually take.
    *
    * Scale: ONE user-keyed exchange feeds the lead window (the
    * shuffle carries (user, ts, id, type) — no payload), transitions
    * partial-aggregate map-side to the type²-bounded matrix, and the
    * row normalization is a window over that matrix — type²-sized,
    * not corpus-sized. The per-user window is the q8/q9 partitioned
    * shape; a power user bounds a task at their own event count.
    *
    * Returns `(from_type, to_type, n BIGINT, p_micros BIGINT)`.
    */
  def transitionReport(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val m = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_type"))
    m.withColumn("_tot", sum(col("n")).over(rowTotal))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div _tot").as("p_micros"))
  }

  /** DAU / WAU / MAU active-user report — the growth dashboard's
    * backbone trio: for every calendar day with at least one active
    * user, the exact count of users active that day (DAU), in the
    * trailing 7 days (WAU), and in the trailing 30 days (MAU), plus
    * the DAU/WAU "stickiness" ratio in exact floor-division micros.
    * All counts are exact distinct-user counts — no sketch; the
    * HLL-sketched spelling at extreme scale is x16's op, this is the
    * exact report.
    *
    * Determinism: pure date arithmetic (day truncation, day
    * sequences), exact BIGINT counts, one non-negative floor
    * division. The day publishes as TIMESTAMP midnight (the repo's
    * proven-portable convention — q15/q20/x130).
    *
    * Scale: the corpus collapses FIRST to the distinct (user, day)
    * activity table (map-side combinable; users × active-days rows —
    * the calendar-bounded frame every other aggregate rides). The
    * trailing windows explode each activity row to its 7 (resp. 30)
    * anchor days and re-distinct on (anchor, user) — a bounded 37×
    * blowup of the ALREADY-COLLAPSED id+date table, never of the
    * event stream; counts then partial-aggregate per anchor. No
    * window functions, no per-user state.
    *
    * Returns `(day TIMESTAMP, dau, wau, mau, stickiness_micros)` for
    * every day with dau ≥ 1.
    */
  def activeUsersReport(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol).as("_u"),
        date_trunc("day", col(tsCol)).as("_d"))
      .distinct()
    def trailing(win: Int, as: String): DataFrame =
      act.select(col("_u"), explode(sequence(col("_d"),
          col("_d") + expr(s"INTERVAL ${win - 1} DAYS"),
          expr("INTERVAL 1 DAY"))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as(as))
    val dau = act.groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("dau"))
    dau.join(trailing(7, "wau"), Seq("day"))
      .join(trailing(30, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(dau * 1000000) div wau").as("stickiness_micros"))
  }

  /** Inter-arrival-time spectrum — the engagement/latency histogram
    * read next to the x138 transition matrix: per event type of the
    * EARLIER event, the distribution of gaps to the user's next event
    * (any type), bucketed on an EXACT base-2 grid: bucket = bit
    * length of the gap in seconds (`length(bin(dt))` — a string-length
    * integer both engines compute identically; no libm log anywhere),
    * bucket 0 for same-second gaps. Covers ~binary decades from 1 s
    * up; the heavy-tail shape (bots: tight spikes; humans: smooth
    * decades) is the signal.
    *
    * Per user, events take the tie-free (ts, id) total order (the
    * x138 convention); gaps are exact integer second differences of
    * the epoch timestamps.
    *
    * Scale: the same ONE user-keyed exchange as x138 feeds the lead
    * window; the spectrum partial-aggregates map-side to
    * (type × ~40 buckets) rows.
    *
    * Returns `(event_type, bucket, n, lo_s, hi_s)` — `[lo_s, hi_s]`
    * the bucket's inclusive second range.
    */
  def interArrivalSpectrum(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val gaps = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("event_type"),
        unix_timestamp(col(tsCol)).as("_t"))
      .withColumn("_nt", lead(col("_t"), 1).over(w))
      .filter(col("_nt").isNotNull)
      .select(col("event_type"), (col("_nt") - col("_t")).as("_dt"))
    val bucket = when(col("_dt") <= 0L, lit(0L))
      .otherwise(length(bin(col("_dt"))).cast(LongType))
    gaps.select(col("event_type"), bucket.as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"), col("n"),
        when(col("bucket") === 0L, 0L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1)"))
          .cast(LongType).as("lo_s"),
        when(col("bucket") === 0L, 0L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))") - 1L)
          .cast(LongType).as("hi_s"))
  }

  /** Behavioral-entropy histogram — the bot-vs-human composition
    * gauge next to [[interArrivalSpectrum]]'s timing view: per user,
    * the Shannon entropy of their event-TYPE distribution (a bot
    * hammering one endpoint scores ~0 nats; organic use spreads
    * toward ln(#types)), folded into 1/20-nat buckets of user
    * counts (fine enough to split organic cohorts; a bot spike at 0
    * stands alone regardless). Entropy is published portably via the x118/x139
    * quantize-then-exact-integer pattern: per (user, type) count c,
    * `q = FLOOR(c·ln(c)·10⁶ + 0.5)` (exactly 0 for c = 1 — no libm
    * call can miss ln(1) = 0 because the draw is quantized, and the
    * repo margin gate pins every quantized draw's boundary distance);
    * per user `H·10⁶ ≈ (FLOOR(N·ln(N)·10⁶ + 0.5) − Σq) div N` — an
    * exact BIGINT fold of quantized draws. The numerator is clamped
    * at 0 (`greatest`) because per-term quantization error of ±0.5
    * micros can push a near-zero entropy a few micros negative, and
    * negative integer division is the one place Spark (truncate) and
    * DuckDB (floor) disagree — the clamp makes the published value
    * identical and is part of the contract (true entropy is ≥ 0).
    *
    * Scale: ONE map-side-combinable (user, type) aggregate, ONE
    * user-keyed aggregate (rows = users × their type fan-out, bounded
    * by the type alphabet), then the bucket fold to ~12 rows. No
    * windows, no joins.
    *
    * Returns `(bucket, n_users, total_events, lo_micros, hi_micros)`
    * — bucket = entropy_micros div 50000.
    */
  /** The q25 gap-sessionization primitive shared by
    * [[sessionStats]] and [[sessionTypeLift]]: per user, events take
    * the event_id total order (the q25 convention — ids are assigned
    * in ingest order and tie-free, where timestamps need not be), a
    * session break is a gap > `gapUs` micros, and the session index
    * is the running break count. Returns one row per EVENT:
    * `(userCol, session_idx, tus, <typeCol if given>)`.
    *
    * Scale: ONE user-keyed exchange feeds both windows (lag + running
    * sum share the partition+order); a power user bounds a task at
    * their own event count — the q8/q9 partitioned-window shape.
    */
  private def sessionized(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, gapUs: Long,
      keep: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(idCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val base = events.select((Seq(col(userCol), col(idCol),
      unix_micros(col(tsCol).cast(TimestampType)).as("tus")) ++
      keep.map(col)): _*)
    val isNew = when(lag(col("tus"), 1).over(wOrd).isNull ||
      col("tus") - lag(col("tus"), 1).over(wOrd) > gapUs, 1L)
      .otherwise(0L)
    base.withColumn("session_idx",
      sum(isNew).over(wRun).cast(LongType))
  }

  /** Session-length distribution — the engagement report read next to
    * x142's inter-arrival spectrum: gap-sessionize (10-minute
    * inactivity, the q25 convention), then publish, per exact session
    * EVENT COUNT, how many sessions have it, their total wall
    * duration, and the session-share in exact floor-division micros.
    *
    * Determinism: integer microsecond arithmetic end to end — session
    * indices from exact lag/running-sum windows, durations as
    * max−min of epoch micros, the share one BIGINT floor division.
    *
    * Scale: one user-keyed exchange (the shared [[sessionized]]
    * windows), the session rollup partial-aggregates map-side to a
    * (user × session) table bounded by event count, and the published
    * distribution is session-length-bounded (≲ hundreds of rows). The
    * global session total rides a broadcast one-row frame.
    *
    * Returns `(n_events, n_sessions, sum_duration_us,
    * p_micros BIGINT)`.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapUs: Long = 600000000L): DataFrame = {
    val sess = sessionized(events, userCol, tsCol, idCol, gapUs, Nil)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
    val dist = sess.groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("dur_us")).as("sum_duration_us"))
    val total = dist.agg(sum(col("n_sessions")).as("_tot"))
    dist.crossJoin(broadcast(total))
      .select(col("n_events"), col("n_sessions"),
        col("sum_duration_us"),
        expr("(n_sessions * 1000000) div _tot").as("p_micros"))
  }

  /** Hour-of-day activity profile — per event type, the 24-bucket
    * histogram with the within-type share in exact micros and the
    * peak-hour flag (ties break to the earliest hour). The signal a
    * bot/abuse triage reads first: human types have a diurnal shape,
    * machine traffic is flat or single-spike.
    *
    * Determinism: `hour()` on the instant-cast timestamp is exact
    * integer arithmetic in the UTC session; counts are BIGINTs; the
    * share is one floor division; the peak flag is a deterministic
    * (n DESC, hour ASC) row_number.
    *
    * Scale: one map-side-combinable (type × 24)-bounded aggregate;
    * the share/peak windows run over that tiny table.
    *
    * Returns `(event_type, hour, n, share_micros, is_peak BIGINT)`.
    */
  def hourlyProfile(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .select(col(typeCol).as("event_type"),
        hour(col(tsCol).cast(TimestampType)).cast(LongType).as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy(col("event_type"))
    counts
      .withColumn("_tot", sum(col("n")).over(wt))
      .withColumn("_rk", row_number().over(
        wt.orderBy(col("n").desc, col("hour").asc)))
      .select(col("event_type"), col("hour"), col("n"),
        expr("(n * 1000000) div _tot").as("share_micros"),
        when(col("_rk") === 1, 1L).otherwise(0L).as("is_peak"))
  }

  /** User-lifespan distribution — per user, the span in calendar days
    * from first to last activity and the count of distinct active
    * days; published as the per-span rollup with the exact activity
    * density in summed micros (density = active_days/span per user,
    * floor-divided in micros, summed exactly). The churn-analysis
    * companion to x130's cohort matrix: spans say HOW LONG users
    * stay, densities how consistently they show up while they do.
    *
    * Determinism: epoch-day truncation is one integer floor division
    * of epoch micros (`tus div 86400000000` — identical in both
    * engines on post-1970 fixtures); everything else is exact BIGINT
    * min/max/count and one floor division per user.
    *
    * Scale: the corpus collapses FIRST to the distinct (user, day)
    * activity table (map-side combinable — the x141 argument); the
    * per-user rollup is user-keyed; the published table is
    * span-bounded (≤ calendar days).
    *
    * Returns `(span_days, n_users, total_active_days,
    * sum_density_micros)`.
    */
  def userLifespan(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val act = events.select(col(userCol).as("_u"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
          .as("_d"))
      .distinct()
    val per = act.groupBy("_u")
      .agg((max(col("_d")) - min(col("_d")) + 1L).as("span_days"),
        count(lit(1)).as("adays"))
      .withColumn("density_micros",
        expr("(adays * 1000000) div span_days"))
    per.groupBy("span_days")
      .agg(count(lit(1)).as("n_users"),
        sum(col("adays")).as("total_active_days"),
        sum(col("density_micros")).as("sum_density_micros"))
  }

  /** Session-level event-type co-occurrence lift — for every
    * unordered type pair, in how many sessions both appear, and the
    * pointwise lift `P(a,b)/(P(a)·P(b)) = n_ab·S/(n_a·n_b)` in exact
    * floor-division micros (>1e6 ⇒ the types attract, <1e6 ⇒ they
    * repel). The session-granular sibling of x63's document PMI —
    * the report a funnel designer reads before ordering steps.
    *
    * Determinism: exact BIGINT counts and ONE floor division; the
    * pair key is the lexicographic (a < b) order.
    *
    * Long headroom: `n_ab · S · 1000000` must stay below 2⁶³ —
    * S·n_ab < 9.2e12, i.e. fine through ~3M sessions with fully
    * co-occurring types; past that, sample sessions first (the
    * x112/x137 sample-above convention).
    *
    * Scale: one user-keyed exchange (shared [[sessionized]]), the
    * per-session distinct-type table partial-aggregates map-side,
    * and the pair self-join is per-session bounded (k types ⇒
    * k(k−1)/2 pairs — type-vocabulary small by construction). All
    * published tables are type²-bounded.
    *
    * Returns `(type_a, type_b, n_ab, lift_micros)`.
    */
  def sessionTypeLift(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    // lazy-checkpoint barrier (r17, the x174 sibling fold): FOUR
    // consumers derive from `st` (the session total, the per-type
    // counts, and both pair-join sides), and without the barrier each
    // re-ran the events scan + user-keyed session window — the 10×
    // stage audit showed the corpus scanned three times (AQE reuse
    // caught only one). The checkpointed table is the per-(user,
    // session, type) DISTINCT frame — session-bounded, far smaller
    // than the event log.
    val st = sessionized(events, userCol, tsCol, idCol, gapUs,
        Seq(typeCol))
      .select(col(userCol).as("_u"), col("session_idx"),
        col(typeCol).as("_t"))
      .distinct()
      .localCheckpoint(eager = false)
    val total = st.select(col("_u"), col("session_idx")).distinct()
      .agg(count(lit(1)).as("_s"))
    val perType = st.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val a = st.select(col("_u"), col("session_idx"),
      col("_t").as("type_a"))
    val b = st.select(col("_u"), col("session_idx"),
      col("_t").as("type_b"))
    a.join(b, Seq("_u", "session_idx"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
      .join(broadcast(perType.select(col("_t").as("type_a"),
        col("_n").as("_na"))), "type_a")
      .join(broadcast(perType.select(col("_t").as("type_b"),
        col("_n").as("_nb"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        expr("(n_ab * _s * 1000000) div (_na * _nb)")
          .as("lift_micros"))
  }

  /** Conversion-lag spectrum — per user, the exact gap in seconds
    * from their FIRST event of any type to their FIRST `target`-type
    * event, bucketed on x142's base-2 grid (bucket = bit length of
    * the gap seconds; 0 for same-second conversion); users who never
    * reach `target` are excluded. The activation-latency histogram a
    * growth team reads next to x135's funnel depth: the funnel says
    * how FAR users get, this says how FAST.
    *
    * Determinism: exact integer second arithmetic (`unix_timestamp`
    * truncation, min aggregates, one subtraction); the bucket is the
    * `length(bin(dt))` integer both engines compute identically.
    *
    * Scale: ONE map-side-combinable user-keyed aggregate (two
    * conditional mins), then the ~40-bucket rollup. No windows, no
    * joins.
    *
    * Returns `(bucket, n_users, lo_s, hi_s)`.
    */
  def conversionLagSpectrum(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, target: String): DataFrame = {
    val t = unix_timestamp(col(tsCol).cast(TimestampType))
    val per = events
      .groupBy(col(userCol))
      .agg(min(t).as("_t0"),
        min(when(col(typeCol) === target, t)).as("_tc"))
      .filter(col("_tc").isNotNull)
      .select((col("_tc") - col("_t0")).as("_dt"))
    val bucket = when(col("_dt") <= 0L, lit(0L))
      .otherwise(length(bin(col("_dt"))).cast(LongType))
    lagSpectrumPublish(per.select(bucket.as("bucket")))
  }

  /** The x158 publish tail over per-user `bucket` rows — ONE spelling
    * shared by the batch spectrum above, the online twin's assembly
    * (`EventStreams.conversionLagOnline`), and the repeat-interval
    * spectrum (x163, which counts GAPS, hence `countName`), so the
    * published (bucket, count, lo_s, hi_s) arithmetic cannot drift.
    */
  private[graft] def lagSpectrumPublish(bucketRows: DataFrame,
      countName: String = "n_users", loName: String = "lo_s",
      hiName: String = "hi_s"): DataFrame =
    bucketRows
      .groupBy("bucket").agg(count(lit(1)).as(countName))
      .select(col("bucket"), col(countName),
        when(col("bucket") === 0L, 0L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1)"))
          .cast(LongType).as(loName),
        when(col("bucket") === 0L, 0L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))") - 1L)
          .cast(LongType).as(hiName))

  /** Per-from-type transition entropy — x149's behavioral-entropy
    * quantization applied to x138's transition matrix: for each
    * from_type, the Shannon entropy of its to_type distribution in
    * exact floor-division micros. Near-zero says the next action is
    * deterministic (bots, redirect chains); near ln(#types) says the
    * type carries no routing signal.
    *
    * Determinism: the x149 contract verbatim — per-cell draw
    * `q = FLOOR(n·ln(n)·10⁶ + 0.5)` (exactly 0 at n = 1,
    * margin-gated), `H·10⁶ = greatest(FLOOR(N·lnN·10⁶+0.5) − Σq, 0)
    * div N` (the clamp keeps the one negative-division divergence
    * out).
    *
    * Scale: the x138 user-keyed lead window feeds a type²-bounded
    * matrix; everything after is type-sized.
    *
    * Returns `(from_type, n, entropy_micros)`.
    */
  def transitionEntropy(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    transitionEntropyFromMatrix(
      pairs.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n")))
  }

  /** The x161 entropy reduction over an ALREADY-COUNTED transition
    * matrix `(from_type, to_type, n)` — ONE spelling shared by the
    * batch op above and the online twin's assembly (sum the
    * max-version `EventStreams.transitionsOnline` rows per pair, then
    * call this), so the x149 quantization contract cannot drift.
    */
  private[graft] def transitionEntropyFromMatrix(matrix: DataFrame)
      : DataFrame =
    matrix
      .withColumn("_q",
        floor(col("n").cast("double") * log(col("n").cast("double"))
          * 1e6 + 0.5).cast(LongType))
      .groupBy(col("from_type"))
      .agg(sum(col("n")).as("n"), sum(col("_q")).as("_qs"))
      .withColumn("_hn",
        floor(col("n").cast("double") * log(col("n").cast("double"))
          * 1e6 + 0.5).cast(LongType))
      .select(col("from_type"), col("n"),
        expr("greatest(_hn - _qs, 0L) div n").as("entropy_micros"))

  def userEntropyReport(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val ut = events.groupBy(col(userCol).as("_u"),
        col(typeCol).as("_t"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_q",
        floor(col("_c").cast("double") * log(col("_c").cast("double"))
          * 1e6 + 0.5).cast(LongType))
    val per = ut.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_n"), sum(col("_q")).as("_qs"))
      .withColumn("_hn",
        floor(col("_n").cast("double") * log(col("_n").cast("double"))
          * 1e6 + 0.5).cast(LongType))
      .withColumn("entropy_micros",
        expr("greatest(_hn - _qs, 0L) div _n"))
    per.withColumn("bucket", expr("entropy_micros div 50000"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), sum(col("_n")).as("total_events"))
      .select(col("bucket"), col("n_users"), col("total_events"),
        (col("bucket") * 50000L).as("lo_micros"),
        (col("bucket") * 50000L + 49999L).as("hi_micros"))
  }

  /** Entry-type conversion lift — first-touch attribution's simplest
    * honest form: group users by the TYPE OF THEIR FIRST EVENT (the
    * acquisition channel proxy) and report each entry type's
    * conversion rate to `target` against the corpus baseline. Lift
    * far from 10⁶ says the entry surface routes conversion; ~10⁶
    * says it doesn't matter.
    *
    * Determinism: the first event is the MIN of (ts, id, type)
    * structs — the (ts, id) total order every event op uses, spelled
    * as ONE map-side-combinable struct-min (no window, no shuffle of
    * raw events beyond the user-keyed aggregate); conversion is a
    * max-flag aggregate; rates/lift are exact BIGINT floor divisions
    * against a broadcast one-row totals frame.
    *
    * Long headroom: `n_converted · total_users · 10⁶` caps the exact
    * path at ~10⁶ users per entry type with 10⁶ converted — far past
    * the fixture; above that, sample users first (the x29/x112
    * convention).
    *
    * Returns `(entry_type, n_users, n_converted, conv_micros,
    * lift_micros)`; `lift_micros` NULL when nobody converted.
    */
  def entryTypeLift(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, target: String): DataFrame = {
    val per = events
      .groupBy(col(userCol))
      .agg(min(struct(col(tsCol), col(idCol), col(typeCol)))
          .as("_first"),
        max((col(typeCol) === target).cast(LongType)).as("_conv"))
      .select(col("_first").getField(typeCol).as("entry_type"),
        col("_conv"))
    entryLiftPublish(per)
  }

  /** The x162 publish tail over per-user `(entry_type, _conv)` rows —
    * ONE spelling shared by the batch op above and the online twin's
    * assembly (`EventStreams.entryTypeOnline`), so the published
    * rate/lift arithmetic cannot drift.
    */
  private[graft] def entryLiftPublish(per: DataFrame): DataFrame = {
    val tot = per.agg(count(lit(1)).as("_tu"), sum(col("_conv")).as("_tc"))
    per.groupBy("entry_type")
      .agg(count(lit(1)).as("n_users"), sum(col("_conv")).as("n_converted"))
      .crossJoin(broadcast(tot))
      .select(col("entry_type"), col("n_users"), col("n_converted"),
        expr("(n_converted * 1000000) div n_users").as("conv_micros"),
        when(col("_tc") > 0L,
          expr("(n_converted * _tu * 1000000) div (n_users * _tc)"))
          .as("lift_micros"))
  }

  /** Repeat-interval spectrum — x142's base-2 gap histogram restricted
    * to CONSECUTIVE `target` events per user (purchase-to-purchase
    * cadence): the repeat-behavior gauge x158's first-conversion lag
    * cannot see. Order is the full-precision (ts, id) pair; gaps are
    * truncated-second differences (the x142/x158 contract).
    *
    * Scale: the corpus is filtered to `target` rows BEFORE the
    * user-keyed lag window — the window partition carries only each
    * user's target events.
    *
    * Returns `(bucket, n_gaps, lo_s, hi_s)`.
    */
  def repeatIntervalSpectrum(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      target: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val s = unix_timestamp(col(tsCol).cast(TimestampType))
    val gaps = events.filter(col(typeCol) === target)
      .select(col(userCol), col(tsCol), col(idCol), s.as("_s"))
      .withColumn("_prev", lag(col("_s"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select((col("_s") - col("_prev")).as("_dt"))
    val bucket = when(col("_dt") <= 0L, lit(0L))
      .otherwise(length(bin(col("_dt"))).cast(LongType))
    lagSpectrumPublish(gaps.select(bucket.as("bucket")),
      countName = "n_gaps")
  }

  /** Session entry→exit matrix — the navigation fingerprint: gap-
    * sessionize (the q25/x152 convention — id order, 10-minute
    * inactivity), take each session's FIRST and LAST event type, and
    * publish the (entry_type, exit_type) count matrix with x138's
    * exact row normalization. Where x138 reads single-step routing,
    * this reads whole-VISIT routing: which surface people arrive on
    * and where the visit dies.
    *
    * Determinism: entry/exit are struct-min/struct-max over (id,
    * type) within the session — event ids are unique, so both are
    * total; counts BIGINT, shares one floor division.
    *
    * Scale: the ONE user-keyed sessionization exchange (shared lag +
    * running-sum windows), a (user × session)-keyed aggregate, then
    * a type²-bounded matrix — the x138 tail.
    *
    * Returns `(entry_type, exit_type, n, p_micros)`.
    */
  def sessionEntryExit(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = sessionized(events, userCol, tsCol, idCol, gapUs,
        Seq(typeCol))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(struct(col(idCol), col(typeCol))).as("_in"),
        max(struct(col(idCol), col(typeCol))).as("_out"))
      .select(col("_in").getField(typeCol).as("entry_type"),
        col("_out").getField(typeCol).as("exit_type"))
    val w = Window.partitionBy(col("entry_type"))
    per.groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("_tot", sum(col("n")).over(w))
      .select(col("entry_type"), col("exit_type"), col("n"),
        expr("(n * 1000000) div _tot").as("p_micros"))
  }

  /** Session-length conversion lift — does visit DEPTH buy
    * conversion: per exact session event count, how many sessions
    * contain a `target` event, the rate in micros, and the lift
    * against the all-sessions baseline (the x162 rate/lift
    * arithmetic keyed by x152's session length instead of entry
    * type). Flat lift across lengths says depth is engagement
    * theater; sharply rising says the funnel needs the long visits.
    *
    * Determinism: the q25/x152 sessionization (id order, gap break),
    * a max-flag per session, exact BIGINT floor divisions.
    *
    * Scale: the one user-keyed sessionization exchange, a (user ×
    * session) aggregate, a length-bounded rollup, a broadcast
    * totals frame. Long headroom as x162.
    *
    * Returns `(n_events, n_sessions, n_converted, conv_micros,
    * lift_micros)`; `lift_micros` NULL when no session converted.
    */
  def sessionConversionByLength(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, target: String,
      gapUs: Long = 600000000L): DataFrame = {
    val dist = sessionized(events, userCol, tsCol, idCol, gapUs,
        Seq(typeCol))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        max((col(typeCol) === target).cast(LongType)).as("_conv"))
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("_conv")).as("n_converted"))
    val tot = dist.agg(sum(col("n_sessions")).as("_ts"),
      sum(col("n_converted")).as("_tc"))
    dist.crossJoin(broadcast(tot))
      .select(col("n_events"), col("n_sessions"), col("n_converted"),
        expr("(n_converted * 1000000) div n_sessions")
          .as("conv_micros"),
        when(col("_tc") > 0L,
          expr("(n_converted * _ts * 1000000) div (n_sessions * _tc)"))
          .as("lift_micros"))
  }

  /** Hopping (sliding) window activity profile — per overlapping
    * time window of `lengthSec` seconds advancing every `hopSec`
    * seconds, the exact event count and distinct-user count per event
    * type. The smoothing view q20's tumbling grid cannot give: a
    * burst straddling a tumbling boundary splits into two half-counts,
    * while every hop that covers it sees it whole. Uses Spark's
    * native `window()` expression (the same operator Structured
    * Streaming runs with a watermark), so the batch spelling here IS
    * the streaming spelling.
    *
    * Semantics: windows are epoch-aligned — starts are the multiples
    * of `hopSec` with `start ≤ t < start + lengthSec`; each event
    * lands in exactly `lengthSec/hopSec` windows. `lengthSec` must be
    * a multiple of `hopSec` (Spark would otherwise emit partial
    * windows at fractional offsets — rejected here to keep the
    * contract enumerable).
    *
    * Determinism: window assignment is pure integer arithmetic on
    * epoch micros; counts are exact BIGINTs; distinct users are exact
    * (both engines drop NULL users from COUNT(DISTINCT)). The window
    * start publishes as TIMESTAMP (the q15/q20/x130 convention).
    *
    * Scale: the expansion is a bounded `lengthSec/hopSec`× row blowup
    * (2× at the default), then ONE map-side-combinable (window × type)
    * aggregate; distinct-user dedup shuffles (window, type, user) id
    * rows only. No window functions, no per-user state. The published
    * table is calendar-bounded: one row per (hop grid slot × type).
    *
    * Returns `(window_start TIMESTAMP, event_type, n_events BIGINT,
    * n_users BIGINT)`.
    */
  def hoppingProfile(events: DataFrame, tsCol: String,
      userCol: String, typeCol: String, lengthSec: Int = 600,
      hopSec: Int = 300): DataFrame = {
    require(lengthSec > 0 && hopSec > 0 && lengthSec % hopSec == 0,
      s"window length ($lengthSec s) must be a positive multiple of " +
        s"the hop ($hopSec s)")
    events
      .select(window(col(tsCol).cast(TimestampType),
          s"$lengthSec seconds", s"$hopSec seconds").as("_w"),
        col(typeCol).as("event_type"), col(userCol).as("_u"))
      .groupBy(col("_w.start").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("_u")).as("n_users"))
  }

  /** RFM user segmentation — the classic CRM cut: per user, Recency
    * (days since their last active day, measured from the corpus's
    * last active day), Frequency (their event count), and Monetary
    * (their exact summed `valueCol` over `target`-type events, in
    * micros). Each metric is split at its corpus lower median, and
    * the report publishes the 8-cell segment grid: per
    * (r_stale, f_hi, m_hi) bit triple, the user count, their total
    * event volume, and their total monetary micros. The cell
    * (0, 1, 1) — recent, busy, paying — is the retention core;
    * (1, 0, 0) is churn.
    *
    * Bit convention (one arithmetic for all three): a bit is 1 iff
    * the user's metric is STRICTLY ABOVE its corpus lower median —
    * so `r_stale = 1` means longer-ago-than-median (staleness rises
    * with the raw metric), `f_hi`/`m_hi` mean above-median activity
    * and spend.
    *
    * Determinism: days are exact epoch-day floor divisions (the x154
    * convention); monetary sums route through DECIMAL(18,6) (exact,
    * order-independent — the x128 money convention) and publish as
    * integer micros; the lower median of each metric is the value at
    * rank `(n+1) div 2` in the ascending (metric, user id) total
    * order — selected WITHOUT a global window via the two-pass
    * [[PrefixSum.withPosition]] ordinal (the scale-sound spelling of
    * `ROW_NUMBER()` with no PARTITION BY, which Spark would otherwise
    * run on one partition). Users with no target-type spend hold
    * monetary 0 (not NULL) so the median is over all users.
    *
    * Scale: the corpus collapses FIRST to the user-sized RFM frame
    * (one map-side-combinable aggregate + one broadcast one-row
    * corpus-max frame); each median is a distributed sort of that
    * user frame + the O(#partitions) offset scan; the three
    * single-row median frames broadcast back onto the user frame; the
    * published grid is 8 rows. Nothing bigger than the user frame
    * ever shuffles.
    *
    * Returns `(r_stale, f_hi, m_hi, n_users, sum_events,
    * sum_monetary_micros)` — all BIGINT.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, target: String): DataFrame = {
    val base = events.select(col(userCol).as("_u"),
      expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
        .as("_d"),
      when(col(typeCol) === target && col(valueCol).isNotNull,
        col(valueCol)).otherwise(lit(0.0)).cast(DecimalType(18, 6))
        .as("_v"))
    val corpMax = base.agg(max(col("_d")).as("_cd"))
    val rfm = base.groupBy("_u")
      .agg(max(col("_d")).as("_ud"), count(lit(1)).as("freq"),
        (sum(col("_v")) * lit(1000000L)).cast(LongType)
          .as("mon_micros"))
      .crossJoin(broadcast(corpMax))
      .select(col("_u"), (col("_cd") - col("_ud")).as("rec_days"),
        col("freq"), col("mon_micros"))
      // lazy barrier: the three median passes and the final grid all
      // consume this user-sized frame — without it each consumer
      // re-runs the corpus aggregate (measured 7.6 s -> the barrier
      // collapses the 10x fixture to one corpus scan)
      .localCheckpoint(eager = false)
    val meds = lowerMedianOf(rfm, "rec_days", "_u", "_mr")
      .crossJoin(broadcast(lowerMedianOf(rfm, "freq", "_u", "_mf")))
      .crossJoin(broadcast(lowerMedianOf(rfm, "mon_micros", "_u", "_mm")))
    rfm.crossJoin(broadcast(meds))
      .groupBy((col("rec_days") > col("_mr")).cast(LongType)
          .as("r_stale"),
        (col("freq") > col("_mf")).cast(LongType).as("f_hi"),
        (col("mon_micros") > col("_mm")).cast(LongType).as("m_hi"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("freq")).as("sum_events"),
        sum(col("mon_micros")).as("sum_monetary_micros"))
  }

  /** Second-order event-type transition report — the Markov-2 view
    * over x138's first-order matrix: per user in the (ts, id) total
    * order, every consecutive TRIPLE becomes one (prev2, prev1, next)
    * transition, published with the exact count and the
    * context-normalized probability in micros (`n · 10⁶ div
    * Σ_next n` within each (prev2, prev1) context). Read against
    * x138: where P(next | prev1) ≈ P(next | prev2, prev1) the process
    * is genuinely first-order and x138's matrix is the whole model;
    * where they diverge, single-step transition tooling (and any
    * session-stitching built on it) is dropping real signal.
    *
    * Determinism: the x138 contract verbatim — tie-free (ts, id)
    * order, exact BIGINT counts, one floor division with non-negative
    * operands.
    *
    * Scale: ONE user-keyed exchange feeds both lag windows (same
    * partition+order — one WindowExec), triples partial-aggregate
    * map-side to the type³-bounded matrix, and the context
    * normalization is a window over that matrix — type³-sized, never
    * corpus-sized. A power user bounds a task at their own event
    * count (the q8/q9 partitioned shape).
    *
    * Returns `(prev2_type, prev1_type, next_type, n BIGINT,
    * p_micros BIGINT)`.
    */
  def transition2Report(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val triples = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("next_type"))
      .withColumn("prev1_type", lag(col("next_type"), 1).over(w))
      .withColumn("prev2_type", lag(col("next_type"), 2).over(w))
      .filter(col("prev2_type").isNotNull)
    val m = triples.groupBy(col("prev2_type"), col("prev1_type"),
        col("next_type"))
      .agg(count(lit(1)).as("n"))
    val ctx = Window.partitionBy(col("prev2_type"), col("prev1_type"))
    m.withColumn("_tot", sum(col("n")).over(ctx))
      .select(col("prev2_type"), col("prev1_type"), col("next_type"),
        col("n"), expr("(n * 1000000) div _tot").as("p_micros"))
  }

  /** Weekly cohort value curves — x130's retention matrix upgraded
    * from presence to VALUE: users cohort by the ISO week of their
    * first event, and the report publishes, per (cohort week, age in
    * whole weeks), the distinct active users, the exact monetary
    * micros booked that week, and the cohort's cumulative micros
    * through that age — the LTV curve read cohort-over-cohort to see
    * whether newer cohorts monetize faster.
    *
    * Determinism: `date_trunc('week')` is Monday-aligned in both
    * engines; the age is an exact integer `datediff div 7` of two
    * week-truncated days; value sums route through DECIMAL(18,6)
    * (the x128 money convention — exact and order-independent, NULL
    * values drop from SUM in both engines) and publish as integer
    * micros; the cumulative is a running BIGINT sum over the already
    * aggregated matrix. The cohort week publishes as TIMESTAMP
    * (q15/q20/x130 convention).
    *
    * Scale: one user-keyed first-week aggregate (map-side
    * combinable), a co-partitioned user-keyed join back onto the
    * event stream (id+week+decimal rows only — no payload), one
    * (cohort × age) aggregate, and the cumulative window runs
    * PARTITIONED BY cohort over the calendar-bounded matrix (weeks ×
    * weeks rows), never the corpus.
    *
    * Returns `(cohort_week TIMESTAMP, age_weeks BIGINT,
    * n_active_users BIGINT, value_micros BIGINT,
    * cum_value_micros BIGINT)`.
    */
  def cohortValueCurves(events: DataFrame, userCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(userCol).as("_u"),
      date_trunc("week", col(tsCol).cast(TimestampType)).as("_w"),
      coalesce(col(valueCol), lit(0.0)).cast(DecimalType(18, 6))
        .as("_v"))
    val first = base.groupBy("_u").agg(min(col("_w")).as("cohort_week"))
    val m = base.join(first, "_u")
      .withColumn("age_weeks",
        expr("CAST(datediff(_w, cohort_week) AS BIGINT) div 7"))
      .groupBy(col("cohort_week"), col("age_weeks"))
      .agg(countDistinct(col("_u")).as("n_active_users"),
        (sum(col("_v")) * lit(1000000L)).cast(LongType)
          .as("value_micros"))
    val cum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_weeks").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.withColumn("cum_value_micros",
      sum(col("value_micros")).over(cum).cast(LongType))
  }

  /** Lower median of `metric` over a bounded frame, selected WITHOUT a
    * global window: the frame distributed-sorts on (metric, tie) and
    * the rank-(n+1)div2 row is picked by the two-pass
    * [[PrefixSum.withPosition]] ordinal (count job + per-partition
    * offsets — the scale-sound spelling of `ROW_NUMBER()` with no
    * PARTITION BY, which Spark would otherwise run on one partition).
    * Shared by [[rfmSegments]] and [[dailyAnomaly]] so the median
    * convention cannot drift between the RFM splits and the MAD gate.
    * Returns a one-row frame `(as)`.
    */
  private def lowerMedianOf(df: DataFrame, metric: String,
      tie: String, as: String): DataFrame = {
    val sorted = df.select(col(metric), col(tie))
      .sort(col(metric).asc, col(tie).asc)
    val pos = PrefixSum.withPosition(sorted, "_pos")
    val n = pos.agg(count(lit(1)).as("_n"))
    pos.crossJoin(broadcast(n))
      .filter(col("_pos") + 1L === expr("(_n + 1) div 2"))
      .select(col(metric).as(as))
  }

  /** Daily-volume anomaly report — the robust outlier gate an
    * ingestion pipeline runs before trusting a day's data: per
    * calendar day, the event count, its signed deviation from the
    * corpus's median daily count, and the MAD-normalized robust
    * z-score (`|dev| · 10⁶ div MAD` — the median-absolute-deviation
    * analogue of 0.6745·|x−med|/MAD, left unscaled so the arithmetic
    * stays integer-exact), flagged at the conventional 3.5 threshold
    * (z_micros > 3 500 000). Median/MAD, not mean/stddev: one
    * double-volume backfill day shifts a mean gate's own baseline;
    * the median gate flags it and leaves the baseline untouched.
    *
    * Degenerate guard: MAD = 0 (at least half the days share the
    * median count) publishes NULL z and flags exactly the days whose
    * count differs from the median — the strictest consistent gate,
    * spelled identically in the oracle.
    *
    * Determinism: day truncation and counts are exact; both medians
    * use the repo's lower-median convention (rank (n+1) div 2 over
    * the (metric, day) total order — the x174 split arithmetic); the
    * z is one floor division of non-negative BIGINTs.
    *
    * Scale: ONE map-side-combinable daily aggregate collapses the
    * corpus to a calendar-bounded day frame; both medians are
    * distributed sorts of THAT frame (never the corpus) via the
    * shared [[lowerMedianOf]]; the one-row median frames broadcast
    * back. No corpus-sized window, join, or collect.
    *
    * Returns `(day TIMESTAMP, n_events BIGINT, dev BIGINT,
    * z_micros BIGINT — NULL when MAD = 0, is_anomaly BIGINT)`.
    */
  def dailyAnomaly(events: DataFrame, tsCol: String,
      zThresholdMicros: Long = 3500000L): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol).cast(TimestampType))
        .as("day"))
      .agg(count(lit(1)).as("n_events"))
      // lazy barrier (the x174 pattern): the median pass, the
      // deviation frame, and the publish all consume this
      // calendar-bounded frame — one corpus scan, not four
      .localCheckpoint(eager = false)
    val med = lowerMedianOf(daily, "n_events", "day", "_med")
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("dev", col("n_events") - col("_med"))
      .withColumn("_ad", abs(col("dev")))
      .localCheckpoint(eager = false)
    val mad = lowerMedianOf(dev, "_ad", "day", "_mad")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"), col("dev"),
        when(col("_mad") > 0L,
          expr("(_ad * 1000000) div _mad")).as("z_micros"),
        when(col("_mad") > 0L,
          (expr("(_ad * 1000000) div _mad") > zThresholdMicros)
            .cast(LongType))
          .otherwise((col("dev") =!= 0L).cast(LongType))
          .as("is_anomaly"))
  }

  /** Benford first-digit audit — the fabrication/synthetic-data smell
    * test on a positive value column: the distribution of first
    * significant digits of `valueCol`, against Benford's law
    * (P(d) = log₁₀(1 + 1/d)). Organic multiplicative quantities
    * (transaction amounts, populations) track the curve; uniform
    * synthetic fills and fabricated figures don't — a large positive
    * `dev_micros` on digits 5–9 is the classic tell.
    *
    * Digit extraction is INTEGER arithmetic, not float log10: the
    * value routes through the x128 money convention
    * (`CAST(v AS DECIMAL(18,6)) · 10⁶ → BIGINT` — exact micros), and
    * the first digit is the leading character of that positive
    * BIGINT's decimal rendering. A float `log10` spelling would risk
    * last-ulp digit flips at powers of ten across libm
    * implementations; strings of integers cannot disagree. Benford
    * expectations ship as frozen integer micros (⌊log₁₀(1+1/d)·10⁶⌋ —
    * plan literals, identical in the oracle), so the report carries
    * no transcendental arithmetic at all. NULL and non-positive
    * values are excluded (Benford is defined on positive magnitudes);
    * every digit row publishes even at zero count.
    *
    * Determinism: exact counts; shares/deviations are floor
    * divisions; the empty-corpus guard publishes zero shares.
    *
    * Scale: one stateless projection into a 9-row-bounded aggregate;
    * the one-row total and the 9-row expectation table ride
    * broadcasts. Nothing corpus-sized shuffles but the digit rollup's
    * partial aggregates.
    *
    * Returns `(digit BIGINT, n BIGINT, share_micros BIGINT,
    * benford_micros BIGINT, dev_micros BIGINT)`.
    */
  def benfordAudit(events: DataFrame, valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val vm = events.filter(col(valueCol).isNotNull)
      .select((col(valueCol).cast(DecimalType(18, 6)) * lit(1000000L))
        .cast(LongType).as("_vm"))
      .filter(col("_vm") > 0L)
      .select(substring(col("_vm").cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
    val counts = vm.groupBy("digit").agg(count(lit(1)).as("_n"))
    val total = counts.agg(coalesce(sum(col("_n")), lit(0L)).as("_tot"))
    // frozen integer expectations: floor(log10(1 + 1/d) * 1e6)
    val expect = Seq(1L -> 301029L, 2L -> 176091L, 3L -> 124938L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66946L, 7L -> 57991L,
      8L -> 51152L, 9L -> 45757L)
      .toDF("digit", "benford_micros")
    expect.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("_n"), lit(0L)).as("n"),
        when(col("_tot") > 0L,
          expr("(coalesce(_n, 0) * 1000000) div _tot"))
          .otherwise(0L).as("share_micros"),
        col("benford_micros"))
      .withColumn("dev_micros",
        col("share_micros") - col("benford_micros"))
  }

  /** Calendar-densified daily activity — the gap-visible time series a
    * monitoring layer reads instead of the raw daily rollup: every
    * day from the corpus's first to its last appears exactly once,
    * with exact event and distinct-user counts, and zero-count days
    * flagged (`is_gap`) — a silent ingestion outage is a ROW here,
    * not an absence the reader must infer by differencing dates.
    *
    * Determinism: day truncation is exact; the grid is
    * `sequence(min_day, max_day, 1 day)` on UTC-midnight timestamps
    * (the session pins UTC, so the step is exactly 86 400 s — no DST
    * fold); counts are exact BIGINTs.
    *
    * Scale: the corpus collapses in ONE map-side-combinable daily
    * aggregate (distinct users shuffle (day, user) id rows); the
    * grid explodes from a one-row bounds frame and is
    * calendar-bounded (decades ≈ 10⁴ rows), so the grid ⋈ daily join
    * is trivially broadcastable — never corpus-sized.
    *
    * Returns `(day TIMESTAMP, n_events BIGINT, n_users BIGINT,
    * is_gap BIGINT)`.
    */
  def calendarDensify(events: DataFrame, tsCol: String,
      userCol: String): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol).cast(TimestampType))
        .as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"))
      // lazy barrier: bounds aggregate + grid join both read this
      // calendar-bounded frame
      .localCheckpoint(eager = false)
    val grid = daily.agg(min(col("day")).as("_d0"),
        max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"),
        expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        col("n_events").isNull.cast(LongType).as("is_gap"))
  }

  /** Daily peak session concurrency — the capacity-planning number:
    * per calendar day, how many gap-sessions (10-minute inactivity,
    * the q25/x152 convention) were simultaneously open at the day's
    * busiest instant, by the classic sweep line — +1 at each
    * session's start, −1 at its end, peak = max running sum. Sessions
    * CLIP to day boundaries (a span crossing midnight contributes its
    * in-day segment to each day), so a day's report is self-contained.
    *
    * Overlap convention: endpoints are inclusive — a session ending
    * at instant t overlaps one starting at t (ties order +1 before
    * −1, then (user, session) for a total order). A zero-duration
    * session (one event) still counts 1 at its instant. The day-max
    * is invariant to the residual ordering freedom inside an equal-
    * (t, delta) run: consecutive +1s only reorder intermediate
    * prefixes below the run's final value, and a −1 run's max is its
    * entry value.
    *
    * Determinism: epoch-micro integer arithmetic end to end; the
    * running sum is a day-partitioned window over the tie-free total
    * order.
    *
    * Scale: sessionization is the shared user-keyed window pass; the
    * corpus collapses to a (user × session) frame before the sweep;
    * the sweep window partitions by DAY — a task is bounded by one
    * day's session count, the same per-partition bound the daily
    * rollups carry (a deployment needing tighter bounds clips to
    * hours by changing one constant). Published table is
    * calendar-bounded.
    *
    * Returns `(day TIMESTAMP, n_sessions BIGINT,
    * peak_concurrency BIGINT)`.
    */
  def peakConcurrency(events: DataFrame, userCol: String,
      tsCol: String, idCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val sess = sessionized(events, userCol, tsCol, idCol, gapUs, Nil)
      .groupBy(col(userCol).as("_u"), col("session_idx"))
      .agg(min(col("tus")).as("_t0"), max(col("tus")).as("_t1"))
    val spans = sess
      .withColumn("_day", explode(sequence(
        expr(s"_t0 div $dayUs"), expr(s"_t1 div $dayUs"))))
      .select(col("_day"), col("_u"), col("session_idx"),
        greatest(col("_t0"), col("_day") * dayUs).as("_s"),
        least(col("_t1"), (col("_day") + 1L) * dayUs - 1L).as("_e"))
      // lazy barrier: both endpoint projections read the clipped spans
      .localCheckpoint(eager = false)
    val pts = spans.select(col("_day"), col("_s").as("_t"),
        lit(1L).as("_delta"), col("_u"), col("session_idx"))
      .unionByName(spans.select(col("_day"), col("_e").as("_t"),
        lit(-1L).as("_delta"), col("_u"), col("session_idx")))
    val sweep = Window.partitionBy(col("_day"))
      .orderBy(col("_t").asc, col("_delta").desc, col("_u").asc,
        col("session_idx").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("_run", sum(col("_delta")).over(sweep))
      .groupBy(col("_day"))
      .agg((count(lit(1)) / 2L).cast(LongType).as("n_sessions"),
        max(col("_run")).cast(LongType).as("peak_concurrency"))
      .select(timestamp_micros(col("_day") * dayUs).as("day"),
        col("n_sessions"), col("peak_concurrency"))
  }

  /** Event-type audience overlap matrix — which feature audiences are
    * the same people: per unordered type pair, the exact distinct-user
    * intersection and the Jaccard overlap in floor-division micros
    * (`|A∩B| · 10⁶ div |A∪B|`). Read next to x155's SESSION
    * co-occurrence lift: x155 says types fire together in time; this
    * says audiences coincide at all — a high-lift low-Jaccard pair is
    * a niche ritual, a low-lift high-Jaccard pair two habits of the
    * same crowd.
    *
    * Determinism: exact distinct counts (NULL users excluded — the
    * COUNT(DISTINCT) convention both engines share); the union size
    * is |A| + |B| − |A∩B| by inclusion–exclusion; one floor division.
    * Pairs with ZERO overlap are absent (the matrix publishes only
    * pairs the user-keyed join materializes — at type² grain the
    * reader infers absence as 0, and the publish never densifies).
    *
    * Scale: the corpus collapses FIRST to the distinct (type, user)
    * frame (map-side combinable); the pair join is a user-keyed
    * self-join of that frame — co-partitioned on the user key, each
    * user contributing at most type² pair rows (type count is small
    * and bounded); per-type audience sizes are a type-bounded
    * broadcast. Published matrix is type²-bounded.
    *
    * Returns `(type_a, type_b, n_both BIGINT, jaccard_micros
    * BIGINT)`.
    */
  def audienceOverlap(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val tu = events.filter(col(userCol).isNotNull)
      .select(col(typeCol).as("_t"), col(userCol).as("_u"))
      .distinct()
      // lazy barrier: the size rollup and both self-join sides read
      // this (type, user)-sized frame
      .localCheckpoint(eager = false)
    val sizes = tu.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val pairs = tu.as("a")
      .join(tu.as("b"), col("a._u") === col("b._u") &&
        col("a._t") < col("b._t"))
      .groupBy(col("a._t").as("type_a"), col("b._t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("_t").as("type_a"),
        col("_n").as("_na"))), "type_a")
      .join(broadcast(sizes.select(col("_t").as("type_b"),
        col("_n").as("_nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr("(n_both * 1000000) div (_na + _nb - n_both)")
          .as("jaccard_micros"))
  }

  /** Weekday × hour activity heatmap — the seasonality grid behind
    * x153's hour-of-day profile: per (day-of-week, hour) cell, the
    * exact event count, its share of total traffic, and the lift
    * against the uniform 1/168 cell — lift well above 10⁶ marks the
    * weekly rush, far below it the maintenance window.
    *
    * Day-of-week is PURE INTEGER arithmetic, immune to engine
    * conventions: `dow = (epoch_day + 4) mod 7` with 0 = Sunday
    * (1970-01-01 was a Thursday), and the hour is
    * `(epoch_micros div 3600·10⁶) mod 24` — no `dayofweek()`/
    * `date_part` calls whose origin differs per engine. Shares and
    * lifts are floor divisions; `lift = n · 168 · 10⁶ div total`.
    *
    * Scale: one stateless projection into a 168-cell-bounded
    * aggregate; the one-row total broadcasts. Nothing else moves.
    *
    * Returns `(dow BIGINT 0=Sunday, hour BIGINT, n BIGINT,
    * share_micros BIGINT, lift_micros BIGINT)`.
    */
  def weekHeatmap(events: DataFrame, tsCol: String): DataFrame = {
    val cells = events
      .select(unix_micros(col(tsCol).cast(TimestampType)).as("_tus"))
      .select(pmod(expr("_tus div 86400000000") + 4L, lit(7L))
          .as("dow"),
        pmod(expr("_tus div 3600000000"), lit(24L)).as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum(col("n")).as("_tot"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n"),
        expr("(n * 1000000) div _tot").as("share_micros"),
        expr("(n * 168 * 1000000) div _tot").as("lift_micros"))
  }

  /** Transition latency report — how long each step of the journey
    * takes: per ordered (prev_type → next_type) pair in the per-user
    * (ts, id) event order, the exact transition count, the mean gap
    * in floor-division micros, and the largest observed gap. Read
    * against x138's transition PROBABILITIES: a likely-but-slow edge
    * is a friction point; an unlikely-but-instant one is usually a
    * client burst, not a decision.
    *
    * Determinism: the x138 contract — tie-free (ts, id) order, exact
    * epoch-micro gaps (same-timestamp transitions contribute 0),
    * BIGINT sums, one floor division for the mean.
    *
    * Long headroom: `sum(gap)` per pair caps at ~9.2e18 µs ≈ 292k
    * user-years per pair — beyond any event corpus's total on-screen
    * time; no sampling convention needed.
    *
    * Scale: ONE user-keyed exchange feeds the lag window (a power
    * user bounds a task at their own event count — the q8/q9 shape),
    * then the pairs partial-aggregate map-side to the type²-bounded
    * matrix. The publish is type²-sized.
    *
    * Returns `(prev_type, next_type, n BIGINT, mean_gap_micros
    * BIGINT, max_gap_micros BIGINT)`.
    */
  def transitionLatency(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (_tus, id) orders identically to (ts, id): unix_micros is
    // strictly monotone on timestamps
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_tus").asc, col(idCol).asc)
    events
      .select(col(userCol), col(idCol),
        unix_micros(col(tsCol).cast(TimestampType)).as("_tus"),
        col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .withColumn("_gap", col("_tus") - lag(col("_tus"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"), sum(col("_gap")).as("_sg"),
        max(col("_gap")).as("max_gap_micros"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("_sg div n").as("mean_gap_micros"),
        col("max_gap_micros"))
  }

  /** Session survival curve — x152's distribution read as the
    * engagement funnel: per observed session length k (events), how
    * many sessions reached AT LEAST k events and that count's share
    * of all sessions in floor-division micros. The curve's decay rate
    * is the product-health number the raw histogram hides: survival
    * at k=2 is "did anyone do a second thing".
    *
    * Determinism: the shared q25-convention sessionization (exact
    * windows), exact counts; the suffix accumulation runs over the
    * session-length-bounded histogram in the (length DESC) total
    * order via the two-pass [[PrefixSum.withRunningLongSum]] — the
    * scale-sound spelling of an unpartitioned running sum (sort +
    * broadcast partition offsets, no single-partition window).
    *
    * Scale: the corpus collapses through the user-keyed session
    * window to a (user × session) frame, then to the length histogram
    * (≲ hundreds of rows); the suffix sum and the share division run
    * on THAT. One corpus-sized exchange total.
    *
    * Returns `(n_events BIGINT, n_sessions BIGINT, n_reached BIGINT,
    * survival_micros BIGINT)`.
    */
  def sessionSurvival(events: DataFrame, userCol: String,
      tsCol: String, idCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    val hist = sessionized(events, userCol, tsCol, idCol, gapUs, Nil)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("_neg", -col("n_events"))
      // lazy barrier: the suffix sum and the total both read this
      // length-bounded histogram — one sessionization pass, not two
      .localCheckpoint(eager = false)
    val suffixed = PrefixSum.withRunningLongSum(hist,
      Seq("_neg"), "n_sessions", "n_reached")
    val total = hist.agg(sum(col("n_sessions")).as("_tot"))
    suffixed.crossJoin(broadcast(total))
      .select(col("n_events"), col("n_sessions"), col("n_reached"),
        expr("(n_reached * 1000000) div _tot").as("survival_micros"))
  }

  /** Event-props payload profile — the schema-drift audit on the
    * semi-structured column: per event type, the exact event count,
    * the share of events whose JSON `props` carries NO readable
    * integer `k` (NULL props, malformed JSON, or missing key — the
    * producer-bug signal when it moves), and the mean/min/max of `k`
    * where present. q17 sums `k`; this is the payload HEALTH view a
    * pipeline alerts on.
    *
    * Determinism: q17's proven-portable extraction (`from_json`
    * struct field ↔ `json_extract` + BIGINT cast — both NULL on
    * missing/malformed); exact BIGINT rollups; the mean is one floor
    * division guarded for all-null types (NULL mean, spelled
    * identically in the oracle).
    *
    * Scale: ONE stateless projection (codegen'd JSON path probe)
    * into a type-bounded map-side-combinable aggregate. No joins,
    * no windows.
    *
    * Returns `(event_type, n BIGINT, null_micros BIGINT,
    * mean_k_micros BIGINT — NULL when no k present, min_k BIGINT,
    * max_k BIGINT)`.
    */
  def propsProfile(events: DataFrame, propsCol: String,
      typeCol: String): DataFrame = {
    val k = from_json(col(propsCol),
      StructType(Seq(StructField("k", LongType)))).getField("k")
    events.select(col(typeCol).as("event_type"), k.as("_k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("_k").isNull.cast(LongType)).as("_nn"),
        sum(col("_k")).as("_sk"),
        min(col("_k")).as("min_k"), max(col("_k")).as("max_k"))
      .select(col("event_type"), col("n"),
        expr("(_nn * 1000000) div n").as("null_micros"),
        when(col("n") - col("_nn") > 0L,
          expr("(_sk * 1000000) div (n - _nn)")).as("mean_k_micros"),
        col("min_k"), col("max_k"))
  }

  /** Per-type value spectrum — the monetary distribution audit next
    * to x147's doc-length spectrum: event values route through the
    * x128 money convention (exact BIGINT micros), bucket by the bit
    * length of the positive micro amount (base-2 magnitude bands —
    * the x142/x147 grid; zero/negative amounts hold bucket 0), and
    * the report publishes exact counts and exact summed micros per
    * (type, bucket) cell. A type whose mass jumps a band
    * round-over-round repriced; a fat bucket-0 cell is the
    * refund/zero-fill signal.
    *
    * Determinism: the exact per-row decimal→micros cast, integer
    * bit-length buckets (`length(bin(v))` on positive BIGINTs — both
    * engines), exact sums. NULL values are excluded.
    *
    * Scale: ONE stateless projection into a (type × ≲60
    * bucket)-bounded map-side-combinable aggregate. No joins, no
    * windows.
    *
    * Returns `(event_type, bucket BIGINT, n BIGINT,
    * sum_value_micros BIGINT)`.
    */
  def valueSpectrum(events: DataFrame, typeCol: String,
      valueCol: String): DataFrame = {
    val vm = (col(valueCol).cast(DecimalType(18, 6)) * lit(1000000L))
      .cast(LongType)
    events.filter(col(valueCol).isNotNull)
      .select(col(typeCol).as("event_type"), vm.as("_vm"))
      .select(col("event_type"),
        when(col("_vm") <= 0L, 0L)
          .otherwise(length(bin(col("_vm"))).cast(LongType))
          .as("bucket"),
        col("_vm"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), sum(col("_vm")).as("sum_value_micros"))
  }

  /** Bounce rate by entry type — the landing-surface quality gauge
    * x167's entry→exit matrix implies but doesn't publish: per
    * session entry type, how many gap-sessions (q25 convention) died
    * after EXACTLY ONE event, as an exact floor-division share. A
    * high-bounce entry surface either answers instantly (good) or
    * repels (bad) — x172's depth-conversion lift is the tiebreaker.
    *
    * Determinism: the x167 contract — id-ordered sessionization,
    * struct-min entry type over unique ids, exact counts, one floor
    * division.
    *
    * Scale: the shared user-keyed sessionization exchange, a
    * (user × session) aggregate, a type-bounded rollup. Nothing else.
    *
    * Returns `(entry_type, n_sessions BIGINT, n_bounce BIGINT,
    * bounce_micros BIGINT)`.
    */
  def bounceRate(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    val per = sessionized(events, userCol, tsCol, idCol, gapUs,
        Seq(typeCol))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(struct(col(idCol), col(typeCol))).as("_in"),
        count(lit(1)).as("_len"))
      .select(col("_in").getField(typeCol).as("entry_type"),
        lit(1L).as("_n"),
        (col("_len") === 1L).cast(LongType).as("_b"))
    bouncePublish(per)
  }

  /** The [[bounceRate]] publish tail over `(entry_type, _n, _b)`
    * partial counts — factored out so the streaming twin's assembled
    * per-user partials publish through the IDENTICAL arithmetic
    * (StreamingSpec's x192 assembly).
    */
  def bouncePublish(per: DataFrame): DataFrame =
    per.groupBy(col("entry_type"))
      .agg(sum(col("_n")).as("n_sessions"), sum(col("_b")).as("n_bounce"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
        expr("(n_bounce * 1000000) div n_sessions")
          .as("bounce_micros"))

  /** Hourly conversion propensity — WHEN the corpus converts: per
    * hour of day (the x184 integer-arithmetic hour), the exact event
    * count, the `target`-type count, the conversion rate in micros,
    * and the lift against the all-hours baseline (the x162 rate/lift
    * arithmetic keyed by clock hour). A lift ridge at specific hours
    * is the send-time/staffing signal.
    *
    * Determinism: integer hour extraction, exact counts, the x162
    * floor-division lift. Long headroom: `n_target · total_n · 10⁶`
    * follows x162's documented convention — sample above ~3M-target
    * corpora (the product caps at ~9.2e18).
    *
    * Scale: ONE stateless projection into a 24-row-bounded aggregate;
    * the one-row totals broadcast. Returns all 24 hours that appear;
    * `lift_micros` is NULL when the corpus has no target events.
    *
    * Returns `(hour BIGINT, n BIGINT, n_target BIGINT, conv_micros
    * BIGINT, lift_micros BIGINT)`.
    */
  def hourlyConversion(events: DataFrame, tsCol: String,
      typeCol: String, target: String): DataFrame = {
    val per = events
      .select(pmod(expr(
          s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 3600000000"),
          lit(24L)).as("hour"),
        (col(typeCol) === target).cast(LongType).as("_t"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("_t")).as("n_target"))
      // lazy barrier: totals + publish share the 24-row frame
      .localCheckpoint(eager = false)
    val tot = per.agg(sum(col("n")).as("_tn"),
      sum(col("n_target")).as("_tt"))
    per.crossJoin(broadcast(tot))
      .select(col("hour"), col("n"), col("n_target"),
        expr("(n_target * 1000000) div n").as("conv_micros"),
        when(col("_tt") > 0L,
          expr("(n_target * _tn * 1000000) div (n * _tt)"))
          .as("lift_micros"))
  }

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition of every active count (the standard growth ledger;
    * x130's cohort matrix re-cut by adjacency): per Monday-aligned
    * week, the distinct actives split into NEW (first-ever week),
    * RETAINED (also active the previous week), and RESURRECTED
    * (active before, but not last week); plus `n_churned_next` — this
    * week's actives who do NOT return next week. The final week's
    * churn is right-censored (everyone "churns" from a week with no
    * successor data) — read it as an upper bound, the standard
    * caveat of the ledger.
    *
    * Determinism: `date_trunc('week')` Monday alignment (both
    * engines), exact 7-day timestamp arithmetic on UTC midnights (no
    * DST in the pinned UTC session), exact distinct counts;
    * `n_active = n_new + n_retained + n_resurrected` by construction.
    *
    * Scale: the corpus collapses to the distinct (user, week) frame
    * ONCE (map-side combinable), then three self-joins on the
    * (user, week±7d) key — co-partitioned user-keyed equi-joins of
    * id+timestamp rows, the x130 join shape — and a first-week
    * user-sized aggregate. The publish is calendar-bounded.
    *
    * Returns `(week TIMESTAMP, n_active, n_new, n_retained,
    * n_resurrected, n_churned_next — all BIGINT)`.
    */
  def growthAccounting(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    growthLedger(events
      .select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol).cast(TimestampType)).as("_w"))
      .distinct())

  /** The [[growthAccounting]] ledger tail over an already-distinct
    * `(_u, _w)` activity frame (`_w` Monday-aligned week TIMESTAMP) —
    * factored out so the streaming twin's assembled (user, week)
    * frame publishes through the IDENTICAL arithmetic
    * (StreamingSpec's x195 assembly).
    */
  def growthLedger(act0: DataFrame): DataFrame = {
    val act = act0
      // lazy barrier: the first-week aggregate and the three
      // adjacency joins all read this (user, week) frame
      .localCheckpoint(eager = false)
    val first = act.groupBy(col("_u")).agg(min(col("_w")).as("_f"))
    val prev = act.select(col("_u"),
      (col("_w") + expr("INTERVAL 7 DAYS")).as("_w"),
      lit(1L).as("_wasPrev"))
    val next = act.select(col("_u"),
      (col("_w") - expr("INTERVAL 7 DAYS")).as("_w"),
      lit(1L).as("_hasNext"))
    act
      .join(first, "_u")
      .join(prev, Seq("_u", "_w"), "left")
      .join(next, Seq("_u", "_w"), "left")
      .select(col("_w").as("week"),
        when(col("_w") === col("_f"), 1L).otherwise(0L).as("_new"),
        when(col("_w") =!= col("_f") && col("_wasPrev").isNotNull, 1L)
          .otherwise(0L).as("_ret"),
        when(col("_w") =!= col("_f") && col("_wasPrev").isNull, 1L)
          .otherwise(0L).as("_res"),
        col("_hasNext").isNull.cast(LongType).as("_ch"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"), sum(col("_new")).as("n_new"),
        sum(col("_ret")).as("n_retained"),
        sum(col("_res")).as("n_resurrected"),
        sum(col("_ch")).as("n_churned_next"))
  }

  /** Key-cadence spectrum — x142's base-2 gap grid at DAY grain over
    * any keyed timestamped table (built for `orders`: per customer,
    * the day gaps between consecutive orders): bucket = bit length of
    * the exact epoch-day difference, bucket 0 for same-day repeats.
    * The reorder-cycle fingerprint: a subscription business spikes at
    * one band; a one-shot funnel has no mass past bucket 0.
    *
    * Determinism: exact epoch-day floor division (the x154
    * convention), tie-free (day, id) per-key order, the shared
    * [[lagSpectrumPublish]] bucket arithmetic (string-length-of-bin —
    * no libm).
    *
    * Scale: ONE key-keyed exchange feeds the lag window (a key bounds
    * a task at its own row count); the spectrum partial-aggregates
    * map-side to ≲20 day-band rows.
    *
    * Returns `(bucket, n_gaps, lo_days, hi_days)`.
    */
  def cadenceSpectrum(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_d").asc, col(idCol).asc)
    val gaps = df.select(col(keyCol), col(idCol),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
          .as("_d"))
      .withColumn("_prev", lag(col("_d"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select((col("_d") - col("_prev")).as("_dt"))
    val bucket = when(col("_dt") <= 0L, lit(0L))
      .otherwise(length(bin(col("_dt"))).cast(LongType))
    lagSpectrumPublish(gaps.select(bucket.as("bucket")),
      countName = "n_gaps", loName = "lo_days", hiName = "hi_days")
  }

  /** Daily revenue with a trailing window — the smoothed topline: per
    * ACTIVE day, the exact revenue micros booked that day and the
    * trailing `win`-day total (that day plus the `win−1` before it).
    * The trailing sum is built by the x141 explode-forward pattern —
    * each day's revenue projects onto the `win` days it should count
    * toward — so no ordered window over the calendar is ever needed.
    *
    * Determinism: the x128 money convention per row, exact BIGINT
    * sums, all-NULL days coalesce to 0; days with no events do not
    * publish (x180 densifies when the zero rows matter).
    *
    * Scale: ONE map-side daily aggregate collapses the corpus
    * (lazy-checkpoint barrier); the explode is a bounded win× blowup
    * of the calendar-sized frame; the join is calendar × calendar.
    *
    * Returns `(day TIMESTAMP, rev_micros BIGINT,
    * trail_micros BIGINT)`.
    */
  def trailingRevenue(events: DataFrame, tsCol: String,
      valueCol: String, win: Int = 7): DataFrame = {
    require(win >= 1, s"window must be >= 1 day, got $win")
    val daily = events
      .groupBy(date_trunc("day", col(tsCol).cast(TimestampType))
        .as("day"))
      .agg(coalesce(sum((col(valueCol).cast(DecimalType(18, 6)) *
          lit(1000000L)).cast(LongType)), lit(0L)).as("rev_micros"))
      // lazy barrier: the projection and the join both read this
      // calendar-bounded frame
      .localCheckpoint(eager = false)
    val trail = daily
      .select(explode(sequence(col("day"),
          col("day") + expr(s"INTERVAL ${win - 1} DAYS"),
          expr("INTERVAL 1 DAY"))).as("day"),
        col("rev_micros"))
      .groupBy(col("day"))
      .agg(sum(col("rev_micros")).as("trail_micros"))
    daily.join(trail, Seq("day"))
      .select(col("day"), col("rev_micros"), col("trail_micros"))
  }

  /** Inter-SESSION gap spectrum — the return-time histogram at visit
    * grain (x142 reads event gaps, x163 purchase gaps; this reads the
    * gap from one session's END to the next session's START per
    * user): base-2 second buckets via the shared
    * [[lagSpectrumPublish]] grid. Every gap is > the sessionization
    * threshold by construction (smaller gaps never split a session),
    * so the mass starts at the 600 s band — the DAILY-return vs
    * WEEKLY-return split is the retention cadence x130's matrix
    * blurs.
    *
    * Determinism: the shared sessionization windows, exact epoch
    * micro → truncated-second arithmetic, session_idx order (dense
    * per user by construction).
    *
    * Scale: the one user-keyed sessionization exchange; the session
    * frame re-uses the same user partitioning for the lag window; the
    * spectrum partial-aggregates map-side to ≲40 band rows.
    *
    * Returns `(bucket, n_gaps, lo_s, hi_s)`.
    */
  def sessionGapSpectrum(events: DataFrame, userCol: String,
      tsCol: String, idCol: String,
      gapUs: Long = 600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionized(events, userCol, tsCol, idCol, gapUs, Nil)
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col("tus")).as("_t0"), max(col("tus")).as("_t1"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("session_idx").asc)
    val gaps = sess
      .withColumn("_pe", lag(col("_t1"), 1).over(w))
      .filter(col("_pe").isNotNull)
      .select(expr("(_t0 - _pe) div 1000000").as("_dt"))
    val bucket = when(col("_dt") <= 0L, lit(0L))
      .otherwise(length(bin(col("_dt"))).cast(LongType))
    lagSpectrumPublish(gaps.select(bucket.as("bucket")),
      countName = "n_gaps")
  }

  /** Month-over-month revenue growth — the board-deck table: per
    * calendar month, the exact revenue micros, the previous month's,
    * the signed delta, and the growth ratio in micros (10⁶ = flat).
    * The ratio is gated on the EXACT overflow boundary: the precise
    * spelling rev·10⁶ div prev while |rev| ≤ Long.Max div 10⁶
    * (~$9.2M — rev·10⁶ provably fits), the pre-divided
    * rev div (prev div 10⁶) above that once prev ≥ $1, and NULL for
    * the one unrepresentable corner (a >$9.2M month after a sub-$1
    * month: the true ratio exceeds 9.2e12·10⁶ and no BIGINT spelling
    * holds it — Spark would wrap where DuckDB raises, so both
    * publish NULL).
    *
    * Determinism: `date_trunc('month')` + `INTERVAL 1 MONTH` on
    * first-of-month UTC midnights — exact and identical in both
    * engines; x128 money per row; first month publishes NULL
    * prev/delta/growth (no predecessor), and a month with a zero-
    * revenue predecessor publishes NULL growth (undefined ratio).
    * Months with NO events are absent (x180's densify convention
    * applies if the zero rows matter).
    *
    * Scale: ONE map-side monthly aggregate (calendar-bounded,
    * lazy-checkpoint barrier), one calendar × calendar self-join.
    *
    * Returns `(month TIMESTAMP, rev_micros, prev_micros, delta_micros,
    * growth_micros — BIGINTs, NULLs per the contract above)`.
    */
  def monthlyGrowth(events: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val monthly = events
      .groupBy(date_trunc("month", col(tsCol).cast(TimestampType))
        .as("month"))
      .agg(coalesce(sum((col(valueCol).cast(DecimalType(18, 6)) *
          lit(1000000L)).cast(LongType)), lit(0L)).as("rev_micros"))
      .localCheckpoint(eager = false)
    val prev = monthly.select(
      (col("month") + expr("INTERVAL 1 MONTH")).as("month"),
      col("rev_micros").as("prev_micros"))
    monthly.join(prev, Seq("month"), "left")
      .select(col("month"), col("rev_micros"), col("prev_micros"),
        (col("rev_micros") - col("prev_micros")).as("delta_micros"),
        when(col("prev_micros") > 0L &&
            abs(col("rev_micros")) <= lit(9223372036854L),
          expr("(rev_micros * 1000000) div prev_micros"))
          .when(col("prev_micros") >= 1000000L,
            expr("rev_micros div (prev_micros div 1000000)"))
          .as("growth_micros"))
  }

  /** Transition time-reversal asymmetry — per unordered type pair,
    * how one-directional the traffic is: `|n(a→b) − n(b→a)| · 10⁶
    * div (n(a→b) + n(b→a))`. 0 = perfectly reversible (browsing
    * back-and-forth), 10⁶ = strictly one-way (a funnel edge). Read
    * against x138: its row-normalized probabilities hide direction
    * imbalance when marginals differ; this gauge isolates it.
    * Self-loops are excluded (asymmetry is undefined on a = b).
    *
    * Determinism: the x138 count matrix (tie-free (ts, id) order),
    * canonical (least, greatest) pair keying, exact BIGINTs, one
    * floor division. A pair whose reverse edge never occurs publishes
    * with the zero count (asymmetry 10⁶) — absence is data here.
    *
    * Scale: the one user-keyed x138 exchange; everything after is
    * the type²-bounded matrix.
    *
    * Returns `(type_a, type_b, n_ab BIGINT, n_ba BIGINT,
    * asym_micros BIGINT)` with `type_a < type_b`.
    */
  def transitionAsymmetry(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_tus").asc, col(idCol).asc)
    val m = events
      .select(col(userCol), col(idCol),
        unix_micros(col(tsCol).cast(TimestampType)).as("_tus"),
        col(typeCol).as("_next"))
      .withColumn("_prev", lag(col("_next"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= col("_next"))
      .groupBy(col("_prev"), col("_next"))
      .agg(count(lit(1)).as("_n"))
    m.groupBy(least(col("_prev"), col("_next")).as("type_a"),
        greatest(col("_prev"), col("_next")).as("type_b"))
      .agg(coalesce(sum(when(col("_prev") < col("_next"), col("_n"))),
          lit(0L)).as("n_ab"),
        coalesce(sum(when(col("_prev") > col("_next"), col("_n"))),
          lit(0L)).as("n_ba"))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_ba"),
        expr("(abs(n_ab - n_ba) * 1000000) div (n_ab + n_ba)")
          .as("asym_micros"))
  }
}
