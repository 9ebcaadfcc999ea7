package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** One declared query: a Spark DataFrame builder plus the equivalent ANSI
  * SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §2.2): every query ends with a total
  * ORDER BY over all output columns (NULLS LAST); floating-point outputs
  * are either bit-deterministic (per-row IEEE arithmetic on identical
  * inputs) or routed through exact DECIMAL aggregation before rounding,
  * so Spark and DuckDB agree to the last bit. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The full declared query inventory from SURVEY.md §2.2 (Q1–Q24).
  *
  * Design notes for 100 TB scale (tested at sf<=0.1, designed for 1000
  * executors):
  *  - dimension joins (region/nation/customer at TPC-H ratios) are
  *    broadcast; fact-fact joins (lineitem self-join) shuffle on their
  *    keys and rely on AQE for skew.
  *  - aggregations are partial+final hash aggregates (map-side combine)
  *    by construction — no driver-side state anywhere.
  *  - filters and projections are plain Catalyst expressions so pushdown
  *    and column pruning reach the Parquet scan.
  */
object QueryCatalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val D18_6 = DecimalType(18, 6)

  /** Exact, order-independent money aggregation, published as BIGINT
    * MICROS — r14. History of this spelling: `round(sum(double), 2)`
    * could TIE at the 3rd decimal (r12, the x118 class); the r13
    * re-spell summed exact DECIMAL(18,6) terms but PUBLISHED
    * DECIMAL(38,6), and precision-38 decimals are int128/hugeint-backed
    * in DuckDB — the one surface whose conversion path moved between
    * DuckDB versions (CORRECTNESS_r13: the six hash-fails were exactly
    * the six precision>18 publishers). The portability contract covers
    * the published TYPE, not just the value (PublishedTypeSpec), so:
    * quantize each (at most 6-decimal) double term to DECIMAL(18,6),
    * scale to micros per row — `x.cast(D18_6) * 1000000` is an exact
    * integral DECIMAL(29,6) — truncate-cast to BIGINT (exact: the
    * fractional part is zero by construction, so Spark's
    * truncate-toward-zero and DuckDB's round-half-away agree), and sum
    * BIGINTs. Overflow bound: q1 sum_base_price ≈ 2.9e14 micros at
    * sf0.01, ≈ 2.9e16 extrapolated to sf1 — ~2 orders below 2⁶³; a
    * 100 TB corpus-scale money sum would shard by group key long
    * before the per-group sum approaches 9.2e18.
    * DuckDB mirror: `CAST(SUM(CAST(CAST(x AS DECIMAL(18,6)) * 1000000
    * AS BIGINT)) AS BIGINT)` — the outer CAST because DuckDB's
    * SUM(BIGINT) publishes HUGEINT, itself an int128 surface.
    */
  private def moneySumMicros(c: Column): Column =
    sum((c.cast(D18_6) * lit(1000000)).cast(LongType))

  /** Total order over every output column, NULLS LAST — the final
    * determinism step shared by (almost) every query.
    */
  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_last).toIndexedSeq: _*)

  private def orderedSql(cols: Seq[String]): String =
    "ORDER BY " + cols.map(c => s"$c NULLS LAST").mkString(", ")

  // ---------------------------------------------------------------------

  val all: Seq[QueryDef] = Seq(

    // Q1 — TPC-H Q1 pricing summary: scan + filter + agg + sort.
    QueryDef("q1_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        // quantities are integral: per-row BIGINT cast (exact) → BIGINT
        // sum — order-free with no float addition anywhere; avg is ONE
        // IEEE division of exactly-converted operands (r13: the old
        // `sum(double)` was order-nondeterministic in principle)
        ordered(li.groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity").cast(LongType)).as("sum_qty"),
          moneySumMicros(col("l_extendedprice")).as("sum_base_price_micros"),
          moneySumMicros(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price_micros"),
          (sum(col("l_quantity").cast(LongType)).cast(DoubleType) /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_base_price_micros,
        CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_disc_price_micros,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """ + orderedSql(Seq("l_returnflag", "l_linestatus", "sum_qty",
          "sum_base_price_micros", "sum_disc_price_micros", "avg_qty",
          "count_order")))),

    // Q2 — projection + filter; predicate pushdown to Parquet.
    QueryDef("q2_project_filter",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        ordered(li
          .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
          .select("l_orderkey", "l_linenumber", "l_extendedprice"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05
        """ + orderedSql(Seq("l_orderkey", "l_linenumber", "l_extendedprice")))),

    // Q3 — regex filter (reference R21 page-regex analog, README.md:54-64).
    QueryDef("q3_regex_filter",
      (s, dir) => ordered(t(s, dir, "documents")
        .filter(col("text").rlike("merge.*join"))
        .groupBy("lang").agg(count(lit(1)).as("n"))),
      Some("""SELECT lang, COUNT(*) AS n FROM documents
        WHERE regexp_matches(text, 'merge.*join') GROUP BY lang
        """ + orderedSql(Seq("lang", "n")))),

    // Q3n — negated regex (reference --neg-regex, README.md:62-64).
    QueryDef("q3n_neg_regex",
      (s, dir) => ordered(t(s, dir, "documents")
        .filter(!col("text").rlike("merge.*join"))
        .groupBy("lang").agg(count(lit(1)).as("n"))),
      Some("""SELECT lang, COUNT(*) AS n FROM documents
        WHERE NOT regexp_matches(text, 'merge.*join') GROUP BY lang
        """ + orderedSql(Seq("lang", "n")))),

    // Q4 — inner equi-join + agg. customer GROWS with scale factor
    // (TPC-H SF100 ⇒ 15 M rows), so no forced broadcast hint — AQE
    // picks broadcast at small SF from runtime sizes and falls back to
    // a shuffle join when the dimension outgrows the threshold; a hard
    // hint here is a driver OOM at 100× (r14 verdict item 4).
    QueryDef("q4_join_agg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        ordered(o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment").agg(
            count(lit(1)).as("n"),
            moneySumMicros(col("o_totalprice")).as("sum_price_micros")))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_price_micros
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """ + orderedSql(Seq("c_mktsegment", "n", "sum_price_micros")))),

    // Q5 — multi-way join (TPC-H Q5 analog; chain frozen per SURVEY.md §2.2).
    QueryDef("q5_multiway_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // customer/supplier grow with SF — broadcast is AQE's call;
        // nation (25 rows) / region (5 rows) are FIXED-size, so their
        // hints are safe at any scale
        ordered(li
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey") &&
                    c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name")
          .agg(moneySumMicros(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue_micros")))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS revenue_micros
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        """ + orderedSql(Seq("n_name", "revenue_micros")))),

    // Q6 — left semi join (EXISTS).
    QueryDef("q6_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """ + orderedSql(Seq("c_custkey", "c_name")))),

    // Q6a — left anti join (NOT EXISTS).
    QueryDef("q6a_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """ + orderedSql(Seq("c_custkey", "c_name")))),

    // Q7 — left outer join + agg.
    QueryDef("q7_outer_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders")))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
        """ + orderedSql(Seq("c_custkey", "n_orders")))),

    // Q8 — ranking window: top-3 orders per customer.
    QueryDef("q8_rank_window",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        ordered(o.select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice"), row_number().over(w).as("rn"))
          .filter(col("rn") <= 3))
      },
      Some("""SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
        """ + orderedSql(Seq("o_custkey", "o_orderkey", "o_totalprice", "rn")))),

    // Q9 — analytic window with explicit frame: running sum per user.
    // Exact DECIMAL accumulation: window-sum order differs between engines
    // (DuckDB segment tree vs Spark running agg), so double would drift.
    QueryDef("q9_running_sum",
      (s, dir) => {
        val e = t(s, dir, "events")
        // Ordered by event_id (unique, time-ordered in the fixture): the
        // fixture's ts is nanosecond-precision, which Spark truncates to
        // micros — ordering by ts would tie-break differently per engine.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // r14: publish the running sum as BIGINT MICROS (per-row
        // value.cast(D18_6)*1e6 is an exact integral decimal →
        // truncate-cast to BIGINT, window-sum BIGINTs). The r13 exact
        // DECIMAL(38,6) was value-portable but TYPE-unportable — the
        // precision-38 surface is hugeint-backed in DuckDB and was one
        // of the six r13 driver hash-fails. BIGINT addition is exact
        // and order-free; fixture bound ≈ 2e11 micros per user at
        // sf0.01, ~7 orders below 2⁶³.
        ordered(e.select(col("user_id"), col("event_id"),
          sum((col("value").cast(D18_6) * lit(1000000)).cast(LongType))
            .over(w).as("running_value_micros")))
      },
      Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) OVER (
          PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running_value_micros
        FROM events
        """ + orderedSql(Seq("user_id", "event_id", "running_value_micros")))),

    // Q10 — exact distinct aggregation.
    QueryDef("q10_count_distinct",
      (s, dir) => ordered(t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"))),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
        """ + orderedSql(Seq("event_type", "n_users")))),

    // Q11 — rollup / grouping sets (Expand operator).
    QueryDef("q11_rollup",
      (s, dir) => ordered(t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """ + orderedSql(Seq("l_returnflag", "l_linestatus", "n_rows")))),

    // Q12 — set op: INTERSECT.
    QueryDef("q12_intersect",
      (s, dir) => ordered(
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(
            t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        """ + orderedSql(Seq("nationkey")))),

    // Q12u — set op: UNION (distinct).
    QueryDef("q12u_union",
      (s, dir) => ordered(
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .union(
            t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
        """ + orderedSql(Seq("nationkey")))),

    // Q12e — set op: EXCEPT.
    QueryDef("q12e_except",
      (s, dir) => ordered(
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(
            t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
        """ + orderedSql(Seq("nationkey")))),

    // Q13 — top-k (TakeOrderedAndProject); re-sorted ascending for hashing.
    QueryDef("q13_topk",
      (s, dir) => ordered(t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")),
      Some("""SELECT * FROM (
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        """ + orderedSql(Seq("o_orderkey", "o_totalprice")))),

    // Q14 — string functions.
    QueryDef("q14_string_funcs",
      (s, dir) => ordered(t(s, dir, "part")
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 10).as("name10"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"))),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_uc,
        SUBSTR(p_name, 1, 10) AS name10,
        CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        CONCAT(p_brand, '/', p_type) AS brand_type
        FROM part WHERE p_name LIKE '%a%'
        """ + orderedSql(Seq("p_partkey", "brand_uc", "name10", "name_len",
          "brand_type")))),

    // Q15 — date functions.
    QueryDef("q15_date_trunc",
      (s, dir) => ordered(t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n"))),
      Some("""SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
        COUNT(*) AS n FROM orders GROUP BY 1
        """ + orderedSql(Seq("order_month", "n")))),

    // Q16 — arithmetic / math functions. Per-row IEEE double arithmetic is
    // bit-identical across engines, so raw (unrounded) outputs hash-match.
    QueryDef("q16_math_funcs",
      (s, dir) => ordered(t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charge"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          abs(col("l_discount") - 0.05).as("disc_dev"))),
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
        CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        ABS(l_discount - 0.05) AS disc_dev
        FROM lineitem WHERE l_linenumber = 1
        """ + orderedSql(Seq("l_orderkey", "l_linenumber", "charge",
          "qty_floor", "price_ceil", "disc_dev")))),

    // Q17 — JSON extraction. from_json with an explicit one-field schema
    // parses each props value once with a schema-directed Jackson reader
    // (codegen-friendly struct output) instead of get_json_object's
    // per-row JsonPath walk — same null semantics (missing/malformed →
    // NULL), measured ~5× faster on the events fixture.
    QueryDef("q17_json",
      (s, dir) => ordered(t(s, dir, "events")
        .groupBy("event_type")
        .agg(sum(from_json(col("props"),
            StructType(Seq(StructField("k", LongType)))).getField("k"))
          .as("sum_k"))),
      Some("""SELECT event_type,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
        """ + orderedSql(Seq("event_type", "sum_k")))),

    // Q18 — exact cosine top-10 similarity vs vec_id=0 (north star:
    // similarity search baseline). Higher-order functions, no UDF; the
    // 1-row query vector is broadcast. Ranked on the ROUNDED score so the
    // rank-10 cutoff is identical in both engines.
    QueryDef("q18_cosine_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val v = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
        ordered(v.select(col("vec_id"),
            round(graft.ops.Similarity.cosine(col("ve"), col("qe")), 3)
              .as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10))
      },
      Some("""SELECT * FROM (
          SELECT v.vec_id,
            ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
              CAST(q.qe AS DOUBLE[])), 3) AS sim
          FROM embeddings v,
            (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
          WHERE v.vec_id <> 0
          ORDER BY sim DESC, vec_id LIMIT 10)
        """ + orderedSql(Seq("vec_id", "sim")))),

    // Q19 — exact dedup stats (north star: deduplication).
    QueryDef("q19_dedup_stats",
      (s, dir) => ordered(t(s, dir, "documents")
        .agg(count(lit(1)).as("total"),
          countDistinct(col("text")).as("uniq"))),
      Some("""SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq
        FROM documents
        """ + orderedSql(Seq("total", "uniq")))),

    // Q19d — duplicate groups by md5 fingerprint.
    QueryDef("q19d_dup_groups",
      (s, dir) => ordered(t(s, dir, "documents")
        .select(md5(col("text")).as("text_hash"))
        .groupBy("text_hash")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)),
      Some("""SELECT md5(text) AS text_hash, COUNT(*) AS c
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """ + orderedSql(Seq("text_hash", "c")))),

    // Q20 — tumbling window, batch form (streaming twin in graft.streaming).
    QueryDef("q20_tumbling_window",
      (s, dir) => ordered(t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          moneySumMicros(col("value")).as("sum_value_micros"))),
      Some("""SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_value_micros
        FROM events GROUP BY 1, 2
        """ + orderedSql(Seq("h", "event_type", "n", "sum_value_micros")))),

    // Q21 — self-join semantics, computed without the join: the pair
    // count per orderkey under `ln1 < ln2` is C(n,2) minus the pairs
    // tied on l_linenumber (the synthetic fixture has duplicate line
    // numbers, which `<` excludes). PairCountAgg computes that in ONE
    // map-side-combinable aggregate — a single shuffle of tiny
    // multiplicity maps replaces the fact-fact shuffle join. The
    // oracle SQL keeps the literal self-join formulation, proving the
    // algebraic rewrite exact.
    QueryDef("q21_self_join",
      (s, dir) => {
        ordered(t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(graft.functions.PairCountFunctions.pairCount(
            col("l_linenumber")).as("n_pairs"))
          .filter(col("n_pairs") > 0))
      },
      Some("""SELECT * FROM (
          SELECT l1.l_orderkey AS l_orderkey, COUNT(*) AS n_pairs
          FROM lineitem l1 JOIN lineitem l2
            ON l1.l_orderkey = l2.l_orderkey
           AND l1.l_linenumber < l2.l_linenumber
          GROUP BY 1)
        """ + orderedSql(Seq("l_orderkey", "n_pairs")))),

    // Q22 — chunked index (reference src/main.cpp:10-38 demo, frozen spec
    // per SURVEY.md §2.2: bytes = LEN(CAST(LEN(text))) + n_chars, chunk =
    // floor(running_bytes_before / 4096)). Integer arithmetic throughout.
    // The running sum is the two-pass distributed prefix sum (range-sort
    // + per-partition subtotals + broadcast offsets) — no global-window
    // single-partition stage.
    QueryDef("q22_chunked_index",
      (s, dir) => {
        val d = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            (length(col("n_chars").cast(StringType)).cast(LongType) +
              col("n_chars")).as("bytes"))
        val run = graft.ops.PrefixSum.withRunningLongSum(
          d, Seq("doc_id"), "bytes", "run")
        ordered(run
          .select(floor((col("run") - col("bytes")) / 4096).as("chunk_id"),
            col("bytes"))
          .groupBy("chunk_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("sum_bytes")))
      },
      Some("""WITH b AS (
          SELECT doc_id, LENGTH(CAST(n_chars AS VARCHAR)) + n_chars AS bytes
          FROM documents WHERE text IS NOT NULL),
        r AS (
          SELECT doc_id, bytes,
            SUM(bytes) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes AS rb
          FROM b)
        SELECT CAST(FLOOR(rb / 4096) AS BIGINT) AS chunk_id,
          COUNT(*) AS n_docs, CAST(SUM(bytes) AS BIGINT) AS sum_bytes
        FROM r GROUP BY 1
        """ + orderedSql(Seq("chunk_id", "n_docs", "sum_bytes")))),

    // Q23 — word count (north star: text analysis / tokenization).
    QueryDef("q23_word_count",
      (s, dir) => ordered(t(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(20)),
      Some("""SELECT * FROM (
          SELECT w, COUNT(*) AS c FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w ORDER BY c DESC, w LIMIT 20)
        """ + orderedSql(Seq("w", "c")))),

    // Q24 — schema introspection (reference R4 schema_string,
    // src/reader/parquet_reader.cpp:99-121). Spark emits its own type
    // names; the oracle maps DuckDB's via a fixed CASE table.
    QueryDef("q24_schema_dump",
      (s, dir) => {
        val rows = Tables.names.flatMap { name =>
          Tables.load(s, dir, name).schema.fields.map { f =>
            (name, f.name, f.dataType.simpleString)
          }
        }
        import s.implicits._
        ordered(rows.toDF("table_name", "col_name", "col_type"))
      },
      Some {
        val describes = Tables.names.map { n =>
          s"SELECT '$n' AS table_name, column_name AS col_name, column_type AS duck_type FROM (DESCRIBE SELECT * FROM $n)"
        }.mkString(" UNION ALL ")
        s"""SELECT table_name, col_name,
          CASE duck_type
            WHEN 'BIGINT' THEN 'bigint'
            WHEN 'INTEGER' THEN 'int'
            WHEN 'DOUBLE' THEN 'double'
            WHEN 'FLOAT' THEN 'float'
            WHEN 'VARCHAR' THEN 'string'
            WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
            WHEN 'TIMESTAMP_NS' THEN 'timestamp'
            WHEN 'DATE' THEN 'date'
            WHEN 'BOOLEAN' THEN 'boolean'
            WHEN 'FLOAT[]' THEN 'array<float>'
            WHEN 'DOUBLE[]' THEN 'array<double>'
            ELSE duck_type
          END AS col_type
          FROM ($describes)
          """ + orderedSql(Seq("table_name", "col_name", "col_type"))
      }),

    // Q25 — gap-based sessionization (10-minute inactivity gap): lag →
    // flag → running-sum session index. Integer microsecond arithmetic
    // end to end.
    QueryDef("q25_sessionize",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast(TimestampType)).as("tus"))
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val isNew = when(lag(col("tus"), 1).over(wOrd).isNull ||
          col("tus") - lag(col("tus"), 1).over(wOrd) > 600000000L, 1L)
          .otherwise(0L)
        ordered(e.withColumn("is_new", isNew)
          .withColumn("session_idx", sum(col("is_new")).over(wRun))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event")))
      },
      Some("""WITH b AS (
          SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        m AS (
          SELECT user_id, event_id,
            CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY event_id) > 600000000
                 THEN 1 ELSE 0 END AS is_new
          FROM b),
        sx AS (
          SELECT user_id, event_id,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_idx
          FROM m)
        SELECT user_id, session_idx, COUNT(*) AS n_events,
          MIN(event_id) AS first_event, MAX(event_id) AS last_event
        FROM sx GROUP BY 1, 2
        """ + orderedSql(Seq("user_id", "session_idx", "n_events",
          "first_event", "last_event")))),

    // Q26 — backward as-of join (most recent purchase at or before each
    // event, per user) via graft.ops.AsOfJoin's union+window composition.
    QueryDef("q26_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"))
        val purchases = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event_id"), col("value").as("p_value"))
        ordered(graft.ops.AsOfJoin.asofBackward(ev, purchases,
            keyCols = Seq("user_id"), timeCol = "ts",
            rightOrder = "p_event_id",
            payloadCols = Seq("p_event_id", "p_value"))
          .select("user_id", "event_id", "p_event_id", "p_value"))
      },
      Some("""WITH l AS (
          SELECT user_id, event_id, ts, 1 AS side, CAST(NULL AS BIGINT) AS ord,
            CAST(NULL AS BIGINT) AS pe, CAST(NULL AS DOUBLE) AS pv
          FROM events),
        r AS (
          SELECT user_id, CAST(NULL AS BIGINT) AS event_id, ts, 0 AS side,
            event_id AS ord, event_id AS pe, value AS pv
          FROM events WHERE event_type = 'purchase'),
        u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        wv AS (
          SELECT user_id, event_id, side,
            last_value(pe IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ts, side, ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_event_id,
            last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ts, side, ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_value
          FROM u)
        SELECT user_id, event_id, p_event_id, p_value FROM wv WHERE side = 1
        """ + orderedSql(Seq("user_id", "event_id", "p_event_id", "p_value")))),

    // Q27 — pivot (fixed value list for determinism; absent combos → 0).
    QueryDef("q27_pivot",
      (s, dir) => ordered(t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)),
      Some("""SELECT user_id % 10 AS bucket,
        COUNT(*) FILTER (event_type = 'click') AS click,
        COUNT(*) FILTER (event_type = 'error') AS error,
        COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (event_type = 'signup') AS signup,
        COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY 1
        """ + orderedSql(Seq("bucket", "click", "error", "purchase",
          "signup", "view")))),

    // Q28 — exact interpolated percentiles (engines differ by ≤1 ulp in
    // the interpolation formula; DECIMAL(18,6) absorbs it).
    QueryDef("q28_percentiles",
      (s, dir) => ordered(t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.5)").cast(D18_6).cast(DoubleType)
            .as("med_value"),
          expr("percentile(value, 0.9)").cast(D18_6).cast(DoubleType)
            .as("p90_value"))),
      Some("""SELECT event_type,
        CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS med_value,
        CAST(CAST(quantile_cont(value, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90_value
        FROM events GROUP BY event_type
        """ + orderedSql(Seq("event_type", "med_value", "p90_value")))),

    // Q11c — cube (all grouping-set combinations).
    QueryDef("q11c_cube",
      (s, dir) => ordered(t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """ + orderedSql(Seq("l_returnflag", "l_linestatus", "n_rows")))),

    // Q12ia / Q12ea — multiset (bag) semantics set ops.
    QueryDef("q12ia_intersect_all",
      (s, dir) => ordered(
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersectAll(
            t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
        """ + orderedSql(Seq("nationkey")))),

    QueryDef("q12ea_except_all",
      (s, dir) => ordered(
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .exceptAll(
            t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
        """ + orderedSql(Seq("nationkey"))))
  )

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator
      .map(_.trim).filter(_.nonEmpty).mkString(" "))).toMap
}
