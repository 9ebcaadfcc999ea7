package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The repo-wide rounding-margin gate (Bm25MarginSpec generalized —
  * the r12 verdict's item 1d): walks EVERY `SparkEntry.queries` plan,
  * finds every value that crosses an engine-semantics boundary on its
  * way to a published column, and pins the property that makes it
  * hash-portable between Spark and ANY conforming DuckDB:
  *
  *  - **Double quantizations** — `round(double, n)`, the r13
  *    `FLOOR(x·10ⁿ + 0.5)` micros pattern, and `CAST(double AS
  *    DECIMAL(p,s))` — must keep the raw value away from the rounding
  *    boundary. Hazard-free IEEE chains (±/×/÷/sqrt/int-casts over
  *    parquet-exact inputs) produce bit-identical doubles in both
  *    engines, so only the ROUND/CAST *implementation* skew matters
  *    (multiply-based vs shortest-repr variants agree unless the value
  *    sits within ~2e-15 of a boundary — the r12 driver divergence):
  *    pin ≥ 1e-6 quanta. Chains with a libm call (`ln`/`exp`/`pow` —
  *    conforming implementations differ by ulps) or a wide
  *    decimal→double conversion get an ADAPTIVE pin: 10² × the drift
  *    bound `8·max|g|·2⁻⁵²`, floored at 1e-6 (fixture minima still sit
  *    10³–10⁴× above the TRUE drift).
  *    EXACT half values (g = k + 0.5 bit-exactly, margin ≡ 0) are a
  *    separate class: both engines see the identical binary .5 and
  *    round it away from zero (`Similarity.scala:144` documents the
  *    convention; x93/x95 are driver-green with such values), so they
  *    are allowed — but ONLY on hazard-free chains, where the .5 is
  *    the same exact .5 everywhere. A libm value landing on .5 is a
  *    coincidence one ulp of drift un-lands.
  *  - **Decimal ROUND downscales** must have ZERO exact half-ties on
  *    the fixture — a tie is the ONLY way an exact decimal can round
  *    differently across engines, and tie semantics are exactly what
  *    moved under the driver's DuckDB in r12 (x118).
  *  - **Wide decimal→double casts** (`dec2dbl`): the conversion is
  *    exact (hence engine-identical) only while |value|·10ˢ < 2⁵³;
  *    pin the measured bound at 2⁵³/8.
  *  - **Published raw doubles** must be hazard-free IEEE chains (or
  *    only dec2dbl, which the rep gate covers). A raw double
  *    downstream of unquantized libm can never be hash-portable (the
  *    r12 x119 mistake, now structural).
  *  - **Order hazards**: a double SUM/AVG under a published column is
  *    nondeterministic even WITHIN Spark (float addition is not
  *    associative; partition order varies) — forbidden outright.
  *
  * Quantize sites are re-anchors: a value that passed through a
  * pinned quantization is engine-identical downstream, so hazard
  * chains stop at Round/FloorQuant/double→decimal-cast nodes.
  * Discovery and pins run on both fixture SFs (sf0.001 + the driver's
  * sf0.01 gate).
  *
  * Measurement mechanics: each site is re-rooted on its host node's
  * child and executed via a test-only bridge
  * (`GraftPlanBridge.ofRows`). Sites inside higher-order-function
  * lambdas (`transform`/`zip_with` — e.g. x95's per-coordinate
  * residual round) are measured by swapping the lambda body for the
  * margin expression and exploding the result. Batch-discovered plans
  * stay executable throughout: the LM slot persists (rather than
  * checkpoints) its model tables, so an evicted model recomputes from
  * lineage instead of failing (LmSlotLivenessSpec pins this).
  */
class RoundingMarginSpec extends SparkSpec {

  // ---- site model -------------------------------------------------

  /** `raw` is the pre-quantization (or pre-conversion) expression,
    * `targetScale` the 10ⁿ quantum, `host` the plan node whose child
    * it evaluates over, `lambdaCtx` the enclosing (hof, lambda) when
    * the site lives inside a higher-order function.
    */
  private case class Site(query: String, kind: String, raw: Expression,
      targetScale: Int, hazards: Set[String], host: LogicalPlan,
      lambdaCtx: Option[(Expression, LambdaFunction)] = None)

  /** FLOOR(c·s + 0.5) with s a double literal — the r13 micros
    * quantizer.
    */
  private object FloorQuant {
    def unapply(e: Expression): Option[(Expression, Double)] = e match {
      case Floor(Add(Multiply(c, Literal(s: Double, DoubleType), _),
          Literal(h: Double, DoubleType), _))
          if h == 0.5 && c.dataType == DoubleType =>
        Some((c, s))
      case _ => None
    }
  }

  /** CAST(double AS DECIMAL(p,s)) — an implicit quantization at s. */
  private object CastQuant {
    def unapply(e: Expression): Option[(Expression, Int)] = e match {
      case c: Cast if c.child.dataType == DoubleType =>
        c.dataType match {
          case d: DecimalType => Some((c.child, d.scale))
          case _ => None
        }
      case _ => None
    }
  }

  /** CAST(decimal(p>15) AS DOUBLE) — conversion exactness needs the
    * integer rep below 2⁵³.
    */
  private object WideDecToDouble {
    def unapply(e: Expression): Option[(Expression, Int)] = e match {
      case c: Cast if c.dataType == DoubleType =>
        c.child.dataType match {
          case d: DecimalType if d.precision > 15 =>
            Some((c.child, d.scale))
          case _ => None
        }
      case _ => None
    }
  }

  // ---- hazard classification -------------------------------------

  private def selfHazard(e: Expression): Set[String] = e match {
    case _: Log | _: Log2 | _: Log10 | _: Log1p | _: Logarithm =>
      Set("libm-log")
    case _: Exp | _: Expm1 | _: Pow => Set("libm-exp")
    case WideDecToDouble(_, _) => Set("dec2dbl")
    case _ => Set.empty
  }

  /** Hazards reachable from `e` WITHOUT crossing another quantization
    * site (a pinned quantize output is engine-identical, so it
    * re-anchors determinism), following attribute references through
    * the plan's defining expressions.
    */
  private def chainHazards(e: Expression,
      defs: Map[ExprId, Seq[Expression]],
      seen: mutable.Set[ExprId]): Set[String] = e match {
    case _: Round | _: BRound => Set.empty
    case FloorQuant(_, _) => Set.empty
    case CastQuant(_, _) => Set.empty
    case a: AttributeReference =>
      if (!seen.add(a.exprId)) Set.empty
      else defs.getOrElse(a.exprId, Nil)
        .flatMap(chainHazards(_, defs, seen)).toSet
    case _ =>
      selfHazard(e) ++ e.children.flatMap(chainHazards(_, defs, seen))
  }

  /** Order hazards (double SUM/AVG) — NOT re-anchored by quantization:
    * a nondeterministic value stays nondeterministic after rounding.
    */
  private def orderHazards(e: Expression,
      defs: Map[ExprId, Seq[Expression]],
      seen: mutable.Set[ExprId]): Set[String] = e match {
    case a: AttributeReference =>
      if (!seen.add(a.exprId)) Set.empty
      else defs.getOrElse(a.exprId, Nil)
        .flatMap(orderHazards(_, defs, seen)).toSet
    case ae: AggregateExpression =>
      val own = ae.aggregateFunction match {
        case s: Sum if s.child.dataType == DoubleType => Set("double-sum")
        case av: Average if av.child.dataType == DoubleType =>
          Set("double-avg")
        case _ => Set.empty[String]
      }
      own ++ ae.children.flatMap(orderHazards(_, defs, seen))
    case _ => e.children.flatMap(orderHazards(_, defs, seen)).toSet
  }

  // ---- plan walking ----------------------------------------------

  private def definitions(plan: LogicalPlan): Map[ExprId, Seq[Expression]] = {
    val defs = mutable.Map.empty[ExprId, mutable.Buffer[Expression]]
    def add(id: ExprId, e: Expression): Unit =
      defs.getOrElseUpdate(id, mutable.Buffer.empty) += e
    plan.foreach {
      case p: Project =>
        p.projectList.foreach { case a: Alias => add(a.exprId, a.child)
          case _ => }
      case a: Aggregate =>
        a.aggregateExpressions.foreach {
          case al: Alias => add(al.exprId, al.child)
          case _ => }
      case w: Window =>
        w.windowExpressions.foreach {
          case al: Alias => add(al.exprId, al.child)
          case _ => }
      case g: Generate =>
        g.generatorOutput.foreach(attr => add(attr.exprId, g.generator))
      case u: Union =>
        u.children.foreach(ch =>
          u.output.zip(ch.output).foreach { case (o, c) =>
            add(o.exprId, c) })
      case _ =>
    }
    defs.view.mapValues(_.toSeq).toMap
  }

  private def hasLambdaVar(e: Expression): Boolean =
    e.exists(_.isInstanceOf[NamedLambdaVariable])

  private def quantSites(query: String, df: DataFrame): Seq[Site] = {
    val plan = df.queryExecution.analyzed
    val defs = definitions(plan)
    def resolve(e: Expression): Expression = e match {
      case a: AttributeReference =>
        defs.get(a.exprId).flatMap(_.headOption).map(resolve).getOrElse(a)
      case other => other
    }
    // a double already on a coarser-or-equal decimal grid (a Round
    // output) casts to decimal exactly — the nearest 10⁻ˢ boundary
    // sits ~half a quantum away by construction
    def gridCast(raw: Expression, target: Int): Boolean =
      resolve(raw) match {
        case r: Round => r.scale match {
          case Literal(v: Int, IntegerType) => v <= target
          case _ => false
        }
        case _ => false
      }
    val out = mutable.Buffer.empty[Site]
    val seenKeys = mutable.Set.empty[(String, String, Int)]
    def add(kind: String, raw: Expression, s: Int, host: LogicalPlan,
        ctx: Option[(Expression, LambdaFunction)]): Unit =
      if (seenKeys.add((kind, raw.canonicalized.toString, s)) &&
          !(kind == "cast-quant" && gridCast(raw, s)))
        out += Site(query, kind, raw, s,
          chainHazards(raw, defs, mutable.Set.empty), host, ctx)
    def classify(e: Expression, host: LogicalPlan,
        ctx: Option[(Expression, LambdaFunction)]): Unit = e match {
      case r: Round =>
        r.scale match {
          case Literal(v: Int, IntegerType) =>
            r.child.dataType match {
              case DoubleType => add("round-double", r.child, v, host, ctx)
              case d: DecimalType if d.scale > v =>
                add("round-decimal", r.child, v, host, ctx)
              case _ => // decimal already at/below target: no-op
            }
          case _ =>
        }
      case FloorQuant(c, scale) =>
        add("floor-quant", c, math.round(math.log10(scale)).toInt, host, ctx)
      case CastQuant(c, s) => add("cast-quant", c, s, host, ctx)
      case WideDecToDouble(c, s) => add("dec2dbl", c, s, host, ctx)
      case _ =>
    }
    def scan(host: LogicalPlan, exprs: Seq[Expression]): Unit =
      exprs.foreach { root =>
        // lambda-hosted sites first, registered against their SMALLEST
        // enclosing higher-order function
        root.foreach {
          case hof: HigherOrderFunction =>
            hof.functions.foreach {
              case lf: LambdaFunction =>
                lf.function.foreach { e =>
                  val nested = lf.function.exists(x =>
                    x.isInstanceOf[HigherOrderFunction] &&
                      x.exists(_ eq e) && !(x eq e))
                  if (!nested) classify(e, host, Some((hof, lf)))
                }
              case _ =>
            }
          case _ =>
        }
        // then everything outside lambdas
        root.foreach { e =>
          val quantInput = e match {
            case r: Round => Some(r.child)
            case FloorQuant(c, _) => Some(c)
            case CastQuant(c, _) => Some(c)
            case WideDecToDouble(c, _) => Some(c)
            case _ => None
          }
          if (quantInput.exists(c => !hasLambdaVar(c) && !hasLambdaVar(e)))
            classify(e, host, None)
        }
      }
    plan.foreach {
      case p: Project => scan(p, p.projectList)
      case a: Aggregate => scan(a, a.aggregateExpressions)
      case w: Window => scan(w, w.windowExpressions)
      case f: Filter => scan(f, Seq(f.condition))
      case j: Join => j.condition.foreach(c => scan(j, Seq(c)))
      case _ =>
    }
    out.toSeq
  }

  // ---- measurement ------------------------------------------------

  /** g = raw·10ⁿ and its boundary distance |frac(g) − 0.5|, as
    * catalyst expressions (usable inside lambda bodies).
    */
  private def gAndMargin(raw: Expression, scale: Int)
      : (Expression, Expression) = {
    val g = Multiply(Cast(raw, DoubleType),
      Literal(math.pow(10, scale), DoubleType))
    val frac = Subtract(g, Cast(Floor(g), DoubleType))
    (g, Abs(Subtract(frac, Literal(0.5, DoubleType))))
  }

  /** Re-root the host node on the given aliased expressions. */
  private def hostFrame(site: Site, aliases: Seq[NamedExpression])
      : DataFrame = {
    val hasAgg = aliases.exists(_.exists(_.isInstanceOf[AggregateExpression]))
    val plan2 = site.host match {
      case a: Aggregate if hasAgg =>
        Aggregate(a.groupingExpressions, aliases, a.child)
      case p: Project => Project(aliases, p.child)
      case a: Aggregate => Project(aliases, a.child)
      case w: Window => Project(aliases, w.child)
      case f: Filter => Project(aliases, f.child)
      case j: Join => Project(aliases, j)
      case other => Project(aliases, other)
    }
    GraftPlanBridge.ofRows(spark, plan2)
  }

  /** Inline lateral column aliases (projectList entries referencing
    * earlier aliases in the same list) so a re-rooted expression only
    * references the host's child output.
    */
  private def inlineLateral(site: Site, e0: Expression): Expression = {
    val localDefs: Map[ExprId, Expression] = site.host match {
      case p: Project => p.projectList.collect {
        case a: Alias => a.exprId -> a.child }.toMap
      case a: Aggregate => a.aggregateExpressions.collect {
        case al: Alias => al.exprId -> al.child }.toMap
      case _ => Map.empty
    }
    val childOut = site.host.children.headOption
      .map(_.outputSet).getOrElse(AttributeSet.empty)
    var e = e0
    var guard = 0
    while (guard < 8 && !e.references.subsetOf(childOut) &&
        e.references.exists(a => localDefs.contains(a.exprId))) {
      e = e.transformUp {
        case a: AttributeReference if localDefs.contains(a.exprId) &&
            !childOut.contains(a) => localDefs(a.exprId)
      }
      guard += 1
    }
    e
  }

  private case class Measured(minNonzero: Double, exactHalves: Long,
      maxG: Double, rows: Long)

  /** Margin measurement for a double quantize site. Lambda-hosted
    * sites swap the enclosing transform/zip_with body for the margin
    * expression and explode the per-element results.
    */
  private def measureDouble(site: Site): Measured = site.lambdaCtx match {
    case None =>
      val raw = inlineLateral(site, site.raw)
      val df = hostFrame(site, Seq(Alias(raw, "raw")()))
      val g = col("raw").cast(DoubleType) * math.pow(10, site.targetScale)
      val frac = g - floor(g)
      val margin = abs(frac - lit(0.5))
      val Array(row) = df.filter(col("raw").isNotNull)
        .agg(min(when(margin > 0.0, margin)).as("m"),
          coalesce(sum(when(margin === 0.0, 1L)), lit(0L)).as("h"),
          max(abs(g)).as("g"), count(lit(1)).as("n"))
        .collect()
      if (row.isNullAt(3) || row.getLong(3) == 0L) Measured(0.5, 0L, 0.0, 0L)
      else Measured(if (row.isNullAt(0)) 0.5 else row.getDouble(0),
        row.getLong(1), row.getDouble(2), row.getLong(3))
    case Some((hof, lf)) =>
      hof match {
        case _: ArrayTransform | _: ZipWith =>
          val (g, m) = gAndMargin(site.raw, site.targetScale)
          def swapped(body: Expression): Expression =
            hof.mapChildren(c =>
              if (c eq lf) LambdaFunction(body, lf.arguments) else c)
          val raws = Seq(
            Alias(inlineLateral(site, swapped(m)), "arr_m")(),
            Alias(inlineLateral(site, swapped(g)), "arr_g")())
          val df = hostFrame(site, raws)
          val margins = df.select(explode(col("arr_m")).as("m"))
            .filter(col("m").isNotNull)
          val Array(mr) = margins
            .agg(min(when(col("m") > 0.0, col("m"))).as("m"),
              coalesce(sum(when(col("m") === 0.0, 1L)), lit(0L)).as("h"),
              count(lit(1)).as("n"))
            .collect()
          val Array(gr) = df.select(explode(col("arr_g")).as("g"))
            .agg(coalesce(max(abs(col("g"))), lit(0.0))).collect()
          if (mr.isNullAt(2) || mr.getLong(2) == 0L)
            Measured(0.5, 0L, 0.0, 0L)
          else Measured(if (mr.isNullAt(0)) 0.5 else mr.getDouble(0),
            mr.getLong(1), gr.getDouble(0), mr.getLong(2))
        case other =>
          sys.error(s"lambda site in unsupported HOF " +
            s"${other.getClass.getSimpleName} — extend the gate")
      }
  }

  /** Exact half-tie count for a decimal ROUND downscale: a tie is
    * `raw − floor(raw, s) == 0.5·10⁻ˢ` in EXACT decimal arithmetic.
    */
  private def countTies(site: Site): Long = {
    val raw = inlineLateral(site, site.raw)
    val df = hostFrame(site, Seq(Alias(raw, "raw")()))
    val half = lit(new java.math.BigDecimal(
      java.math.BigInteger.valueOf(5), site.targetScale + 1))
    val tie =
      col("raw") - floor(col("raw"), lit(site.targetScale)) === half
    val Array(row) = df.filter(col("raw").isNotNull)
      .agg(coalesce(sum(when(tie, 1L)), lit(0L)).as("ties")).collect()
    row.getLong(0)
  }

  /** max |raw|·10ˢ for a dec2dbl site — must stay below 2⁵³/8 for the
    * conversion to be exact in both engines.
    */
  private def measureRep(site: Site): Double = {
    val raw = inlineLateral(site, site.raw)
    val df = hostFrame(site, Seq(Alias(raw, "raw")()))
    val Array(row) = df.filter(col("raw").isNotNull)
      .agg(coalesce(max(abs(col("raw").cast(DoubleType))), lit(0.0)))
      .collect()
    row.getDouble(0) * math.pow(10, site.targetScale)
  }

  /** Measurement runs with broadcast joins disabled: materializing a
    * lazy localCheckpoint inside BroadcastExchangeExec's relation
    * thread trips Spark's storage-level assertion; on the regular
    * execution path the same carve evaluates fine.
    */
  private def noBroadcast[T](body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rootCause(e: Throwable): Throwable = {
    var t = e
    while (t.getCause != null && t.getCause != t) t = t.getCause
    t
  }

  /** r15: the LM slot now holds `persist`ed frames (full lineage), so
    * an evicted model recomputes on its next action instead of dying
    * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the r12–r14
    * fresh-rebuild `withRetry` shim that masked that race is GONE, and
    * [[graft.LmSlotLivenessSpec]] pins that batch-discovered plans
    * stay executable after arbitrary later builds.
    */
  private def measure[T](site: Site)(f: Site => T): T =
    noBroadcast(f(site))

  // ---- adjudicated exceptions ------------------------------------

  /** Sites allowed below their pin / past their bound — or
    * unmeasurable — keyed `query/kind@scale`, with the reason.
    * Additions need a reviewed justification.
    */
  private val siteAllow: Map[String, String] = Map.empty

  /** Published raw doubles allowed with hazards beyond dec2dbl. */
  private val rawDoubleAllow: Map[String, String] = Map.empty

  /** Published columns allowed to ride a double SUM/AVG. */
  private val orderAllow: Map[String, String] = Map.empty

  // ---- shared discovery (construct each query once per SF) --------

  private lazy val discovered: Map[String, Seq[(String, DataFrame)]] =
    Seq(sf0001, sf001).map { dir =>
      dir -> SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
        (n, fn(spark, dir))
      }
    }.toMap

  private lazy val sitesBySf: Map[String, Seq[Site]] =
    discovered.map { case (dir, qs) =>
      dir -> qs.flatMap { case (n, df) => quantSites(n, df) }
    }

  private def key(s: Site) = s"${s.query}/${s.kind}@${s.targetScale}"

  // ---- the gates --------------------------------------------------

  test("every double quantization site keeps its margin from the " +
      "rounding boundary (1e-6 IEEE floor; adaptive pin under " +
      "libm/dec2dbl hazards; exact halves only on hazard-free " +
      "chains) at both fixture SFs") {
    for (dir <- Seq(sf0001, sf001)) {
      val sites = sitesBySf(dir).filter(s =>
        s.kind == "round-double" || s.kind == "floor-quant" ||
          s.kind == "cast-quant")
      assert(sites.nonEmpty, "walker found no double sites — broken?")
      val failures = mutable.Buffer.empty[String]
      sites.foreach { s =>
        if (!siteAllow.contains(key(s)))
          try {
            val m = measure(s)(measureDouble)
            // hazard drift bound: a few ulps of the value in g-space,
            // ≈ 8·|g|·2⁻⁵²; pin 10² above it (fixture minima sit
            // 10³–10⁴× above the TRUE drift even then), floored at
            // the 1e-6 IEEE-impl-skew pin
            val pin =
              if (s.hazards.isEmpty) 1e-6
              else math.max(1e-6, 1e2 * 8 * m.maxG * math.pow(2, -52))
            if (m.rows > 0 && m.minNonzero < pin)
              failures += f"${key(s)} hazards=${s.hazards.mkString(",")} " +
                f"minMargin=${m.minNonzero}%.3g pin=$pin%.3g rows=${m.rows}"
            if (m.exactHalves > 0 && s.hazards.nonEmpty)
              failures += s"${key(s)}: ${m.exactHalves} EXACT half " +
                s"values on a hazardous chain (${s.hazards.mkString(",")})" +
                " — one ulp of drift un-lands them"
          } catch {
            case e: Throwable =>
              val rc = rootCause(e)
              failures += s"${key(s)} UNMEASURABLE: " +
                s"${rc.getClass.getSimpleName} " +
                s"${String.valueOf(rc.getMessage).take(160)}"
          }
      }
      assert(failures.isEmpty,
        s"\n$dir: quantize sites below margin pin:\n" +
          failures.mkString("\n"))
    }
  }

  test("no decimal ROUND downscale ties exactly at the rounding digit " +
      "(both fixture SFs) — the r12 x118 failure class") {
    for (dir <- Seq(sf0001, sf001)) {
      val failures = sitesBySf(dir).filter(_.kind == "round-decimal")
        .flatMap { s =>
          if (siteAllow.contains(key(s))) None
          else try {
            val ties = measure(s)(countTies)
            if (ties > 0L)
              Some(s"${key(s)}: $ties exact half-ties (engine decimal " +
                "tie semantics can diverge)")
            else None
          } catch {
            case e: Throwable =>
              val rc = rootCause(e)
              Some(s"${key(s)} UNMEASURABLE: " +
                s"${rc.getClass.getSimpleName} " +
                s"${String.valueOf(rc.getMessage).take(160)}")
          }
        }
      assert(failures.isEmpty,
        s"\n$dir: decimal ROUND ties found:\n" + failures.mkString("\n"))
    }
  }

  test("every wide decimal→double conversion stays exact " +
      "(|value|·10^s < 2^53/8) at both fixture SFs") {
    for (dir <- Seq(sf0001, sf001)) {
      val bound = math.pow(2, 53) / 8
      val failures = sitesBySf(dir).filter(_.kind == "dec2dbl")
        .flatMap { s =>
          if (siteAllow.contains(key(s))) None
          else try {
            val rep = measure(s)(measureRep)
            if (rep >= bound)
              Some(f"${key(s)}: integer rep $rep%.3g ≥ 2^53/8 — " +
                "conversion may differ in the last ulp cross-engine")
            else None
          } catch {
            case e: Throwable =>
              val rc = rootCause(e)
              Some(s"${key(s)} UNMEASURABLE: " +
                s"${rc.getClass.getSimpleName} " +
                s"${String.valueOf(rc.getMessage).take(160)}")
          }
        }
      assert(failures.isEmpty,
        s"\n$dir: dec2dbl conversions past the exactness bound:\n" +
          failures.mkString("\n"))
    }
  }

  test("published raw doubles are hazard-free IEEE chains (dec2dbl " +
      "allowed — the rep gate covers it); no published column rides " +
      "a double SUM/AVG") {
    val failures = mutable.Buffer.empty[String]
    discovered(sf0001).foreach { case (n, df) =>
      val plan = df.queryExecution.analyzed
      val defs = definitions(plan)
      plan.output.foreach { attr =>
        if (attr.dataType == DoubleType) {
          val ch = chainHazards(attr, defs, mutable.Set.empty) - "dec2dbl"
          if (ch.nonEmpty && !rawDoubleAllow.contains(s"$n/${attr.name}"))
            failures += s"$n/${attr.name}: raw double published with " +
              s"hazards ${ch.mkString(",")} — quantize to micros or " +
              "adjudicate"
        }
        val oh = orderHazards(attr, defs, mutable.Set.empty)
        if (oh.nonEmpty && !orderAllow.contains(s"$n/${attr.name}"))
          failures += s"$n/${attr.name}: order-nondeterministic " +
            s"${oh.mkString(",")} under a published column"
      }
    }
    assert(failures.isEmpty,
      "\npublished-output hazards:\n" + failures.mkString("\n"))
  }

  test("allowlists contain no stale entries") {
    val published = discovered(sf0001).flatMap { case (n, df) =>
      df.schema.fields.map(f => s"$n/${f.name}")
    }.toSet
    val siteKeys = sitesBySf(sf0001).map(key).toSet
    assert((rawDoubleAllow.keySet -- published).isEmpty &&
      (orderAllow.keySet -- published).isEmpty &&
      (siteAllow.keySet -- siteKeys).isEmpty,
      "stale allowlist entries present")
  }
}
