package graft

import org.apache.spark.sql.types._

/** The published-TYPE portability gate (r14, verdict item 2) — the
  * type-level complement of RoundingMarginSpec.
  *
  * r13 proved the portability contract covers the published SCHEMA,
  * not just the published values: the six driver hash-fails
  * (q1/q4/q5/q9/q20/x119) were EXACTLY the six queries publishing a
  * decimal with precision > 18, while all 151 green queries published
  * only precision ≤ 18 decimals or primitives. Precision ≤ 18 decimals
  * are int64-backed in DuckDB; wider ones are int128/hugeint-backed,
  * and that conversion/rendering surface moved between DuckDB
  * versions. The values were provably exact (RoundingMarginSpec) —
  * the TYPE alone made them unportable.
  *
  * Contract enforced here: every field of every `SparkEntry.queries`
  * output schema must be built from the proven-portable set
  *
  *   { boolean, byte, short, int, long, float, double, string,
  *     binary, date, timestamp, decimal(p ≤ 18, s) }
  *
  * closed under array / struct / map. Anything else — notably ANY
  * DecimalType with precision > 18 — fails this suite at build time,
  * before the driver ever sees it. Schemas come from the lazy plan
  * (`df.schema` analyzes without executing), so the gate walks all
  * ~165 queries in seconds.
  */
class PublishedTypeSpec extends SparkSpec {

  /** Is `dt` in the portable closure? Returns the offending leaf
    * type's description, or None if portable.
    */
  private def violation(dt: DataType): Option[String] = dt match {
    // NOTE DateType is deliberately ABSENT: none of the 160 driver-
    // green queries publishes a DATE, and the r14 x130 draft proved
    // the compare stack renders engine DATEs differently (date object
    // vs midnight timestamp). Publish TIMESTAMP (q15/q20 precedent).
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType |
        TimestampType => None
    // Tables.load normalizes the fixture's nano-timestamps to
    // timestamp_ntz; x53 publishes it and is driver-green since r9 —
    // proven portable.
    case TimestampNTZType => None
    case d: DecimalType =>
      if (d.precision <= 18) None
      else Some(s"DECIMAL(${d.precision},${d.scale}) — precision > 18 " +
        "is int128/hugeint-backed in DuckDB (the r13 divergent surface)")
    case a: ArrayType => violation(a.elementType)
    case s: StructType =>
      s.fields.iterator.flatMap(f => violation(f.dataType)).toSeq.headOption
    case m: MapType =>
      violation(m.keyType).orElse(violation(m.valueType))
    case other => Some(s"non-portable type $other")
  }

  test("every published column of every declared query has a " +
      "portable type (no decimal wider than precision 18)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val schema = q(spark, sf0001).schema
        schema.fields.flatMap { f =>
          violation(f.dataType).map(v => s"$name.${f.name}: $v")
        }
    }
    assert(bad.isEmpty,
      s"\ntype-unportable published columns:\n  ${bad.mkString("\n  ")}")
  }

  test("the gate itself rejects a DECIMAL(38,6) column (negative " +
      "self-test)") {
    val wide = StructType(Seq(
      StructField("ok", LongType),
      StructField("money", DecimalType(38, 6))))
    val hits = wide.fields.flatMap(f => violation(f.dataType))
    assert(hits.length === 1 && hits.head.contains("DECIMAL(38,6)"))
    // and the closure versions too: array<decimal(38,0)>, nested struct
    assert(violation(ArrayType(DecimalType(38, 0))).isDefined)
    assert(violation(StructType(Seq(
      StructField("inner", DecimalType(19, 0))))).isDefined)
    assert(violation(DecimalType(18, 6)).isEmpty)
  }
}
