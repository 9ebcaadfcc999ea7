package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** `Tables.load` must take the `events.ts` type from the Parquet footer,
  * not from an assumed fixture byte-layout: the driver has shipped the
  * column both as TIMESTAMP(NANOS) (readable only as a raw Long under
  * `nanosAsLong`) and as real TIMESTAMP(MICROS). Both layouts must load
  * to identical `timestamp_ntz` values.
  */
class TablesSpec extends SparkSpec {

  // One instant, expressed in both fixture layouts.
  private val microsValues = Seq(1700000000000000L, 1700000123456789L, 0L)

  private def writeNanosLayout(dir: String): Unit = {
    val schema = Types.buildMessage()
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("event_id")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .withConf(new Configuration())
      .build()
    try {
      microsValues.zipWithIndex.foreach { case (us, i) =>
        val g = new SimpleGroup(schema)
        g.add("ts", us * 1000L)
        g.add("event_id", i.toLong)
        writer.write(g)
      }
    } finally writer.close()
  }

  private def writeMicrosLayout(dir: String): Unit = {
    val rows = microsValues.zipWithIndex.map { case (us, i) =>
      Row(java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC), i.toLong)
    }
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("event_id", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loads identically from nanos-as-long and micros layouts") {
    val nanosDir = Files.createTempDirectory("graft-tables-nanos").toString
    val microsDir = Files.createTempDirectory("graft-tables-micros").toString
    writeNanosLayout(nanosDir)
    writeMicrosLayout(microsDir)

    val fromNanos = Tables.load(spark, nanosDir, "events")
    val fromMicros = Tables.load(spark, microsDir, "events")

    assert(fromNanos.schema("ts").dataType == TimestampNTZType)
    assert(fromMicros.schema("ts").dataType == TimestampNTZType)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
        .sortBy(_._1).toSeq
    assert(rows(fromNanos) == rows(fromMicros))
    assert(rows(fromNanos).map(_._2) == microsValues.map(us =>
      java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)))
  }

  test("the real fixture's events table loads with a timestamp_ntz ts") {
    val df = Tables.load(spark, sf0001, "events")
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.limit(1).count() == 1)
  }
}
