package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment — the
  * reproducibility primitives of a training-data pipeline. Every
  * decision is a pure function of a row's id (md5 prefix compared
  * against a hex threshold), so samples are stable across runs, engines,
  * partitionings and cluster sizes — unlike `TABLESAMPLE`/`rand()`,
  * which are seeded per-partition and change under repartitioning.
  *
  * Scale design (100 TB): all methods are stateless per-row filters /
  * projections (codegen'd md5 + string compare, no shuffle, no driver
  * state); they compose with pushed-down scans and keep full linear
  * scaling. The md5-prefix trick is the same one x23 uses; thresholds
  * are 4-hex-digit prefixes, giving 1/65536 rate granularity.
  */
object Sampling {

  /** 4-digit lowercase hex threshold for a sampling rate in [0, 1]:
    * a row is kept iff `substr(md5(id), 1, 4) < threshold`. Spark and
    * DuckDB both emit lowercase hex md5, so the same comparison is
    * expressible verbatim in oracle SQL.
    */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.min((rate * 65536).round, 65536L)}%04x" match {
      case t if t.length > 4 => "ffff~" // rate 1.0: above every 4-hex prefix
      case t => t
    }
  }

  private def prefix(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 4)

  /** Uniform deterministic sample at `rate`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(prefix(col(idCol)) < lit(hexThreshold(rate)))

  /** Stratified deterministic sample: per-stratum rates, `defaultRate`
    * for strata not listed. Classic pipeline use: downsample
    * over-represented sources (e.g. web crawl) while keeping curated
    * sources intact, without materializing per-stratum row numbers.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(prefix(col(idCol)) < threshold)
  }

  /** Train/val/test split assignment: adds a `split` column, a pure
    * function of the id hash. `trainRate` + `valRate` must be <= 1; the
    * remainder is `test`. Documents never migrate between splits when
    * the corpus grows — the property eval-set hygiene depends on.
    */
  def splitAssign(df: DataFrame, idCol: String,
      trainRate: Double, valRate: Double): DataFrame = {
    require(trainRate + valRate <= 1.0, "trainRate + valRate must be <= 1")
    val p = prefix(col(idCol))
    df.withColumn("split",
      when(p < lit(hexThreshold(trainRate)), "train")
        .when(p < lit(hexThreshold(trainRate + valRate)), "val")
        .otherwise("test"))
  }
}
