package graft.ops

import org.apache.spark.sql.Dataset

/** Degenerate-scan rescue for CPU-bound kernels (r17, found by
  * `graft.tools.StageAudit`): a single small Parquet file with one
  * row group is INDIVISIBLE — `maxPartitionBytes` cannot split inside
  * a row group — so a scan of it yields ONE partition and every
  * expensive per-row kernel downstream (MinHash signatures, shingle
  * md5, image decode) serializes on one core. That is exactly the
  * single-file fixture shape (FIXTURES.md), and the audit showed it
  * costing 1.3–3.4 s of single-core wall in every dedup-family row.
  *
  * `ensure` repartitions to session parallelism ONLY when the input's
  * planned partition count is deficient. At deployment scale the scan
  * has thousands of splits and this is a no-op — the id-only-shuffle
  * scale story is untouched; on a degenerate input the one-time
  * round-robin exchange (the only place document text ever moves) is
  * strictly cheaper than running the kernel serially. Streaming
  * frames pass through untouched: micro-batch partitioning is the
  * source's concern, and `.rdd` is illegal on an unbound plan.
  */
object Parallelize {
  def ensure[T](ds: Dataset[T]): Dataset[T] = {
    if (ds.isStreaming) ds
    else {
      val n = ds.sparkSession.sparkContext.defaultParallelism
      if (ds.rdd.getNumPartitions >= n) ds else ds.repartition(n)
    }
  }
}
