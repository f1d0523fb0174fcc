package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for COMPUTE-heavy per-row kernels
  * (shingling, minhash signatures, fingerprinting).
  *
  * Spark sizes scan splits by BYTES (`maxPartitionBytes`,
  * `openCostInBytes`), which undercounts sources whose per-row compute
  * dwarfs their I/O: a sub-split-sized parquet table (one file, one
  * row group) yields ONE scan task, so every narrow transformation
  * chained onto it runs single-threaded however many cores the cluster
  * has — measured at fixture scale as 3–4 s single-task stages in the
  * containment/LSH family while 31 cores idle (guide §2.5's input-skew
  * case in its degenerate small-input form).
  *
  * [[spread]] inserts a round-robin repartition to the default
  * parallelism ONLY when the frame's planned partition count is below
  * half the core count — at production scale a corpus scan has
  * thousands of splits, the predicate is false, and the plan is
  * UNCHANGED (no exchange, pushdown intact). When it does fire, the
  * exchanged bytes are bounded by the small input that triggered it
  * (sub-split-scale, never corpus-scale). Round-robin repartition is
  * retry-deterministic (`sortBeforeRepartition`, SPARK-23207), and
  * every caller feeds order-independent aggregates/joins, so results
  * are unchanged — the driver's oracle gate re-proves that per query. */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming) df // micro-batch planning owns stream parallelism
    else {
      val cores = df.sparkSession.sparkContext.defaultParallelism
      // planned scan partition count — physical planning only, no job
      val parts = df.queryExecution.toRdd.getNumPartitions
      if (parts * 2 < cores) df.repartition(cores) else df
    }
}
