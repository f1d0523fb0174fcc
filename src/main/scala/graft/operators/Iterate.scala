package graft.operators

import org.apache.spark.sql.DataFrame

/** Iteration-safe lineage cut for fixpoint loops (BPE training,
  * connected components).
  *
  * `localCheckpoint(eager = true)` truncates the EXECUTION lineage but
  * Spark's checkpoint also stashes the source plan's estimated
  * `Statistics` on the resulting `LogicalRDD` (originStats). In an
  * iterative algorithm those carried estimates COMPOUND: every round's
  * self-join multiplies sizeInBytes estimates, the next round
  * checkpoints that product as its leaf statistic, and the estimate
  * grows as a power tower. MEASURED (BpeBench, round 9): BPE training
  * ran 0.6 s/iteration flat for 18 rounds, then per-iteration wall
  * grew 2.5–4× per round — a thread dump showed the driver 100% CPU in
  * `SizeInBytesOnlyStatsPlanVisitor` multiplying BigIntegers with tens
  * of thousands of digits (Toom-Cook-3 frames), while every executor
  * sat idle. Rebasing the checkpointed frame on its raw RDD drops the
  * carried statistics (the fresh `LogicalRDD` falls back to default
  * leaf stats) and the loop stays flat: same blocks, same rows, same
  * plan — only the compounding estimate is severed.
  */
object Iterate {

  /** Materialize `df` once (eager local checkpoint) and return a frame
    * backed by the materialized blocks that carries NO origin
    * statistics. `coalesceTo = Some(1)` (default) suits
    * vocabulary-/label-sized iteration state; pass `None` to keep the
    * input partitioning when the state is larger (e.g. the paired
    * vertex set in connected components). */
  def cut(df: DataFrame, coalesceTo: Option[Int] = Some(1)): DataFrame = {
    val cp = coalesceTo.fold(df)(df.coalesce).localCheckpoint()
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
