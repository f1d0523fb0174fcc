package graft

import org.apache.spark.sql.functions.col

/** IVFADC serving-path measurement (`runMain graft.ServeBench [sfDir]`):
  * the n78 plan's claim is that cell-pruning FIRST cuts the scored
  * fan-out from the harness's Probes × N cross-join rows to the
  * candidate-set size Σ_p |{v : cell(v) ∈ cells_p}| (≈ nprobe/Cells of
  * it under uniform cells). This main reads both numbers from the
  * EXECUTED n78 plan — the cell equi-join's numOutputRows vs Probes·N
  * — plus min-of-3 walls for n76/n78, for the BASELINE.md record.
  * At production layout (corpus bucketed by cell, Cells≈2¹⁰,
  * nprobe≈8) the same literal IN prunes the SCAN, not just the
  * fan-out; the fixture's Cells=4 bounds what local measurement can
  * show. */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.sources.Tables.clearCaches()
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val df = graft.operators.IvfPq.ivfPqServe(emb, 10)
    df.collect() // executes df's own QueryExecution (metrics live)
    val joinRows = BenchUtil.metricMaxWhere(
      df.queryExecution.executedPlan, "numOutputRows")(p =>
      p.nodeName.contains("BroadcastHashJoin"))
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ => val (_, s) = BenchUtil.timed(body); s }.min
    val t76 = minOf3(graft.operators.IvfPq.ivfPqRecall(emb, 10)
      .write.mode("overwrite").format("noop").save())
    val t78 = minOf3(graft.operators.IvfPq.ivfPqServe(emb, 10)
      .write.mode("overwrite").format("noop").save())
    // n79 includes the one-time index write each run (a deployment
    // amortizes it); t_n79 is the honest per-query cost of the
    // materialized layout at harness scale
    val t79 = minOf3(graft.operators.IvfPq.ivfPqServeIndexed(emb, 10)
      .write.mode("overwrite").format("noop").save())
    val fanout = graft.operators.Similarity.Probes * n
    println(f"[serve] sf=$sfDir n_vecs=$n scored_rows=$joinRows " +
      f"harness_fanout=$fanout ratio=${joinRows.toDouble / fanout}%.3f " +
      f"t_n76=$t76%.2fs t_n78=$t78%.2fs t_n79=$t79%.2fs")
    spark.stop()
  }
}
