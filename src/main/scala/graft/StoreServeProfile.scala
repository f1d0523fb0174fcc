package graft

import org.apache.spark.sql.functions.col

/** Serve-probe pruning measurement (r22, guide §3.2 — the committed
  * instrument behind OPTIMIZATION_r22's serve numbers, the serve twin
  * of [[StoreJobProfile]]): builds a store of N disjoint appends,
  * probes it with a disjoint batch (the common crawl case) and an
  * overlapping one, and prints per-serve input bytes + min-of-3 walls
  * with the sketch pruning OFF (`servePruneMinBytes=-1`, the r21 shape:
  * every serve unions every committed component) vs FORCED ON (`=0`).
  * Optionally dumps the pruned/unpruned `.explain("formatted")` plans,
  * where the pruning shows up as the scan's shrunken file list (or the
  * empty LocalRelation for a zero-hit probe).
  *
  * Usage: runMain graft.StoreServeProfile [sfDir] [nAppends] [plansDir]
  */
object StoreServeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nAppends = if (args.length > 1) args(1).toInt else 8
    val plansDir = if (args.length > 2) Some(args(2)) else None
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.sources.Tables.clearCaches()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm
    val store = {
      val dir = TempDirs.create("graft-serve-profile")
      val mod = 2 * nAppends
      (0 until nAppends).foreach(i =>
        graft.operators.SnapshotStore.append(spark, dir,
          docs.where(col("doc_id") % mod === i * 2)))
      dir
    }
    // disjoint probe: odd ids never appended (no exact/fp dup of an
    // even doc id's text exists in the fixtures' odd half only as
    // near-dup content, so digest pruning sees ~zero hits while band
    // pruning sees the genuine near-dup appends)
    val probe = docs.where(col("doc_id") % 2 === 1)
    def bytesRead(body: => Unit): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            n.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(1200) }
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def serveD() = graft.operators.SnapshotStore.serveDelta(
      spark, store, probe, col("text"), col("source"))
    def serveN() = graft.operators.SnapshotStore.serveNearDup(
      spark, store, probe)
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ => val (_, s) = BenchUtil.timed(body); s }.min
    Seq("-1" -> "unpruned", "0" -> "pruned").foreach { case (v, label) =>
      spark.conf.set(graft.operators.SnapshotStore.ServePruneConfKey, v)
      val bD = bytesRead(noop(serveD()))
      val bN = bytesRead(noop(serveN()))
      val tD = minOf3(noop(serveD()))
      val tN = minOf3(noop(serveN()))
      println(f"[serve-profile] $label%-8s appends=$nAppends " +
        f"delta_bytes=$bD%d neardup_bytes=$bN%d " +
        f"t_delta=$tD%.2fs t_neardup=$tN%.2fs")
      plansDir.foreach { pd =>
        new java.io.File(pd).mkdirs()
        Seq("serve_delta" -> serveD(), "serve_neardup" -> serveN())
          .foreach { case (nm, df) =>
            val w = new java.io.PrintWriter(s"$pd/${nm}_$label.txt")
            try w.println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            finally w.close()
          }
      }
    }
    spark.conf.unset(graft.operators.SnapshotStore.ServePruneConfKey)
    spark.stop()
  }
}
