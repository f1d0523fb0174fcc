package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions.col

/** Job-level profile of one SnapshotStore lifecycle (the n90 shape by
  * default): prints every Spark job's wall and description plus the
  * driver-side gaps between jobs — the instrument for the store
  * family's fixed-cost floor, where per-query wall is dominated by
  * SEQUENTIAL job launches rather than task compute (OPTIMIZATION_r21).
  *
  * Usage: runMain graft.StoreJobProfile [sfDir] [shape]
  *   shape: n90 (2 appends + serveDelta count) | n95 (keyed appends +
  *   compact + gc + replay + serveNearDup count)
  */
object StoreJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val shape = if (args.length > 1) args(1) else "n90"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.sources.Tables.clearCaches()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time,
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse(""))))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.get(j.jobId)
        if (st != null) done.add((j.jobId, st._1, j.time, st._2))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    shape match {
      case "n90" =>
        val dir = TempDirs.create("graft-profile-n90")
        graft.operators.SnapshotStore.append(spark, dir,
          docs.where(col("doc_id") % 3 === 0))
        graft.operators.SnapshotStore.append(spark, dir,
          docs.where(col("doc_id") % 3 === 1))
        graft.operators.SnapshotStore.serveDelta(spark, dir,
          docs.where(col("doc_id") % 3 === 2), col("text"), col("source"))
          .write.mode("overwrite").format("noop").save()
      case "n95" =>
        val pd = SparkEntry.queries("n95_compacted_replay_serve")
        pd(spark, sfDir).write.mode("overwrite").format("noop").save()
      case other =>
        SparkEntry.queries(other)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._2)
    var prevEnd = 0L
    var jobMs = 0L
    var gapMs = 0L
    rows.foreach { case (id, st, en, desc) =>
      val gap = if (prevEnd == 0) 0 else math.max(0, st - prevEnd)
      println(f"job $id%3d ${en - st}%6d ms  gap $gap%5d ms  ${desc.take(90)}")
      jobMs += en - st
      gapMs += gap
      prevEnd = math.max(prevEnd, en)
    }
    println(f"[profile] $shape%s wall=$wall%.2fs jobs=${rows.size}%d " +
      f"jobMs=${jobMs}%d gapMs=${gapMs}%d")
    spark.stop()
  }
}
