package graft

import org.apache.spark.sql.functions.col

import graft.operators.SnapshotStore

/** Measured evidence for the SnapshotStore COMPACTION claim (SCALING.md):
  * every store read pays O(appends) metadata — one manifest read plus a
  * `listStatus` per append per component ([[SnapshotStore]]'s
  * `componentPaths`) plus a parquet footer per append dir at plan time —
  * so a store accumulated over many small crawl-cycle increments makes
  * every probe pay that walk, and [[SnapshotStore.compact]] collapses it
  * to one dir per component.
  *
  * This main builds a store from N deliberately TINY appends (metadata
  * must dominate for the claim to be testable at fixture scale — this
  * is exactly the many-small-increments regime the crawl cycle
  * produces), then times, min-of-K:
  *   plan_ms  — constructing the four component DataFrames (manifest +
  *              listings + footer reads; no job run);
  *   probe_ms — one full store-served delta classification
  *              ([[SnapshotStore.serveDelta]], executed to a count);
  *   append_ms — one full stage+audit+publish of a tiny novel delta
  *              (the s42 per-micro-batch hot path — the r20 pruned
  *              commit audit keeps this flat in committed appends).
  * before and after compact+gcOrphans, printing one JSON line.
  *
  * Usage: runMain graft.StoreMetaBench [sfDir] [nAppends] [iters]
  */
object StoreMetaBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val n = if (args.length > 1) args(1).toInt else 48
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint() // sever the fixture scan from the timed plans
    val probe = docs.where(col("doc_id") % 7 === 0).localCheckpoint()

    val dir = TempDirs.create("graft-store-meta-bench")
    (0 until n).foreach { i =>
      SnapshotStore.append(spark, dir, docs.where(col("doc_id") % n === i))
    }

    def minOf(k: Int)(body: => Unit): Double =
      (1 to k).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.min

    def planMs(): Double = minOf(iters) {
      SnapshotStore.sets(spark, dir)
      SnapshotStore.bands(spark, dir)
      SnapshotStore.digests(spark, dir)
      SnapshotStore.fps(spark, dir)
    }
    def probeMs(): Double = minOf(iters) {
      SnapshotStore.serveDelta(spark, dir, probe,
        col("text"), col("source")).count()
    }
    // append_ms — one full stage+audit+publish of a TINY novel delta
    // into the accumulated store: the s42 per-micro-batch hot path.
    // The r20 pruned audit (baseline racers + did blooms) should keep
    // this flat in the number of committed appends — before r20 every
    // commit's audit re-scanned every committed component. Each timed
    // append uses fresh doc ids/text so the audit never rejects; the
    // store grows by `iters` one-row appends per measurement, which is
    // noise in the metadata regime this bench isolates.
    var freshId = 10_000_000L
    def appendMs(): Double = minOf(iters) {
      import spark.implicits._
      freshId += 1
      val one = Seq((freshId, "bench",
        s"novel $freshId content ${freshId * 31} row ${freshId * 17}"))
        .toDF("doc_id", "source", "text")
      SnapshotStore.append(spark, dir, one)
    }

    // manifest history: one MANIFEST.v{N} per commit accumulates until
    // gcOrphans trims it to the retention floor — the r18 flat-listing
    // claim, measured alongside the append-dir collapse
    def manifestFiles(): Int = new java.io.File(dir).listFiles()
      .count(_.getName.matches("""MANIFEST\.v\d+"""))

    // counts captured BEFORE appendMs: the timed one-row appends must
    // not inflate the reported before-state (ADVICE r20) — they do
    // still land in the store the compact below rewrites, which is
    // noise in this metadata-dominated regime
    val (planBefore, probeBefore) = (planMs(), probeMs())
    val nBefore = SnapshotStore.committedIds(spark, dir).size
    val mfBefore = manifestFiles()
    val appendBefore = appendMs()
    SnapshotStore.compact(spark, dir)
    SnapshotStore.gcOrphans(spark, dir)
    val nAfter = SnapshotStore.committedIds(spark, dir).size
    val mfAfter = manifestFiles()
    val (planAfter, probeAfter) = (planMs(), probeMs())
    val appendAfter = appendMs()

    def ms(v: Double): Double = math.rint(v * 10) / 10
    println(s"""{"metric":"store_meta_bench","sf":"$sfDir"""" +
      s""","appends_before":$nBefore,"appends_after":$nAfter""" +
      s""","manifest_files_before":$mfBefore,"manifest_files_after":$mfAfter""" +
      s""","plan_ms_before":${ms(planBefore)},"plan_ms_after":${ms(planAfter)}""" +
      s""","probe_ms_before":${ms(probeBefore)},"probe_ms_after":${ms(probeAfter)}""" +
      s""","append_ms_before":${ms(appendBefore)},"append_ms_after":${ms(appendAfter)}""" +
      s""","iters":$iters}""")
    spark.stop()
  }
}
