package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, SnapshotStore}
import graft.streaming.StreamQueries

/** The streaming crawl increment (s42): draining an increment through
  * [[StreamQueries.streamCrawlIncrement]] — flags per micro-batch,
  * survivors appended back per micro-batch through the crash-atomic
  * commit — leaves the SAME store as the batch
  * [[Curation.cycleAppend]], every component row for row, under
  * FORCED multi-batch execution (maxFilesPerTrigger=1). */
class StreamCrawlIncrementSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def snap(i: Int) = docs.where(col("doc_id") % 3 === i)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // the store's own component registry — every component, including
  // the persisted curated corpus (docs); a component added to the
  // store is automatically covered by these comparisons
  private val components = SnapshotStore.Components
  private def readComp(d: String, comp: String): org.apache.spark.sql.DataFrame =
    SnapshotStore.componentByName(spark, d, comp)

  // budgets above the chunk token volume, as in CrawlCycleSpec: stage 5
  // keeps every stage-4 survivor, maximizing cross-chunk dup coverage
  // (the declared s42 query exercises LIVE budgets)
  private val bEn = 1000000L
  private val bOther = 1000000L

  test("streamed increment == batch cycleAppend store, per component") {
    val dirStream = TempDirs.create("s42-stream-store")
    val dirBatch = TempDirs.create("s42-batch-store")
    // cycle 1 bootstraps BOTH stores identically, batch-side
    Curation.cycleAppend(spark, dirStream, snap(0), bEn, bOther)
    Curation.cycleAppend(spark, dirBatch, snap(0), bEn, bOther)

    // increment 2 as a 3-file source: maxFilesPerTrigger=1 forces the
    // flags AND the store appends through ≥3 separate micro-batches
    val src = TempDirs.create("s42-increment-src")
    snap(1).repartition(3).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    StreamQueries.streamCrawlIncrement(spark, dirStream, "dump-2", stream,
      snap(1), bEn, bOther)
    val curatedBatch = Curation.cycleAppend(spark, dirBatch, snap(1),
      bEn, bOther)

    // non-vacuity: the increment curated something, and the stream
    // really committed it across MULTIPLE appends (bootstrap + one per
    // non-empty micro-batch) — otherwise the multi-batch claim is
    // untested
    assert(curatedBatch.count() > 0, "increment curated nothing")
    val nAppends = SnapshotStore.committedIds(spark, dirStream).size
    assert(nAppends >= 3,
      s"expected >= 2 micro-batch appends beyond the bootstrap, got " +
        s"${nAppends - 1}")

    for (comp <- components)
      assert(rows(readComp(dirStream, comp)) == rows(readComp(dirBatch, comp)),
        s"component $comp differs between streamed and batch increment")

    // ...and the next probe answers identically from either store
    assert(rows(SnapshotStore.serveDelta(spark, dirStream, snap(2),
        col("text"), col("source"))) ==
      rows(SnapshotStore.serveDelta(spark, dirBatch, snap(2),
        col("text"), col("source"))))
  }

  test("streaming an increment into an empty store refuses") {
    val dir = TempDirs.create("s42-empty-store")
    val src = TempDirs.create("s42-empty-src")
    snap(1).limit(5).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    val e = intercept[IllegalArgumentException] {
      StreamQueries.streamCrawlIncrement(spark, dir, "dump-x", stream,
        snap(1), bEn, bOther)
    }
    assert(e.getMessage.contains("non-empty pre-increment store"))
  }

  test("a sibling increment whose id EXTENDS this one's stays in the gate state") {
    // r19 review: a prefix filter on append-$incrementId- would also
    // swallow increment "dump-2-extra"'s committed appends when
    // draining increment "dump-2" — their digests would vanish from
    // the gate state and arriving dups of that content would pass.
    // The exact-id filter keeps them; drained store == batch twin.
    val dirStream = TempDirs.create("s42-sibling-store")
    val dirBatch = TempDirs.create("s42-sibling-batch")
    // the sibling re-crawled a sixth of the increment's pages (same
    // content, same ids) — the realistic overlapping-crawl shape, and
    // guaranteed bite: with the sibling filtered out of the gate
    // state, these docs would NOT be gated on arrival and their
    // append would collide with the sibling's committed rows
    val sibling = snap(1).where(col("doc_id") % 6 === 4)
    assert(sibling.count() > 0)
    for (d <- Seq(dirStream, dirBatch)) {
      Curation.cycleAppend(spark, d, snap(0), bEn, bOther)
      SnapshotStore.appendAs(spark, d, "append-dump-2-extra-b0", sibling,
        persistDocs = true)
    }
    val src = TempDirs.create("s42-sibling-src")
    snap(1).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    StreamQueries.streamCrawlIncrement(spark, dirStream, "dump-2", stream,
      snap(1), bEn, bOther)
    Curation.cycleAppend(spark, dirBatch, snap(1), bEn, bOther)
    for (comp <- components)
      assert(rows(readComp(dirStream, comp)) == rows(readComp(dirBatch, comp)),
        s"component $comp differs with a sibling increment present")
  }

  test("a RESTARTED increment (own appends already committed) == batch twin") {
    // ADVICE r18: a restart resolves a manifest that already lists the
    // increment's own earlier appends. Gate state built from it drifts
    // (kept drops the committed survivors -> rates inflate, the LSH
    // loser set shrinks) and later batches would commit different
    // survivors than the batch twin. The pre-increment pin (filter the
    // increment's keyed ids out of the snapshot) makes both sessions
    // train IDENTICAL gates — proven here by a two-session drain over
    // a stable checkpoint with LIVE budgets (saturated rates would
    // mask the rate-inflation failure mode).
    val dirStream = TempDirs.create("s42-restart-store")
    val dirBatch = TempDirs.create("s42-restart-batch")
    val (rEn, rOther) = (2000L, 1000L)
    Curation.cycleAppend(spark, dirStream, snap(0), rEn, rOther)
    Curation.cycleAppend(spark, dirBatch, snap(0), rEn, rOther)
    val src = TempDirs.create("s42-restart-src")
    val ckpt = TempDirs.create("s42-restart-ckpt")
    def streamOf = spark.readStream.schema(snap(1).schema).parquet(src)
    // SESSION 1: only part of the increment's files have arrived
    snap(1).where(col("doc_id") % 6 === 1).write.mode("append").parquet(src)
    StreamQueries.streamCrawlIncrement(spark, dirStream, "dump-2",
      streamOf, snap(1), rEn, rOther, checkpoint = Some(ckpt))
    val idsAfter1 = SnapshotStore.committedIds(spark, dirStream)
    assert(idsAfter1.exists(_.startsWith("append-dump-2-")),
      "session 1 committed nothing — the restart scenario is vacuous")
    // SESSION 2 (the restart): the rest arrives; the manifest now
    // lists the increment's own appends, the exact hazard state
    snap(1).where(col("doc_id") % 6 === 4).write.mode("append").parquet(src)
    StreamQueries.streamCrawlIncrement(spark, dirStream, "dump-2",
      streamOf, snap(1), rEn, rOther, checkpoint = Some(ckpt))
    assert(SnapshotStore.committedIds(spark, dirStream).size > idsAfter1.size,
      "session 2 committed nothing — the restart scenario is vacuous")
    // == ONE uninterrupted batch increment, every component
    Curation.cycleAppend(spark, dirBatch, snap(1), rEn, rOther)
    for (comp <- components)
      assert(rows(readComp(dirStream, comp)) == rows(readComp(dirBatch, comp)),
        s"component $comp differs after the restarted increment")
    assert(rows(SnapshotStore.serveDelta(spark, dirStream, snap(2),
        col("text"), col("source"))) ==
      rows(SnapshotStore.serveDelta(spark, dirBatch, snap(2),
        col("text"), col("source"))))
  }

  test("a replayed keyed append is a no-op (exactly-once by replay key)") {
    val dir = TempDirs.create("s42-replay-store")
    SnapshotStore.append(spark, dir, snap(0))
    // first keyed commit lands...
    assert(SnapshotStore.appendAs(spark, dir, "append-dump-2-b0", snap(1)))
    val ids = SnapshotStore.committedIds(spark, dir)
    val before = Seq(
      rows(SnapshotStore.sets(spark, dir)),
      rows(SnapshotStore.bands(spark, dir)),
      rows(SnapshotStore.digests(spark, dir)),
      rows(SnapshotStore.fps(spark, dir)))
    // ...the replay (same id — crash between store commit and stream
    // checkpoint commit) must change NOTHING
    assert(!SnapshotStore.appendAs(spark, dir, "append-dump-2-b0", snap(1)))
    assert(SnapshotStore.committedIds(spark, dir) == ids)
    val after = Seq(
      rows(SnapshotStore.sets(spark, dir)),
      rows(SnapshotStore.bands(spark, dir)),
      rows(SnapshotStore.digests(spark, dir)),
      rows(SnapshotStore.fps(spark, dir)))
    assert(before == after)
  }

  test("a torn keyed staging is replaced, not erred, on re-append") {
    val dir = TempDirs.create("s42-torn-store")
    SnapshotStore.append(spark, dir, snap(0))
    // simulate a crash between stage and commit of a keyed append
    SnapshotStore.stageAs(spark, dir, "append-dump-2-b1", snap(1))
    // the recovery re-append under the same id must land cleanly
    assert(SnapshotStore.appendAs(spark, dir, "append-dump-2-b1", snap(1)))
    assert(SnapshotStore.committedIds(spark, dir).contains("append-dump-2-b1"))
    // and the store equals a plain two-append build
    val ref = TempDirs.create("s42-torn-ref")
    SnapshotStore.append(spark, ref, snap(0))
    SnapshotStore.append(spark, ref, snap(1))
    assert(rows(SnapshotStore.sets(spark, dir)) ==
      rows(SnapshotStore.sets(spark, ref)))
    assert(rows(SnapshotStore.digests(spark, dir)) ==
      rows(SnapshotStore.digests(spark, ref)))
  }
}
