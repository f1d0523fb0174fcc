package graft.operators

import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The MATERIALIZED cross-snapshot dedup index store — the artifact
  * n85's scaladoc names: successive crawls probe the ACCUMULATED
  * corpus's indexes, so a production pipeline writes them once per
  * snapshot and serves every later ingest from the store instead of
  * re-deriving corpus-sized lineage per run (the n79/s33 move applied
  * to the snapshot family).
  *
  * Layout under `dir/` (all plain parquet):
  *   MANIFEST                  committed append ids, one per line, in
  *                             commit order (readers resolve ONLY
  *                             through this — the file layout is the
  *                             contract, not who wrote it)
  *   appends/<id>/sets/        (did, sset)      one row per doc
  *   appends/<id>/bands/       (did, band, key) the LSH banding index
  *   appends/<id>/digests/     (h)              DISTINCT exact md5 DELTA
  *   appends/<id>/fps/         (fp)             DISTINCT fingerprint DELTA
  *
  * CRASH ATOMICITY — the Publish.scala write-audit-publish discipline
  * at append granularity: [[stage]] writes all four component deltas
  * under a fresh `appends/<id>/` directory that no reader resolves
  * (readers union only MANIFEST-listed appends), [[commit]] AUDITS the
  * staged bytes as they exist on disk (the distinct-digest invariant:
  * staged digest/fp deltas must be disjoint from the committed store —
  * exactly the property the probe joins rely on), and only then
  * publishes by atomically renaming a rewritten MANIFEST over the old
  * one (FileContext rename-with-OVERWRITE — atomic on HDFS and local
  * filesystems; an object-store deployment swaps in its conditional-put
  * commit, the same trade [[Publish]] documents). A crash at ANY point
  * before the rename leaves the store readable at the previous
  * manifest; the orphaned staging directory is invisible and can be
  * GC'd by id at leisure.
  *
  * SINGLE WRITER PER STORE: stage→commit is read-modify-write of the
  * manifest, so concurrent appends to the same store must serialize
  * (two racing commits would derive their manifest from the same
  * pre-commit state and the second rename would drop the first's id).
  * The commit-time audit additionally catches the CONTENT hazard of a
  * stage/commit interleaving — a staged delta whose digests were
  * anti-joined against a stale committed state fails its disjointness
  * audit instead of silently breaking one-row-per-distinct-value
  * (ADVICE r16). Appends from different jobs therefore go through a
  * queue or a lock, as every manifest-based table format requires.
  *
  * APPEND == REBUILD (SnapshotStoreSpec proves it across 3 chunks):
  * sets/bands rows are per-doc and banding is per-row deterministic
  * (the shared [[MinHashLsh.bandKeysFromSig]] kernel), so appending N
  * snapshots yields exactly the rebuild's row multiset; the digest
  * components keep their one-row-per-distinct-value invariant by
  * anti-joining each snapshot's digests against the COMMITTED store
  * before the staged write — and because the write lands in the
  * staging directory, the job never scans a path it is writing into
  * (no localCheckpoint pinning executor block storage — the r16 trade,
  * resolved by the staging itself).
  *
  * Scale: each append is one scan of the NEW snapshot (sets + bands
  * map-side; digests two map-side-combined distincts + an anti-join
  * against the committed store, hash-partitioned on the digest) plus
  * an O(delta) semi-join audit of the staged bytes; serving is
  * stateless equi-joins against (multi-path) file scans — no
  * corpus-sized state, no broadcast assumption anywhere. */
object SnapshotStore {

  private def hfs(spark: SparkSession, p: HPath) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed append ids, in commit order (empty before the first
    * successful commit — readers resolve ONLY these). */
  def committedIds(spark: SparkSession, dir: String): Seq[String] = {
    val mf = new HPath(s"$dir/MANIFEST")
    val fs = hfs(spark, mf)
    if (!fs.exists(mf)) Seq.empty
    else {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toVector
      finally in.close()
    }
  }

  /** True once at least one append has committed. */
  def nonEmpty(spark: SparkSession, dir: String): Boolean =
    committedIds(spark, dir).nonEmpty

  /** A component dir contributes to a scan only if a task actually
    * wrote a part file there (an all-rows-deduped digest delta writes
    * none — the empty delta is a legal, invisible component). */
  private def hasParquet(spark: SparkSession, p: String): Boolean = {
    val hp = new HPath(p)
    val fs = hfs(spark, hp)
    fs.exists(hp) &&
      fs.listStatus(hp).exists(_.getPath.getName.endsWith(".parquet"))
  }

  private def readComponent(spark: SparkSession, dir: String,
      comp: String): DataFrame = {
    val paths = committedIds(spark, dir)
      .map(id => s"$dir/appends/$id/$comp")
      .filter(hasParquet(spark, _))
    require(paths.nonEmpty,
      s"SnapshotStore at $dir has no committed $comp rows")
    spark.read.parquet(paths: _*)
  }

  /** STAGE one snapshot's index rows: all four component deltas are
    * written under `appends/<id>/`, which no reader resolves until
    * [[commit]] publishes the id. Doc ids must be distinct across
    * appended snapshots (caller contract, as in
    * [[MinHashLsh.snapshotNearDupPairs]]). Returns the append id. */
  private[graft] def stage(spark: SparkSession, dir: String,
      snapshot: DataFrame, id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2): String = {
    val aid = s"append-${java.util.UUID.randomUUID()}"
    val base = s"$dir/appends/$aid"
    val sets = snapshot
      .select(col(id).as("did"), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0)
    sets.write.mode("error").parquet(s"$base/sets")
    MinHashLsh.banded(sets, k, r).write.mode("error")
      .parquet(s"$base/bands")
    stageDistinct(spark, dir, "digests", aid,
      snapshot.select(md5(col(text)).as("h")).distinct())
    stageDistinct(spark, dir, "fps", aid,
      snapshot.select(Text.fingerprint(col(text)).as("fp")).distinct())
    aid
  }

  /** Stage only rows NOT already committed for the component —
    * preserves the one-row-per-distinct-digest invariant, making
    * append == rebuild. The write target (staging) is never the read
    * source (committed appends), so the job needs no lineage cut. */
  private def stageDistinct(spark: SparkSession, dir: String, comp: String,
      aid: String, rows: DataFrame): Unit = {
    val delta =
      if (nonEmpty(spark, dir))
        rows.join(readComponent(spark, dir, comp),
          rows.columns.toSeq, "left_anti")
      else rows
    delta.write.mode("error").parquet(s"$dir/appends/$aid/$comp")
  }

  /** AUDIT the staged append as it exists on disk, then atomically
    * publish it into the manifest. The audit re-reads the staged
    * digest/fp deltas (the bytes a consumer would scan, not the
    * producing plan) and requires them disjoint from the committed
    * store — the invariant every probe join relies on; a staged append
    * whose anti-join ran against a stale manifest (a racing commit
    * landed in between) is REJECTED here, its staging directory
    * deleted and the manifest untouched. */
  private[graft] def commit(spark: SparkSession, dir: String,
      aid: String): Unit = {
    val base = s"$dir/appends/$aid"
    val conflict = Seq("digests", "fps").exists { comp =>
      hasParquet(spark, s"$base/$comp") && nonEmpty(spark, dir) && {
        val staged = spark.read.parquet(s"$base/$comp")
        staged.join(readComponent(spark, dir, comp),
          staged.columns.toSeq, "left_semi").limit(1).count() > 0
      }
    }
    if (conflict) {
      val fs = hfs(spark, new HPath(base))
      fs.delete(new HPath(base), true)
      throw new IllegalStateException(
        s"SnapshotStore commit rejected: staged append $aid overlaps the " +
          s"committed digest components of $dir (concurrent append?); " +
          "staging deleted, manifest untouched")
    }
    val mf = new HPath(s"$dir/MANIFEST")
    val tmp = new HPath(s"$dir/MANIFEST.tmp")
    val fs = hfs(spark, mf)
    val ids = committedIds(spark, dir) :+ aid
    val out = fs.create(tmp, true)
    try out.write((ids.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(fs.getUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, mf, Options.Rename.OVERWRITE)
  }

  /** Append one snapshot's index rows to the store at `dir`:
    * [[stage]] → [[commit]] (audit + rename-is-commit). Returns the
    * committed append id. */
  def append(spark: SparkSession, dir: String, snapshot: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2): String = {
    val aid = stage(spark, dir, snapshot, id, text, k, r)
    commit(spark, dir, aid)
    aid
  }

  /** Delete staging directories not listed in the MANIFEST — the
    * recovery sweep for appends that crashed between stage and commit
    * (readers never resolve them, so this is pure space reclamation;
    * run it only with no append in flight — the single-writer
    * contract). Returns the deleted ids. */
  def gcOrphans(spark: SparkSession, dir: String): Seq[String] = {
    val root = new HPath(s"$dir/appends")
    val fs = hfs(spark, root)
    if (!fs.exists(root)) Seq.empty
    else {
      val live = committedIds(spark, dir).toSet
      fs.listStatus(root).toSeq.map(_.getPath)
        .filter(p => !live(p.getName))
        .map { p => fs.delete(p, true); p.getName }
    }
  }

  def sets(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "sets")
  def bands(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "bands")
  def digests(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "digests")
  def fps(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "fps")

  /** Near-dup delta of `arriving` docs against the STORED snapshot
    * index — [[MinHashLsh.probeIndex]] over the store's file scans;
    * row-equal to the inline [[MinHashLsh.snapshotNearDupPairs]] on
    * the same corpora (SnapshotStoreSpec). */
  def serveNearDup(spark: SparkSession, dir: String, arriving: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, threshold: Double = 0.8): DataFrame =
    MinHashLsh.probeIndex(bands(spark, dir), sets(spark, dir),
      arriving, id, text, k, r, threshold)

  /** Snapshot-delta classification of `b` against the STORED digest
    * indexes — [[Dedup.applySnapshotDelta]] over the store's file
    * scans; row-equal to the inline [[Dedup.snapshotDelta]]. */
  def serveDelta(spark: SparkSession, dir: String, b: DataFrame,
      text: Column, src: Column): DataFrame =
    Dedup.applySnapshotDelta(b,
      digests(spark, dir).withColumn("in_a", lit(1L)),
      fps(spark, dir).withColumn("fp_in_a", lit(1L)),
      text, src)
}
