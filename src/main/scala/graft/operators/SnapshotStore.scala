package graft.operators

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
  * Layout under `dir/` (all plain parquet — the layout is the
  * contract, not who wrote it):
  *   sets/    (did, sset)      one row per doc: its shingle set
  *   bands/   (did, band, key) the MinHash-LSH banding index
  *   digests/ (h)              DISTINCT exact md5 digests
  *   fps/     (fp)             DISTINCT normalized fingerprints
  *
  * APPEND == REBUILD (SnapshotStoreSpec proves it across 3 chunks):
  * sets/bands rows are per-doc and banding is per-row deterministic
  * (the shared [[MinHashLsh.bandKeysFromSig]] kernel), so appending N
  * snapshots yields exactly the rebuild's row multiset; the digest
  * components keep their one-row-per-distinct-value invariant by
  * anti-joining each snapshot's digests against the store before the
  * append — the invariant [[Dedup.applySnapshotDelta]]'s probe joins
  * rely on (a duplicated index row would fan the probe out).
  *
  * Scale: each append is one scan of the NEW snapshot (sets + bands
  * map-side; digests two map-side-combined distincts + an anti-join
  * against the store, hash-partitioned on the digest); serving is
  * stateless equi-joins against file scans — no corpus-sized state,
  * no broadcast assumption anywhere. */
object SnapshotStore {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append one snapshot's index rows to the store at `dir`. Doc ids
    * must be distinct across appended snapshots (caller contract, as
    * in [[MinHashLsh.snapshotNearDupPairs]]).
    *
    * Failure atomicity: each component write is job-atomic via the
    * Hadoop output committer, but the four writes are separate jobs —
    * a crash between them leaves a component-skewed store. A
    * production pipeline stages an append under a manifest (commit =
    * rename the manifest in last); the recovery CHECK is exactly
    * SnapshotStoreSpec's append==rebuild equality, which any suspect
    * store can be audited against by rebuilding from the snapshots. */
  def append(spark: SparkSession, dir: String, snapshot: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2): Unit = {
    val sets = snapshot
      .select(col(id).as("did"), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0)
    sets.write.mode("append").parquet(s"$dir/sets")
    MinHashLsh.banded(sets, k, r).write.mode("append")
      .parquet(s"$dir/bands")
    appendDistinct(spark, s"$dir/digests",
      snapshot.select(md5(col(text)).as("h")).distinct())
    appendDistinct(spark, s"$dir/fps",
      snapshot.select(Text.fingerprint(col(text)).as("fp")).distinct())
  }

  /** Append only rows NOT already in the component — preserves the
    * one-row-per-distinct-digest invariant, making append == rebuild.
    * The delta materializes (localCheckpoint) before the write so the
    * job never scans the path it is appending into. */
  private def appendDistinct(spark: SparkSession, path: String,
      rows: DataFrame): Unit = {
    val delta =
      if (exists(spark, path))
        rows.join(spark.read.parquet(path), rows.columns.toSeq, "left_anti")
          .localCheckpoint()
      else rows
    delta.write.mode("append").parquet(path)
  }

  def sets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sets")
  def bands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bands")
  def digests(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/digests")
  def fps(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/fps")

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
