package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish (WAP) — the deployment pattern for datasets
  * that downstream jobs consume: new data is STAGED to a fresh
  * directory, AUDITED as it exists on disk (re-read — the audit sees
  * exactly the bytes a consumer would, not the producing plan), and
  * only then PUBLISHED by atomically renaming a one-line CURRENT
  * pointer file over the previous one — the same rename-is-commit core
  * as [[graft.sinks.AtomicBucketStore]], at whole-snapshot
  * granularity. A failed audit deletes the stage and leaves CURRENT
  * untouched; a crash at ANY point before the rename leaves the old
  * snapshot fully visible. Readers resolve through CURRENT only and
  * never list data directories, so an in-flight writer is invisible.
  *
  * This is what the lakehouse formats call WAP / branch-and-commit;
  * the minimal file-layout form here carries the same guarantee for a
  * plain parquet directory tree. */
object Publish {

  private val Pointer = "CURRENT"

  /** The live snapshot (None before the first successful publish). */
  def readCurrent(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = Paths.get(root, Pointer)
    if (!Files.exists(p)) None
    else Some(spark.read.parquet(s"$root/${Files.readString(p).trim}"))
  }

  /** Stage `df`, audit the STAGED data, publish on a clean audit.
    * `audit` returns None to accept or Some(reason) to reject.
    * Returns Right(snapshot dir) on publish, Left(reason) on a
    * rejected audit (stage deleted, CURRENT untouched). */
  def writeAuditPublish(spark: SparkSession, df: DataFrame, root: String,
      audit: DataFrame => Option[String]): Either[String, String] = {
    Files.createDirectories(Paths.get(root))
    val snap = s"snap-${java.util.UUID.randomUUID()}"
    df.write.mode("error").parquet(s"$root/$snap")
    audit(spark.read.parquet(s"$root/$snap")) match {
      case Some(reason) =>
        graft.TempDirs.deleteRecursively(Paths.get(root, snap))
        Left(reason)
      case None =>
        // the snapshot being REPLACED stays on disk one more generation:
        // a reader that resolved CURRENT just before this commit is
        // still mid-scan on its files, so deleting it in the commit
        // path would yank parquet bytes out from under a concurrent
        // read (ADVICE r8). GC therefore trails by one publish — only
        // grandparent snapshots (two commits stale) are deleted, the
        // same bounded-retention trade lakehouse snapshot expiry makes:
        // a reader must finish within one full publish cycle.
        val prevPtr = Paths.get(root, Pointer)
        val prev =
          if (Files.exists(prevPtr)) Some(Files.readString(prevPtr).trim)
          else None
        val tmp = Paths.get(root, Pointer + ".tmp")
        Files.writeString(tmp, snap)
        Files.move(tmp, prevPtr,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        // best-effort GC of snapshots ≥2 generations stale; a crash
        // here leaves an orphan directory, never corruption
        val live = Set(snap) ++ prev
        val s = Files.list(Paths.get(root))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("snap-") &&
              !live(p.getFileName.toString))
            .foreach(p => graft.TempDirs.deleteRecursively(p))
        } finally s.close()
        Right(snap)
    }
  }
}
