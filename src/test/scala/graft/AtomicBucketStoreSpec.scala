package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.AtomicBucketStore

/** Proves the atomic-commit contract of the s10 upsert sink's store
  * (VERDICT r5–r7 carry-over: the former dynamic-partition overwrite
  * deleted live bucket files before the replacements were durable, so a
  * crash mid-overwrite exposed a half-written bucket to readers).
  *
  * The store's whole safety argument is ONE fact: the manifest rename is
  * the commit, and until it happens nothing a writer does is visible.
  * The crash-simulation tests construct exactly the on-disk states a
  * crash can leave — generation fully written but manifest not renamed;
  * manifest tmp file half-written — and assert a reader sees the old,
  * fully-consistent bucket set in each.
  */
class AtomicBucketStoreSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def kv(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)))
  }

  private def readSorted(root: String): Seq[(Long, String)] =
    AtomicBucketStore.readAll(spark, root).toSeq
      .flatMap(_.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))))
      .sorted

  test("empty store: no manifest, no paths, no frame") {
    val root = TempDirs.create("abs-empty")
    assert(AtomicBucketStore.readManifest(root).isEmpty)
    assert(AtomicBucketStore.bucketPaths(root, Seq(0L, 1L)).isEmpty)
    assert(AtomicBucketStore.readAll(spark, root).isEmpty)
  }

  test("write → commit → read roundtrip; untouched buckets survive a second generation") {
    val root = TempDirs.create("abs-rt")
    // gen 1: buckets 0 (k=0,4) and 1 (k=1)
    AtomicBucketStore.writeGeneration(
      kv(Seq(0L -> "a", 4L -> "b", 1L -> "c")), root, Seq(0L, 1L))
    assert(readSorted(root) == Seq((0L, "a"), (1L, "c"), (4L, "b")))
    // gen 2 touches ONLY bucket 0; bucket 1 must keep its gen-1 entry
    AtomicBucketStore.writeGeneration(kv(Seq(0L -> "A", 4L -> "B")), root, Seq(0L))
    assert(readSorted(root) == Seq((0L, "A"), (1L, "c"), (4L, "B")))
    val mf = AtomicBucketStore.readManifest(root)
    assert(mf.keySet == Set(0L, 1L))
    assert(mf(0L) != mf(1L).split("/")(0) + "/bucket=0") // moved generation
  }

  test("CRASH before manifest rename: fully-written orphan generation is invisible") {
    val root = TempDirs.create("abs-crash1")
    AtomicBucketStore.writeGeneration(kv(Seq(0L -> "old", 1L -> "old1")), root, Seq(0L, 1L))
    val before = readSorted(root)
    val mfBefore = AtomicBucketStore.readManifest(root)
    // simulate: a writer completed step 1 (full generation on disk) and
    // died before step 2 (the manifest rename) — everything writeGeneration
    // does EXCEPT commit()
    kv(Seq(0L -> "NEW")).write.mode("error")
      .partitionBy("bucket").parquet(s"$root/gen-crashed-before-commit")
    assert(AtomicBucketStore.readManifest(root) == mfBefore, "manifest changed without a commit")
    assert(readSorted(root) == before, "reader saw uncommitted generation data")
    assert(AtomicBucketStore.bucketPaths(root, Seq(0L))
      .forall(!_.contains("gen-crashed-before-commit")))
  }

  test("CRASH mid-manifest-write: a half-written MANIFEST.tmp is invisible") {
    val root = TempDirs.create("abs-crash2")
    AtomicBucketStore.writeGeneration(kv(Seq(2L -> "x", 3L -> "y")), root, Seq(2L, 3L))
    val before = readSorted(root)
    // simulate: writer died while streaming the tmp file (torn content)
    Files.writeString(Paths.get(root, "MANIFEST.tmp"), "2\tgen-torn/buck")
    assert(readSorted(root) == before, "reader resolved through a tmp manifest")
    // and a subsequent healthy commit simply replaces the torn tmp
    AtomicBucketStore.writeGeneration(kv(Seq(2L -> "x2")), root, Seq(2L))
    assert(readSorted(root) == Seq((2L, "x2"), (3L, "y")))
  }

  test("post-commit GC removes replaced generations, keeps referenced ones") {
    val root = TempDirs.create("abs-gc")
    val gen1 = AtomicBucketStore.writeGeneration(kv(Seq(0L -> "a")), root, Seq(0L))
    val gen2 = AtomicBucketStore.writeGeneration(kv(Seq(0L -> "b")), root, Seq(0L))
    assert(!Files.exists(Paths.get(root, gen1, "bucket=0")), "replaced bucket dir not GC'd")
    assert(!Files.exists(Paths.get(root, gen1)), "drained generation shell not GC'd")
    assert(Files.exists(Paths.get(root, gen2, "bucket=0")))
    assert(readSorted(root) == Seq((0L, "b")))
  }

  test("touched-but-empty bucket is dropped from the manifest, not pointed at a missing dir") {
    val root = TempDirs.create("abs-empty-bucket")
    AtomicBucketStore.writeGeneration(kv(Seq(0L -> "a", 1L -> "b")), root, Seq(0L, 1L))
    // bucket 1 declared touched but df has no rows for it → the merge
    // decided bucket 1 is now empty; its entry must disappear
    AtomicBucketStore.writeGeneration(kv(Seq(0L -> "a2")), root, Seq(0L, 1L))
    assert(AtomicBucketStore.readManifest(root).keySet == Set(0L))
    // the regression this pins: readAll must not throw on a manifest
    // entry whose directory was never created (ADVICE r7 #3)
    assert(readSorted(root) == Seq((0L, "a2")))
  }

  test("manifest round-trips through commit byte-exactly") {
    val root = TempDirs.create("abs-mf")
    val m = Map(0L -> "gen-a/bucket=0", 7L -> "gen-b/bucket=7", 15L -> "gen-a/bucket=15")
    AtomicBucketStore.commit(root, m)
    assert(AtomicBucketStore.readManifest(root) == m)
    val lines = Files.readAllLines(Paths.get(root, "MANIFEST")).asScala
    assert(lines == Seq("0\tgen-a/bucket=0", "7\tgen-b/bucket=7", "15\tgen-a/bucket=15"))
  }
}
