package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MinHashLsh, SnapshotStore}

/** SnapshotStore contracts: appending a corpus in chunks yields the
  * SAME store as a from-scratch rebuild (every component, row for
  * row), and serving from the store equals the inline operators. */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("append across 3 snapshot chunks == from-scratch rebuild") {
    val d = docs(sf).where(col("doc_id") % 2 === 0)
    val chunks = Seq(
      d.where(col("doc_id") % 6 === 0),
      d.where(col("doc_id") % 6 === 2),
      d.where(col("doc_id") % 6 === 4))
    val incDir = TempDirs.create("snapstore-inc")
    chunks.foreach(c => SnapshotStore.append(spark, incDir, c))
    val allDir = TempDirs.create("snapstore-all")
    SnapshotStore.append(spark, allDir, d)
    // per-doc components: identical row multisets
    assert(rows(SnapshotStore.sets(spark, incDir)) ==
      rows(SnapshotStore.sets(spark, allDir)))
    assert(rows(SnapshotStore.bands(spark, incDir)) ==
      rows(SnapshotStore.bands(spark, allDir)))
    // distinct-digest components: the anti-join keeps the one-row-
    // per-distinct-value invariant across appends (the fixtures DO
    // contain cross-chunk duplicate content — assert the test bites)
    val digInc = SnapshotStore.digests(spark, incDir)
    assert(digInc.count() == digInc.distinct().count())
    assert(rows(digInc) == rows(SnapshotStore.digests(spark, allDir)))
    val fpInc = SnapshotStore.fps(spark, incDir)
    assert(fpInc.count() == fpInc.distinct().count())
    assert(rows(fpInc) == rows(SnapshotStore.fps(spark, allDir)))
  }

  test("cross-chunk duplicate content never duplicates a digest row") {
    import spark.implicits._
    // the same text arrives in all 3 appends — the anti-join must keep
    // exactly one digest/fp row (a duplicated index row would fan out
    // every later probe join)
    val chunks = Seq(
      Seq((0L, "x", "aa bb cc"), (2L, "x", "dd ee xx")),
      Seq((4L, "x", "aa bb cc"), (6L, "x", "ff gg yy")),
      Seq((8L, "x", "aa bb cc"), (10L, "x", "cc bb aa"))) // + fp-only dup
      .map(_.toDF("doc_id", "source", "text"))
    val dir = TempDirs.create("snapstore-dupdig")
    chunks.foreach(c => SnapshotStore.append(spark, dir, c))
    val dig = SnapshotStore.digests(spark, dir)
    assert(dig.count() == 4) // aa-bb-cc, dd-ee, ff-gg, cc-bb-aa
    assert(dig.count() == dig.distinct().count())
    val fp = SnapshotStore.fps(spark, dir)
    assert(fp.count() == 3) // cc-bb-aa fingerprints equal to aa bb cc
    assert(fp.count() == fp.distinct().count())
    // sets/bands stay per-doc: 6 docs, 6 set rows
    assert(SnapshotStore.sets(spark, dir).count() == 6)
  }

  test("store-served near-dup delta == inline snapshotNearDupPairs") {
    val a = docs(sf).where(col("doc_id") % 2 === 0)
    val b = docs(sf).where(col("doc_id") % 2 === 1)
    val dir = TempDirs.create("snapstore-serve")
    SnapshotStore.append(spark, dir, a)
    val served = SnapshotStore.serveNearDup(spark, dir, b)
    val inline = MinHashLsh.snapshotNearDupPairs(a, b, "doc_id", "text")
    assert(rows(served) == rows(inline))
    assert(served.count() > 0, "no cross-snapshot near-dups in fixture — equality vacuous")
  }

  test("store-served delta classification == inline snapshotDelta") {
    val a = docs(sf).where(col("doc_id") % 2 === 0)
    val b = docs(sf).where(col("doc_id") % 2 === 1)
    val dir = TempDirs.create("snapstore-delta")
    SnapshotStore.append(spark, dir, a)
    val served = SnapshotStore.serveDelta(spark, dir, b,
      col("text"), col("source"))
    val inline = Dedup.snapshotDelta(a, b, col("text"), col("source"))
    assert(rows(served) == rows(inline))
  }
}
