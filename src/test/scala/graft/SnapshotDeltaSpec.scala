package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup.snapshotDelta semantics: exact-dup beats fingerprint-dup in
  * the classification, duplicate index rows never fan out B, and a
  * disjoint snapshot is all-new. */
class SnapshotDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def run(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    Dedup.snapshotDelta(a, b, col("text"), col("source"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("classification: exact dup > fingerprint-only dup > new") {
    val a = df((0L, "x", "aa bb cc"), (2L, "x", "dd ee"))
    val b = df(
      (1L, "s1", "aa bb cc"), // byte-identical to A
      (3L, "s1", "cc bb aa"), // reorder: fingerprint dup ONLY
      (5L, "s1", "zz zz")) // new
    assert(run(a, b) == Map("s1" -> ((3L, 1L, 1L, 1L))))
  }

  test("duplicate content WITHIN the old snapshot never fans B out") {
    // A holds 3 copies of the same text — the distinct-digest index
    // must still classify B's single match as ONE doc, not three rows
    val a = df((0L, "x", "pp qq"), (2L, "x", "pp qq"), (4L, "x", "pp qq"))
    val b = df((1L, "s2", "pp qq"), (3L, "s2", "rr ss"))
    assert(run(a, b) == Map("s2" -> ((2L, 1L, 0L, 1L))))
  }

  test("forced 3-micro-batch stream-static classification == batch") {
    val spark2 = spark
    import spark2.implicits._
    val dir = TempDirs.create("snapdelta-stream")
    def writeFile(name: String, docs: Seq[(Long, String, String)]): Unit = {
      val tmp = TempDirs.create("snapdelta-tmp")
      docs.toDF("doc_id", "source", "text").coalesce(1)
        .write.parquet(s"$tmp/d")
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp, "d"))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(dir, name))
    }
    // the new snapshot arrives in 3 files, one source split ACROSS
    // micro-batches — the complete-mode rollup must merge them
    writeFile("f0.parquet", Seq((1L, "s1", "aa bb"))) // exact dup of A
    writeFile("f1.parquet", Seq((3L, "s1", "bb aa"))) // fp dup of A
    writeFile("f2.parquet", Seq((5L, "s2", "zz"))) // new
    val a = df((0L, "x", "aa bb"))
    val (aMd5, aFp) = Dedup.snapshotIndexes(a, col("text"))
    import graft.streaming.StreamQueries
    val got = StreamQueries.runToTable(spark,
      Dedup.applySnapshotDelta(
        spark.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .option("maxFilesPerTrigger", 1).parquet(dir),
        aMd5, aFp, col("text"), col("source")),
      "complete")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "s1" -> ((2L, 1L, 1L, 0L)), "s2" -> ((1L, 0L, 0L, 1L))))
    // and it equals the batch operator on the union of the files
    val batch = run(a, spark.read.parquet(dir)
      .select(col("doc_id"), col("source"), col("text")))
    assert(batch == got)
  }

  test("disjoint snapshots: everything is new, grouped per source") {
    val a = df((0L, "x", "aa"))
    val b = df((1L, "s3", "bb"), (3L, "s4", "cc"), (5L, "s4", "dd"))
    assert(run(a, b) == Map(
      "s3" -> ((1L, 0L, 0L, 1L)), "s4" -> ((2L, 0L, 0L, 2L))))
  }

  test("policy apply drops exact+fingerprint cross-snapshot dups, keeps near-dups") {
    import spark.implicits._
    val a = df((0L, "x", "aa bb cc"), (2L, "x", "dd ee ff"))
    val b = df(
      (1L, "s1", "aa bb cc"), // exact dup of A → dropped
      (3L, "s1", "ff ee dd"), // fingerprint dup of A → dropped
      (5L, "s1", "aa bb cc xx"), // near-dup only → KEPT (FineWeb rule)
      (7L, "s1", "zz yy")) // new → kept
    val (aMd5, aFp) = Dedup.snapshotIndexes(a, col("text"))
    val kept = Dedup.applySnapshotPolicy(b, aMd5, aFp, col("text"))
    // output schema is b's own columns, the corpus flows on unchanged
    assert(kept.columns.toSeq == Seq("doc_id", "source", "text"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L, 7L))
  }

  test("URL delta classifies unchanged / changed / new-URL per source") {
    import spark.implicits._
    // url := source + "/" + doc_id div 2 — ids 0/1 same page, 2/3 same
    val a = df((0L, "s1", "aa bb"), (2L, "s1", "cc dd"))
    val b = df(
      (1L, "s1", "aa bb"), // same URL, same content → unchanged
      (3L, "s1", "cc dd EDITED"), // same URL, new content → changed
      (9L, "s2", "new page")) // URL absent from old → url_new
    import org.apache.spark.sql.functions.{concat, expr, lit}
    val url = concat(col("source"), lit("/"),
      expr("doc_id div 2").cast("string"))
    val got = Dedup.snapshotUrlDelta(a, b, url, col("text"), col("source"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "s1" -> ((2L, 1L, 1L, 0L)), "s2" -> ((1L, 0L, 0L, 1L))))
  }

  test("duplicate (url, content) rows in the old snapshot never fan B out") {
    import spark.implicits._
    // two old crawl records of the SAME url with the SAME bytes: the
    // distinct (url, h) index must classify B's match as one doc
    val a = df((0L, "s1", "aa bb"), (1L, "s1", "aa bb")) // div 2 → url s1/0
    val b = df((2L, "s1", "aa bb")) // url s1/1 — absent; content equal
    import org.apache.spark.sql.functions.{concat, expr, lit}
    val url = concat(col("source"), lit("/"),
      expr("doc_id div 2").cast("string"))
    val got = Dedup.snapshotUrlDelta(a, b, url, col("text"), col("source"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("s1", 1L, 0L, 0L, 1L)))
  }
}
