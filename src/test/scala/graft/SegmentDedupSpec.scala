package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup.segmentDedup semantics on hand-computable fixtures: disjoint
  * K-token segments, corpus-global keep-first by (doc_id, seg_idx),
  * per-doc reassembly signature over the surviving segments in order. */
class SegmentDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsOf(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def run(docs: org.apache.spark.sql.DataFrame, k: Int = 4) = {
    import spark.implicits._
    Dedup.segmentDedup(docs, k)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
  }

  test("repeated segment is kept at its first occurrence only") {
    val boiler = Seq("b0", "b1", "b2", "b3") // one exact 4-token segment
    val docs = docsOf(
      0L -> (boiler ++ Seq("a0", "a1", "a2", "a3")),
      1L -> (boiler ++ Seq("c0", "c1", "c2", "c3")),
      2L -> boiler) // consists ENTIRELY of an already-seen segment
    val got = run(docs)
    assert(got(0L)._1 == ((2L, 2L, 0L)))
    assert(got(1L)._1 == ((2L, 1L, 1L)))
    assert(got(2L)._1 == ((1L, 0L, 1L))) // zero kept -> md5("")
    assert(got(2L)._2 == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("first occurrence is the corpus-global (doc_id, seg_idx) minimum") {
    // the repeat appears EARLIER in position inside doc 7 (idx 0) than
    // in doc 3 (idx 1) — doc order wins over position order
    val rep = Seq("r0", "r1", "r2", "r3")
    val docs = docsOf(
      3L -> (Seq("x0", "x1", "x2", "x3") ++ rep),
      7L -> rep)
    val got = run(docs)
    assert(got(3L)._1 == ((2L, 2L, 0L))) // doc 3 keeps both segments
    assert(got(7L)._1 == ((1L, 0L, 1L))) // doc 7's copy is stripped
  }

  test("a self-repeat within one doc keeps only the earlier copy") {
    val rep = Seq("r0", "r1", "r2", "r3")
    val docs = docsOf(9L -> (rep ++ rep ++ Seq("t0", "t1")))
    val got = run(docs)
    // 3 segments: rep(kept), rep(dropped), short tail t0 t1 (kept)
    assert(got(9L)._1 == ((3L, 2L, 1L)))
  }

  test("short tail segments dedup like full ones; kept_sig is orderly") {
    import spark.implicits._
    // tail "z0 z1" (2 tokens < k) occurs in both docs
    val docs = docsOf(
      0L -> Seq("a0", "a1", "a2", "a3", "z0", "z1"),
      1L -> Seq("b0", "b1", "b2", "b3", "z0", "z1"))
    val got = run(docs)
    assert(got(0L)._1 == ((2L, 2L, 0L)))
    assert(got(1L)._1 == ((2L, 1L, 1L)))
    // signatures rebuild the surviving text in segment order
    val md5of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    assert(got(0L)._2 == md5of("a0 a1 a2 a3 z0 z1"))
    assert(got(1L)._2 == md5of("b0 b1 b2 b3"))
  }

  test("forced 3-micro-batch streaming index == batch (first arrives LAST)") {
    // the keep-first winner of a shared segment is the corpus-global
    // min (doc_id, seg_idx) — here that doc sits in the LAST-listed
    // stream file, so it ARRIVES after a higher-id copy was already
    // folded into state; min(struct)'s monotonicity must converge to
    // the batch answer anyway (the property a streaming dropDuplicates,
    // which keeps the first arrival, would get wrong by construction)
    val spark2 = spark
    import spark2.implicits._
    val dir = TempDirs.create("segdedup-stream")
    def writeFile(name: String, docs: Seq[(Long, String)]): Unit = {
      val tmp = TempDirs.create("segdedup-tmp")
      docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/d")
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp, "d"))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(dir, name))
    }
    val shared = "s0 s1 s2 s3"
    writeFile("f0.parquet", Seq(7L -> s"$shared a0 a1 a2 a3"))
    writeFile("f1.parquet", Seq(9L -> s"b0 b1 b2 b3 $shared"))
    writeFile("f2.parquet", Seq(2L -> shared)) // the true first (min id)
    import graft.streaming.StreamQueries
    val streamedFirsts = StreamQueries.runToTable(spark,
      Dedup.firstOccurrences(Dedup.segmentsOf(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).parquet(dir), 4)),
      "complete")
    val batchSegs = Dedup.segmentsOf(
      spark.read.parquet(dir).select(col("doc_id"), col("text")), 4)
    val got = Dedup.applySegmentDedup(batchSegs, streamedFirsts)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      7L -> ((2L, 1L, 1L)), // shared copy stripped (arrived first, loses)
      9L -> ((2L, 1L, 1L)),
      2L -> ((1L, 1L, 0L)))) // min id keeps it despite arriving last
  }

  private def runBoiler(docs: org.apache.spark.sql.DataFrame, k: Int = 4,
      minDf: Int = 2) = {
    import spark.implicits._
    Dedup.boilerplateStrip(docs, k, minDf)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
  }

  test("boilerplate: a cross-doc segment is stripped from ALL docs") {
    val boiler = Seq("b0", "b1", "b2", "b3")
    val docs = docsOf(
      0L -> (boiler ++ Seq("a0", "a1", "a2", "a3")),
      1L -> (boiler ++ Seq("c0", "c1", "c2", "c3")),
      2L -> boiler)
    val got = runBoiler(docs)
    // vs segmentDedup: doc 0 does NOT keep a canonical copy
    assert(got(0L)._1 == ((2L, 1L, 1L)))
    assert(got(1L)._1 == ((2L, 1L, 1L)))
    assert(got(2L)._1 == ((1L, 0L, 1L)))
    assert(got(2L)._2 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("boilerplate: an intra-doc self-repeat (df=1) is fully kept") {
    val rep = Seq("r0", "r1", "r2", "r3")
    val docs = docsOf(
      5L -> (rep ++ rep ++ Seq("t0", "t1")), // repeats only within itself
      6L -> Seq("u0", "u1", "u2", "u3"))
    val got = runBoiler(docs)
    assert(got(5L)._1 == ((3L, 3L, 0L))) // BOTH copies kept (df = 1)
    assert(got(6L)._1 == ((1L, 1L, 0L)))
  }

  test("boilerplate: minDf threshold counts DISTINCT docs, not copies") {
    val seg = Seq("s0", "s1", "s2", "s3")
    val docs = docsOf(
      0L -> (seg ++ seg), // two copies, ONE doc
      1L -> Seq("v0", "v1", "v2", "v3"))
    // minDf=2: doc 0's double copy alone must not trigger the strip
    assert(runBoiler(docs, minDf = 2)(0L)._1 == ((2L, 2L, 0L)))
    val docs2 = docsOf(0L -> seg, 1L -> seg, 2L -> seg)
    // df=3 clears minDf=3; every copy goes
    val got3 = runBoiler(docs2, minDf = 3)
    assert(got3.values.forall(_._1 == ((1L, 0L, 1L))))
  }

  test("boilerplate: forced 3-micro-batch streaming df index == batch") {
    // the segment shared by the two docs reaches df=2 only when the
    // SECOND copy arrives (last file) — the complete-mode count must
    // converge to the batch df and the batch-side apply must then
    // strip the FIRST doc's copy retroactively
    val spark2 = spark
    import spark2.implicits._
    val dir = TempDirs.create("boiler-stream")
    def writeFile(name: String, docs: Seq[(Long, String)]): Unit = {
      val tmp = TempDirs.create("boiler-tmp")
      docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/d")
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp, "d"))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(dir, name))
    }
    val shared = "s0 s1 s2 s3"
    writeFile("f0.parquet", Seq(1L -> s"$shared a0 a1 a2 a3"))
    writeFile("f1.parquet", Seq(2L -> "b0 b1 b2 b3"))
    writeFile("f2.parquet", Seq(3L -> s"c0 c1 c2 c3 $shared"))
    import graft.streaming.StreamQueries
    val dfIdx = StreamQueries.runToTable(spark,
      Dedup.segmentDocFreq(Dedup.distinctSegmentsOf(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).parquet(dir), 4)),
      "complete")
    val got = Dedup.applyBoilerplateStrip(
      Dedup.segmentsOf(
        spark.read.parquet(dir).select(col("doc_id"), col("text")), 4),
      dfIdx, minDf = 2)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1L)), // arrived BEFORE df hit 2 — still stripped
      2L -> ((1L, 1L, 0L)),
      3L -> ((2L, 1L, 1L))))
  }

  test("empty docs produce no row; whitespace-only text is empty") {
    import spark.implicits._
    val docs = Seq((0L, "a0 a1"), (1L, ""), (2L, "  "))
      .toDF("doc_id", "text")
    val got = run(docs)
    assert(got.keySet == Set(0L))
  }
}
