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

  test("disjoint snapshots: everything is new, grouped per source") {
    val a = df((0L, "x", "aa"))
    val b = df((1L, "s3", "bb"), (3L, "s4", "cc"), (5L, "s4", "dd"))
    assert(run(a, b) == Map(
      "s3" -> ((1L, 0L, 0L, 1L)), "s4" -> ((2L, 0L, 0L, 2L))))
  }
}
