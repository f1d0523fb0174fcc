package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup.duplicatedSpans semantics on hand-computable fixtures: the
  * gaps-and-islands merge must recover exactly the shared token runs,
  * including self-repeats inside one document. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsOf(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("cross-doc shared run becomes one maximal span per doc") {
    import spark.implicits._
    val shared = (0 until 20).map(i => s"s$i")
    val docs = docsOf(
      0L -> (shared ++ (0 until 10).map(i => s"a$i")),
      1L -> ((0 until 5).map(i => s"b$i") ++ shared ++ Seq("b5")),
      2L -> (0 until 30).map(i => s"c$i"))
    val got = Dedup.duplicatedSpans(docs, g = 8, minSpan = 12)
      .as[(Long, Long, Long)].collect().toSet
    // 20 shared tokens = 13 consecutive duplicated gram positions =
    // one island of span 12 + 8 = 20, starting where the run starts
    assert(got == Set((0L, 0L, 20L), (1L, 5L, 20L)))
  }

  test("a repeat WITHIN one doc yields two islands; boundary grams stay unique") {
    import spark.implicits._
    val rep = (0 until 12).map(i => s"r$i")
    val filler = (0 until 5).map(i => s"f$i")
    val docs = docsOf(5L -> (rep ++ filler ++ rep))
    val got = Dedup.duplicatedSpans(docs, g = 8, minSpan = 12)
      .as[(Long, Long, Long)].collect().toSet
    // each 12-token copy = 5 consecutive dup positions = span 4+8=12;
    // grams crossing into the filler occur once and break the island
    assert(got == Set((5L, 0L, 12L), (5L, 17L, 12L)))
  }

  test("stripSpans removes exactly the covered positions; identical docs empty out") {
    import spark.implicits._
    val shared = (0 until 20).map(i => s"s$i")
    val docs = docsOf(
      0L -> (shared ++ (0 until 10).map(i => s"a$i")), // span 0..19 -> 10 left
      1L -> ((0 until 5).map(i => s"b$i") ++ shared ++ Seq("b5")), // 6 left
      2L -> (0 until 30).map(i => s"c$i"), // untouched
      3L -> (0 until 20).map(i => s"t$i"), // identical pair:
      4L -> (0 until 20).map(i => s"t$i")) //   both strip to zero
    val got = Dedup.stripSpans(docs, g = 8, minSpan = 12)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      0L -> (30L, 10L), 1L -> (26L, 6L), 2L -> (30L, 30L),
      3L -> (20L, 0L), 4L -> (20L, 0L)))
  }

  test("spans below minSpan are dropped") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i") // 3 dup positions -> span 10
    val docs = docsOf(
      0L -> (shared ++ (0 until 10).map(i => s"a$i")),
      1L -> (shared ++ (0 until 10).map(i => s"b$i")))
    val got = Dedup.duplicatedSpans(docs, g = 8, minSpan = 12)
      .as[(Long, Long, Long)].collect()
    assert(got.isEmpty)
  }
}
