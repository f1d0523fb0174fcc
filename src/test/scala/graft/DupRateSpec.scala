package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup.dupRateEstimate semantics: content-hash sampling keeps dup
  * groups atomic, mod=1 degenerates to the exact corpus rate, and the
  * fingerprint basis sees reorder duplicates the exact basis misses. */
class DupRateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(texts: Seq[String], mod: Int) = {
    import spark.implicits._
    Dedup.dupRateEstimate(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      col("text"), mod)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("mod=1 degenerates to the exact corpus duplication stats") {
    // 5 copies of A, 2 of B, 1 of C -> 8 docs, 3 groups, 5 dupes
    val texts = Seq.fill(5)("aa bb cc") ++ Seq.fill(2)("dd ee") ++ Seq("ff")
    val got = run(texts, mod = 1)
    assert(got("exact") == ((8L, 3L, 5L, 625000L))) // 5e6 div 8
    // no reorder dups here: fingerprint sees the same groups
    assert(got("fingerprint") == ((8L, 3L, 5L, 625000L)))
  }

  test("a duplicate group enters the sample atomically (all 5 or none)") {
    val text = "gg hh ii jj"
    val inSample =
      BigInt(md5hex(text).substring(0, 15), 16) % Dedup.DupSampleMod == 0
    val got = run(Seq.fill(5)(text), mod = Dedup.DupSampleMod)
    if (inSample)
      assert(got("exact") == ((5L, 1L, 4L, 800000L))) // full multiplicity
    else assert(!got.contains("exact")) // the whole group is out
  }

  test("fingerprint basis catches reorder dups the exact basis misses") {
    val got = run(Seq("xx yy zz", "zz yy xx"), mod = 1)
    assert(got("exact") == ((2L, 2L, 0L, 0L)))
    assert(got("fingerprint") == ((2L, 1L, 1L, 500000L)))
  }
}
