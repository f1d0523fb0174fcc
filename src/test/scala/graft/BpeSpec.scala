package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Bpe.learnMerges against hand-computed classic BPE, pinning the two
  * subtleties: freq-weighted overlapping pair COUNTS (Sennrich's zip
  * convention) and greedy left-to-right non-overlapping APPLICATION
  * (the "aaa" case — consecutive matches merge at alternate offsets
  * only), plus the deterministic lexicographic tiebreak. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def merges(texts: Seq[String], iters: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.learnMerges(docs, iters)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("overlap counting, alternate-offset application, lexicographic ties") {
    // vocab: aaa:2 cd:2 ce:1
    // it1: (a,a) counted 2 per 'aaa' occurrence (overlapping) = 4 -> merge
    //      greedy: positions {1,2} are one island; only offset-0 applies
    //      so 'aaa' -> [aa, a] (NOT [aa, aa] or [a, aa])
    // it2: (aa,a)=2 ties (c,d)=2 -> 'aa' < 'c' lexicographic -> (aa,a)
    // it3: (c,d)=2
    // it4: (c,e)=1
    val got = merges(Seq("aaa aaa", "cd cd ce"), 4)
    assert(got == Seq(
      (1, "a", "a", 4L),
      (2, "aa", "a", 2L),
      (3, "c", "d", 2L),
      (4, "c", "e", 1L)))
  }

  test("merge application rewrites the symbol table (merged pair gone next round)") {
    // after (l,o) merges, the pair (lo,w) must exist and (o,w) must not
    val got = merges(Seq("low low low lower"), 3)
    assert(got.head._1 == 1)
    val pairsSeen = got.map(m => (m._2, m._3))
    // it1: (l,o)=4 ties (o,w)=4 -> 'l' < 'o' -> (l,o); it2: (lo,w)=4
    assert(pairsSeen.take(2) == Seq(("l", "o"), ("lo", "w")))
  }

  test("exhausted corpus yields fewer rows, not an error") {
    // 'ab':1 -> it1 merges (a,b); nothing pairable remains
    val got = merges(Seq("ab"), 3)
    assert(got == Seq((1, "a", "b", 1L)))
  }
}
