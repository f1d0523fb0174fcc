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

  test("random corpora match a sequential reference BPE (seeded)") {
    // classic in-memory BPE: overlapping pair counts, greedy
    // left-to-right application — the semantics the distributed
    // islands construction must reproduce exactly
    def refBpe(words: Seq[String], iters: Int): Seq[(Int, String, String, Long)] = {
      val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var vocab: Map[Vector[String], Long] =
        freq.map { case (w, f) => w.split("").toVector -> f }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var it = 1
      var done = false
      while (it <= iters && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val ((a, b), n) = counts.toSeq
            .sortBy { case ((a, b), n) => (-n, a, b) }.head
          out += ((it, a, b, n))
          vocab = vocab.toSeq.map { case (syms, f) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), f)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          it += 1
        }
      }
      out.result()
    }

    val rng = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val words = Seq.fill(4 + rng.nextInt(5)) {
        val len = 1 + rng.nextInt(7)
        Seq.fill(len)(if (rng.nextBoolean()) "a" else "b").mkString
      }
      val corpus = rng.shuffle(words.flatMap(w =>
        Seq.fill(1 + rng.nextInt(4))(w)))
      val got = merges(Seq(corpus.mkString(" ")), 4)
      val want = refBpe(corpus, 4)
      assert(got == want, s"trial $trial corpus=$corpus")
    }
  }

  test("exhausted corpus yields fewer rows, not an error") {
    // 'ab':1 -> it1 merges (a,b); nothing pairable remains
    val got = merges(Seq("ab"), 3)
    assert(got == Seq((1, "a", "b", 1L)))
  }
}
