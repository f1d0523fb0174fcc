package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Text, Winnow}

/** Native winnowing kernel vs the HOF reference pipeline (the form n22
  * shipped in r2), on random and edge-case texts. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The r2 HOF form: positional-gram md5s bound to a column, windowed
    * min, distinct + sort. */
  private def hofWinnow(textCol: String): org.apache.spark.sql.Column = {
    val hsCol = col("hs")
    val n = size(hsCol)
    val wins = when(n >= 4,
      transform(sequence(lit(0), n - 4),
        i => array_min(slice(hsCol, i + lit(1), lit(4)))))
      .when(n > 0, array(array_min(hsCol)))
      .otherwise(array().cast("array<string>"))
    concat_ws(",", array_sort(array_distinct(wins)))
  }

  test("property: native winnow == HOF winnow on random texts") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "e", "ff")
    val texts = Seq.fill(200) {
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    } ++ Seq("", "a", "a b", "a b c", "a b c d", "a b c d e f g",
      "x  y   z  w", " lead", "trail ")
    val df = texts.toDF("text")
    val native = df.select(
      concat_ws(",", Winnow.winnowSet(col("text"), 3, 4)).as("w"))
      .as[String].collect()
    val hof = df
      .select(transform(Text.shinglesHof(col("text"), 3), sh => md5(sh)).as("hs"))
      .select(hofWinnow("text").as("w"))
      .as[String].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("guarantee: a shared >= w+win-1 token run yields a shared fingerprint") {
    val common = "q1 q2 q3 q4 q5 q6" // 6 tokens = w+win-1 with w=3, win=4
    val doc1 = s"p1 p2 $common p3"
    val doc2 = s"z9 $common z8 z7"
    val sel = Seq(doc1, doc2).toDF("text")
      .select(Winnow.winnowSet(col("text"), 3, 4).as("s"))
      .as[Seq[String]].collect()
    assert(sel(0).toSet.intersect(sel(1).toSet).nonEmpty)
  }
}
