package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Rules

/** Rule-match semantics vs a direct Scala port of the reference's `list_if`
  * (/root/reference/kafka_stream/kafka_s.py:252-285), including the quirks:
  * Q2 (filterRules never `&`-split), Q3 (ALL conjunct words must hit),
  * whitespace preserved inside `&`-parts, empty rules ⇒ no match/no veto. */
class RulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(cases: Seq[(String, String, String)]): Seq[Boolean] = {
    import spark.implicits._
    cases.toDF("title", "inRules", "filterRules")
      .select(Rules.ruleMatchesRaw(col("title"), col("inRules"), col("filterRules")))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("golden fixture: bond title, OR-of-AND + veto (mysql_rules.py:93)") {
    val title = "14雏鹰债：雏鹰农牧公司债券临时受托管理事务报告(2019年度第九期)"
    val cases = Seq(
      (title, "债券&报告、退市", ""),       // conj hits -> match
      (title, "债券&报告、退市", "受托"),   // veto hits -> no match
      (title, "退市、停牌", ""),            // no disjunct hits
      (title, "债券&停牌、受托", ""))       // second disjunct hits
    assert(run(cases) == Seq(true, false, false, true))
  }

  test("quirk Q2: filterRules token with & is ONE literal, not a conjunction") {
    // '债券&退市' never appears literally, so the veto must NOT fire even
    // though both words appear separately.
    val title = "债券退市公告"
    assert(run(Seq((title, "债券", "债券&退市"))) == Seq(true))
  }

  test("whitespace: disjuncts stripped, &-parts not (kafka_s.py:243-244)") {
    assert(run(Seq(
      ("group data", " group & data ", ""),   // needs 'group ' and ' data' -> hit
      ("groupdata", " group & data ", "")     // no spaces -> miss
    )) == Seq(true, false))
  }

  test("empty / null rules => no match; empty filter => no veto") {
    assert(run(Seq(
      ("anything", "", ""),
      ("anything", null, ""),
      ("anything", "any", null),
      ("anything", "any", ""))) == Seq(false, false, true, true))
  }

  test("property: Catalyst predicate == reference list_if port on random input") {
    val rnd = new scala.util.Random(42)
    val titleChars = "ab 、"
    val ruleChars = "ab&、 "
    def rs(chars: String, n: Int) =
      (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    val cases = (1 to 500).map { _ =>
      (rs(titleChars, 1 + rnd.nextInt(12)),
       rs(ruleChars, rnd.nextInt(10)),
       rs(ruleChars, rnd.nextInt(8)))
    }
    val got = run(cases)
    val want = cases.map { case (t, in, f) => Rules.listIfOracle(in, f, t) }
    val diffs = cases.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("labels: emo/imp maps with miss => null (kafka_s.py:72-73,444-459)") {
    import spark.implicits._
    val df = Seq(1, 0, -1, 7).toDF("emo")
      .select(Rules.emoLabel(col("emo")).as("l"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("正向"), Some("中性"), Some("负向"), None))
    val df2 = Seq(1, 2, 3, 4, 5, 9).toDF("imp")
      .select(Rules.impLabel(col("imp")).as("l"))
    assert(df2.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("相对不重要"), Some("相对不重要"), Some("相对不重要"),
        Some("重要"), Some("非常重要"), None))
  }
}
