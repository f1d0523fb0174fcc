package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FuseSetJaccard contract: the rewrite fires on the declarative
  * idiom, and the fused kernel is value-identical to the built-in
  * composition on arbitrary inputs (dups, empties, nulls, NaN case).
  */
class JaccardFuseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jacIdiom = size(array_intersect($"a", $"b")).cast("double") /
    size(array_union($"a", $"b"))

  test("optimizer rewrites the size-intersect/size-union idiom to the fused kernel") {
    // file-backed source: a LocalRelation would be constant-folded away
    // before the fused expression could be observed in the plan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split($"text", " ").as("a"), split($"lang", " ").as("b"))
    val opt = docs.select(jacIdiom.as("j")).queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_jaccard"), opt)
    // and the arguments-swapped union still fuses
    val swapped = docs.select((size(array_intersect($"a", $"b")).cast("double") /
      size(array_union($"b", $"a"))).as("j"))
      .queryExecution.optimizedPlan.toString
    assert(swapped.contains("graft_jaccard"), swapped)
  }

  test("fused kernel equals the built-in composition (property, incl. dups)") {
    val rng = new Random(7)
    val rows = Seq.fill(300) {
      def arr() = Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(8)}")
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val got = df.selectExpr("graft_jaccard(a, b) AS j")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val expected = rows.map { case (a, b) =>
      val sa = a.toSet; val sb = b.toSet
      val union = (sa | sb).size
      // both-empty => null, matching LEGACY Divide's zero-divisor guard
      if (union == 0) None else Some((sa & sb).size.toDouble / union)
    }
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"row $i")
    }
  }

  test("graft_jaccard: both-empty is null (legacy zero-divisor guard), " +
      "null input is null") {
    val df = Seq(
      (Some(Seq.empty[String]), Some(Seq.empty[String])),
      (None, Some(Seq("x")))).toDF("a", "b")
    val fused = df.selectExpr("graft_jaccard(a, b) AS j")
      .collect().map(r => if (r.isNullAt(0)) "null" else r.getDouble(0).toString)
    assert(fused(0) == "null" && fused(1) == "null", fused.toSeq.toString)
  }

  test("legacy mode (ansi off): rewritten idiom still yields NULL on an " +
      "empty union, same as un-fused LEGACY Divide (ADVICE r8)") {
    val dir = TempDirs.create("graft-jaccard-legacy")
    Seq((Seq.empty[String], Seq.empty[String]), (Seq("x"), Seq("x")))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    // ansi off flips size() to its legacy form unless sizeOfNull is
    // explicitly modern — the rule only fuses the modern Size, so pin
    // the exact regime ADVICE r8 flagged: ansi=false + sizeOfNull=false
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    try {
      val q = spark.read.parquet(dir).select($"a", jacIdiom.as("j"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
      val rows = q.orderBy(size($"a")).collect()
      assert(rows(0).isNullAt(1), s"empty-union row not NULL: ${rows(0)}")
      assert(rows(1).getDouble(1) == 1.0)
    } finally {
      spark.conf.unset("spark.sql.ansi.enabled")
      spark.conf.unset("spark.sql.legacy.sizeOfNull")
    }
  }

  test("rewritten ANSI divide still throws DIVIDE_BY_ZERO on an empty union") {
    val dir = TempDirs.create("graft-jaccard-ansi")
    Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(jacIdiom.as("j"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
    val e = intercept[Exception] { q.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(t => Option(t.getMessage).exists(_.contains("DIVIDE_BY_ZERO"))),
      e.toString)
  }

  test("null ELEMENTS count as one distinct element, same as the built-ins") {
    val df = Seq((Seq(Option("x"), None, None), Seq(Option.empty[String], Option("y"))))
      .toDF("a", "b")
    val fused = df.selectExpr("graft_jaccard(a, b) AS j").as[Double].head()
    val idiom = df.select(jacIdiom.as("j")).as[Double].head()
    // {x, null} vs {null, y}: inter {null}=1, union {x,y,null}=3
    assert(fused == idiom && math.abs(fused - 1.0 / 3) < 1e-15)
  }
}
