package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

/** Bloom filter contract (n44): no false negatives ever; false
  * positives exist at high fill (they are the design trade) and are
  * deterministic run-to-run; filter size is bounded by m.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 2
  private val M = 64

  // 40 inserts × k=2 into 64 bits → ~72% fill → FP rate ≈ 0.5: false
  // positives are certain over 100 probes, universal passage is not
  private def inserted = (1 to 40).map(i => s"in$i").toDF("item")
  private def fresh = (1 to 100).map(i => s"out$i").toDF("item")

  test("no false negatives: every inserted item is found") {
    val pos = Bloom.build(inserted, K, M)
    val found = Bloom.mayContain(inserted, pos, K, M).count()
    assert(found == 40)
  }

  test("false positives exist at 40 inserts / 64 bits and are deterministic") {
    val pos = Bloom.build(inserted, K, M)
    val fp1 = Bloom.mayContain(fresh, pos, K, M).as[String].collect().sorted
    assert(fp1.nonEmpty, "a ~72%-full filter must yield false positives")
    assert(fp1.length < 100, "not everything may pass — hash rows broken?")
    val fp2 = Bloom.mayContain(fresh, pos, K, M).as[String].collect().sorted
    assert(fp1.sameElements(fp2), "false positives must be deterministic")
  }

  test("filter is bounded by m positions regardless of insert count") {
    val pos = Bloom.build(inserted, K, M)
    assert(pos.count() <= M)
    val range = pos.agg(min($"p"), max($"p")).head()
    assert(range.getLong(0) >= 0 && range.getLong(1) < M)
  }

  test("packed-bitset probe (mayContainExpr) equals the join-form probe") {
    val pos = Bloom.build(inserted, K, M)
    val probe = (1 to 40).map(i => s"in$i") ++ (1 to 100).map(i => s"out$i")
    val probeDf = probe.toDF("item")
    val viaJoin = Bloom.mayContain(probeDf, pos, K, M)
      .as[String].collect().sorted
    val viaExpr = probeDf.where(Bloom.mayContainExpr(pos, K, M, $"item"))
      .as[String].collect().sorted
    assert(viaJoin.sameElements(viaExpr))
    assert(viaExpr.length >= 40, "must at least contain every inserted item")
  }

  test("probe keeps the probe frame's columns (doc_id rides through)") {
    val pos = Bloom.build(inserted, K, M)
    val probe = Seq((7L, "in1"), (8L, "in2")).toDF("doc_id", "item")
    val out = Bloom.mayContain(probe, pos, K, M).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(7L, 8L)))
  }

  test("native BloomHits array kernel equals the HOF filter composition " +
      "and stays in codegen") {
    val pos = Bloom.build(inserted, K, M)
    // arrays mixing inserted items, fresh items, and empties
    val rows = Seq(
      Seq("in1", "out5", "in2", "out6"),
      Seq("out1"), Seq.empty[String],
      (1 to 40).map(i => s"in$i") ++ (1 to 50).map(i => s"out$i"))
    val df = rows.toDF("sset")
    val viaHof = df.select(
      size(filter($"sset", sh => Bloom.mayContainExpr(pos, K, M, sh)))
        .cast("long").as("n")).as[Long].collect()
    val viaKernel = df.select(
      Bloom.hitCountExpr(pos, K, M, $"sset").as("n")).as[Long].collect()
    assert(viaKernel.sameElements(viaHof),
      s"${viaKernel.toSeq} vs ${viaHof.toSeq}")
    assert(viaKernel(0) >= 2 && viaKernel(2) == 0 && viaKernel(3) >= 40)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = df.select(Bloom.hitCountExpr(pos, K, M, $"sset").as("n"))
        .as[Long].collect()
      assert(n.sameElements(viaHof))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("duplicate probe rows each pass independently — no false negatives " +
      "on repeated inserted items (ADVICE r8)") {
    val pos = Bloom.build(inserted, K, M)
    // "in1" probed 3 times: all three rows must come back (the old
    // value-grouped form pooled them into one group of 3k hits and
    // dropped all of them)
    val probe = Seq("in1", "in1", "in1", "in2").toDF("item")
    val out = Bloom.mayContain(probe, pos, K, M).as[String].collect().sorted
    assert(out.sameElements(Array("in1", "in1", "in1", "in2")), out.toSeq.toString)
  }
}
