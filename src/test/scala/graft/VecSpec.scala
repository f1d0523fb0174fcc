package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec
import graft.streaming.StreamQueries

/** Native DotProduct vs the HOF fold (bit-exact), and the batch/stream
  * duality Verify relies on. */
class VecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("property: native dot == HOF left-fold, bit-exact on random doubles") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val native = df.select(Vec.dot(col("a"), col("b"))).as[Double].collect()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    // bit-exact, not approx: both must be the same left-fold
    assert(native.toSeq.map(java.lang.Double.doubleToLongBits)
      == hof.toSeq.map(java.lang.Double.doubleToLongBits))
  }

  test("dot edges: empty arrays, mismatched lengths (shorter wins), null propagates") {
    val df = Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.0, 2.0, 3.0), Seq(2.0))
    ).toDF("a", "b")
    val got = df.select(Vec.dot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0)
    assert(got(1) == 2.0)
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(Vec.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("batch/stream duality: streaming windowed counts == batch equivalent") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamQueries.windowedCounts(spark, dir)
      .as[(String, String, Long, String)].collect().toSet
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("string").as("sum_value"))
      .as[(String, String, Long, String)].collect().toSet
    assert(streamed == batch)
  }
}
