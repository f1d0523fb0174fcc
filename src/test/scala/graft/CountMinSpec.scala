package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin

/** Count-min sketch contract (n43): one-sided error (est ≥ exact,
  * never under), bounded sketch size, and real collisions at the n43
  * operating point so the inequality is exercised, not vacuous.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Depth = 3
  private val Width = 32

  // skewed occurrence stream: token "t<i>" appears i times
  private def occ = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i")).toDF("tok")

  test("estimates are one-sided: est >= exact for every token, never under") {
    val sk = CountMin.sketch(occ, Depth, Width)
    val exact = occ.groupBy($"tok").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(exact.select($"tok"), sk, Depth, Width)
    val joined = est.join(exact, "tok").collect()
    assert(joined.length == 40)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"undercount for ${r.getAs[String]("tok")}")
    }
  }

  test("40 tokens in a 32-wide row must collide: some token is overestimated") {
    val sk = CountMin.sketch(occ, Depth, Width)
    val exact = occ.groupBy($"tok").agg(count(lit(1)).as("exact"))
    val over = CountMin.estimate(exact.select($"tok"), sk, Depth, Width)
      .join(exact, "tok").where($"est" > $"exact").count()
    assert(over > 0, "no collision at 40 tokens / 32 buckets — hash rows broken?")
  }

  test("sketch row count is bounded by depth*width regardless of input size") {
    val sk = CountMin.sketch(occ, Depth, Width)
    assert(sk.count() <= Depth.toLong * Width)
    // total mass per row equals the input size (each occurrence lands
    // in exactly one bucket per row)
    val mass = sk.groupBy($"i").agg(sum($"c").as("m")).collect()
    assert(mass.length == Depth)
    val n = occ.count()
    mass.foreach(r => assert(r.getAs[Long]("m") == n))
  }
}
