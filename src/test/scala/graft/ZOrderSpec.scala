package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout contract (p28): on a full 64×64 grid split into 16
  * z-range files, every file covers a small RECTANGLE — per-file span
  * over EACH dimension collapses to ~1/4 of the global span. A
  * single-column sort provably cannot do this for both columns (the
  * unsorted one spans every file fully — asserted as the contrast).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def grid = {
    val rows = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    rows.toDF("x", "y")
  }

  test("16 z-range files of a 64x64 grid are tight on BOTH dimensions") {
    val dir = TempDirs.create("graft-zorder-spec")
    ZOrder.writeClustered(grid, $"x", $"y", dir, files = 16)
    val spans = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), count(lit(1)).as("nf"))
      .head()
    assert(spans.getAs[Long]("nf") == 16L)
    // exact z-blocks would give span 15 of 63 (≈0.24); allow boundary
    // straddle from range-partition sampling
    assert(spans.getAs[Double]("ax") <= 0.35 * 63, spans.toString)
    assert(spans.getAs[Double]("ay") <= 0.35 * 63, spans.toString)
  }

  test("contrast: single-column sort leaves the other dimension unclustered") {
    val dir = TempDirs.create("graft-zorder-contrast")
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(dir)
    val spans = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"y") - min($"y")).as("sy"))
      .agg(avg($"sy").as("ay")).head()
    assert(spans.getAs[Double]("ay") >= 0.9 * 63, spans.toString)
  }

  test("z-value interleaves bits exactly (spot values)") {
    val r = Seq((0, 0), (255, 0), (0, 255), (1, 1), (3, 5))
      .toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b").as("z")).as[Int].collect()
    // morton(a,b): a in even bits, b in odd bits
    assert(r.sameElements(Array(0, 0x5555, 0xAAAA, 3, 0x27)))
  }
}
