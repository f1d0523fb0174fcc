package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Compaction contract (p26): file count shrinks to the measured-bytes
  * target, no row is lost or duplicated, and the rewrite is
  * zero-shuffle (coalesce).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compacts many small files to the byte-derived count, losslessly") {
    val root = TempDirs.create("graft-compact-spec")
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(32).write.mode("overwrite").parquet(s"$root/small")
    assert(Compaction.dataFileCount(s"$root/small") == 32)

    val bytes = Compaction.dataBytes(s"$root/small")
    val target = bytes / 3 // force a 3..4-file outcome
    val n = Compaction.compact(spark, s"$root/small", s"$root/out", target)
    val expected = ((bytes + target - 1) / target).toInt
    assert(n == expected)
    assert(Compaction.dataFileCount(s"$root/out") == n)
    assert(n < 32)

    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 10000)
    // exact multiset equality both directions
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("compaction plan has no shuffle: coalesce, not repartition") {
    val root = TempDirs.create("graft-compact-plan")
    (1 to 100).toDF("id").repartition(8).write.mode("overwrite")
      .parquet(s"$root/small")
    val plan = spark.read.parquet(s"$root/small").coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("target larger than total bytes yields exactly one file") {
    val root = TempDirs.create("graft-compact-one")
    (1 to 100).toDF("id").repartition(8).write.mode("overwrite")
      .parquet(s"$root/small")
    val n = Compaction.compact(spark, s"$root/small", s"$root/out", 1L << 30)
    assert(n == 1 && Compaction.dataFileCount(s"$root/out") == 1)
  }

  test("partitioned directories (key=value subdirs) measure their real " +
      "size and file count (ADVICE r8)") {
    val root = TempDirs.create("graft-compact-part")
    val df = (1 to 5000).map(i => (i.toLong, s"k${i % 4}", s"row$i"))
      .toDF("id", "part", "v")
    df.repartition(8).write.mode("overwrite").partitionBy("part")
      .parquet(s"$root/parted")
    // a flat listing saw 0 bytes / 0 files here; the walk must see both
    val bytes = Compaction.dataBytes(s"$root/parted")
    val files = Compaction.dataFileCount(s"$root/parted")
    assert(bytes > 0, "partitioned table measured 0 bytes")
    assert(files >= 4, s"expected data files under 4 partitions, got $files")
    // and compact() therefore sizes from real bytes, not max(1, 0)
    val target = bytes / 2
    val n = Compaction.compact(spark, s"$root/parted", s"$root/out", target)
    val expected = ((bytes + target - 1) / target).toInt
    assert(n == expected && n > 1,
      s"expected the multi-file byte-derived target $expected, got $n")
    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 5000)
  }
}
