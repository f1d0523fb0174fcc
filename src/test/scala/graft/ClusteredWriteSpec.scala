package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property p24's layout exists for: a range-clustered sorted write
  * yields parquet files whose cluster-key [min,max] ranges are DISJOINT,
  * so footer stats (or catalog file stats) prune a key-range scan to the
  * files that can contain it. A hash-partitioned write scatters every
  * key range across every file and prunes nothing.
  */
class ClusteredWriteSpec extends AnyFunSuite {

  test("range-clustered write yields disjoint per-file shipdate ranges") {
    val spark = SparkTestSession.spark
    val dir = TempDirs.create("clustered-spec")
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_shipdate"))
      .repartitionByRange(4, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(dir)

    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size >= 3, s"expected multiple files, got ${files.size}")

    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_shipdate")).cast("string"), max(col("l_shipdate")).cast("string"))
        .head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)

    ranges.sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        // a single key value maps to exactly one range partition, so
        // consecutive files may never overlap (strictly increasing)
        assert(nextMin > prevMax,
          s"file ranges overlap: prev max $prevMax vs next min $nextMin in $ranges")
      case _ =>
    }
  }
}
