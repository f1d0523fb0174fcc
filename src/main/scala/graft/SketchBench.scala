package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Shuffle-footprint measurement for the KMV sketch family (n40/n42):
  * the design claim is that the sketch aggregate ships O(groups·K)
  * bytes through the exchange REGARDLESS of corpus size, where exact
  * `count_distinct` ships every per-partition-distinct element. This
  * bench measures both plans' exchange metrics (records + bytes, AQE
  * off so the physical plan is introspectable) and the estimator's
  * relative error on the real fixtures, at two scale factors so the
  * growth DIRECTION is observed rather than argued: the exact path's
  * exchange grows with the distinct count, the sketch path's does not.
  *
  * Emits one JSON line; measured numbers are committed in SKETCH.md.
  * Usage: sbt 'runMain graft.SketchBench [sfDir]'
  */
object SketchBench {

  import BenchUtil.timed

  /** Sum a metric over all exchange nodes of an EXECUTED plan. */
  private def exchangeMetric(plan: SparkPlan, key: String): Long =
    BenchUtil.metricSum(plan, "Exchange", key)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark: SparkSession = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    // concrete (non-adaptive) plans so exchange metrics are stable to read
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).localCheckpoint(true)
    val nDocs = docs.count()

    // exact twin: two-phase distinct aggregation — the exchange carries
    // one row per (partition-local distinct) (lang, shingle) pair
    val exact = docs
      .select(col("lang"), explode(
        graft.functions.Shingles.shingleSet(col("text"), 3)).as("s"))
      .groupBy(col("lang"))
      .agg(count_distinct(col("s")).as("n_distinct"))

    // sketch: the n40 aggregate (per-lang, identical plan to s15) — the
    // exchange carries one <=K-long buffer per (group x partition)
    val sketch = graft.streaming.StreamQueries.kmvFinish(
      graft.streaming.StreamQueries.kmvAggPlan(docs))

    val (exactRows, exactSec) = timed(exact.collect())
    val exactRecords = exchangeMetric(exact.queryExecution.executedPlan, "shuffleRecordsWritten")
    val exactBytes = exchangeMetric(exact.queryExecution.executedPlan, "dataSize")

    val (skRows, skSec) = timed(sketch.collect())
    val skRecords = exchangeMetric(sketch.queryExecution.executedPlan, "shuffleRecordsWritten")
    val skBytes = exchangeMetric(sketch.queryExecution.executedPlan, "dataSize")

    val exactByLang = exactRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val errs = skRows.map { r =>
      val lang = r.getString(0)
      val est = r.getDouble(3)
      val truth = exactByLang(lang).toDouble
      val rel = math.abs(est - truth) / truth
      System.err.println(f"[sketch] $lang%-4s exact=$truth%9.0f est=$est%12.1f relerr=${rel * 100}%5.1f%%")
      rel
    }
    val maxRel = errs.max

    System.err.println(f"[sketch] exact:  records=$exactRecords%9d bytes=$exactBytes%12d time=$exactSec%6.2fs")
    System.err.println(f"[sketch] sketch: records=$skRecords%9d bytes=$skBytes%12d time=$skSec%6.2fs")

    println(
      s"""{"bench":"sketch","sf":"$sfDir","n_docs":$nDocs,""" +
      s""""exact":{"exchange_records":$exactRecords,"exchange_bytes":$exactBytes,"sec":$exactSec},""" +
      s""""kmv":{"exchange_records":$skRecords,"exchange_bytes":$skBytes,"sec":$skSec},""" +
      s""""max_rel_err":$maxRel}""")
    spark.stop()
  }
}
