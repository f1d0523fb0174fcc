package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the connected-components fixpoint family
  * (n61/n25 call [[graft.operators.Dedup.connectedComponents]]; n16 is
  * the same pair family without the fixpoint, included as a control).
  * The fixpoint's per-iteration driver cost is the suspect under test:
  * each round historically ran TWO jobs — the eager localCheckpoint
  * materialization and a separate convergence-probe count over the
  * materialized blocks. Merging the probe into the materialization job
  * (accumulator counted while the checkpoint writes) halves the
  * per-round job count; this main measures whether that shows outside
  * the noise band on the real fixtures.
  *
  * Emits one JSON line with per-query wall stats over `reps`
  * measured runs after one warmup. Usage:
  *   sbt 'runMain graft.FixpointBench [sfDir] [reps]'
  */
object FixpointBench {

  import BenchUtil.timed

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark: SparkSession = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.sources.Tables.clearCaches()

    val queries = Seq("n61_dedup_keep_best", "n25_dedup_components",
      "n16_dedup_apply")
    val stats = queries.map { q =>
      val run = () => SparkEntry.queries(q)(spark, sfDir).collect().length
      run() // warmup: codegen + probe caches
      val walls = (1 to reps).map { _ => timed(run())._2 }.sorted
      q -> Map(
        "min" -> walls.head, "median" -> walls(walls.size / 2),
        "max" -> walls.last)
    }
    val json = stats.map { case (q, m) =>
      s""""$q":{${m.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")}}"""
    }.mkString(",")
    // single parseable line, like the other bench mains
    println(s"""{"bench":"fixpoint","sf":"$sfDir","reps":$reps,$json}""")
    spark.stop()
  }
}
