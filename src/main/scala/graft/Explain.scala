package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: `runMain graft.Explain <queryName> [sfDir]`
  * prints the formatted physical plan (WholeStageCodegen spans,
  * PushedFilters, exchange/shuffle edges) and a timed count — the
  * iterate-on-the-plan loop the 100 TB design point demands.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val t1 = System.nanoTime()
    println(f"[explain] $name rows=$n first=${(t1 - t0) / 1e9}%.3fs")
    val t2 = System.nanoTime()
    val n2 = df.count()
    val t3 = System.nanoTime()
    println(f"[explain] $name rows=$n2 second=${(t3 - t2) / 1e9}%.3fs")
    spark.stop()
  }
}
