package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins: pre-partition both sides on the join
  * key at WRITE time so the join needs NO shuffle at READ time.
  *
  * This is the standing answer to "reuse a partitioning across
  * stages/jobs" at 100 TB: a fact table bucketed on its join key is
  * written once and joined many times, and every one of those joins
  * skips the Exchange that would otherwise re-shuffle the full table
  * per query (bucket count chosen at write time ~ cluster parallelism).
  * Spark's bucketed scan reports its hash-partitioning to the planner,
  * which then elides the shuffle; `sortBy` additionally pre-sorts each
  * bucket file so the SortMergeJoin skips its sort too.
  *
  * `coLocatedJoin` materializes both sides bucketed (catalog tables
  * with data under a session temp path) and returns the shuffle-free
  * join — the p17 harness query proves the plan shape (PlanSpec: the
  * only Exchange left is the post-join aggregation's) and the result
  * (oracle = the plain join). The MERGE hint pins SortMergeJoin so a
  * small dim can't silently take the broadcast path and vacate the
  * demonstration.
  */
object Bucketing {

  private val tableSeq = new AtomicInteger

  /** NOTE on lifecycle: the two catalog tables this creates are named
    * uniquely (JVM counter + random suffix, so a persistent metastore
    * holding names from an earlier JVM can never collide) and their
    * data lives under an exit-cleaned temp path, but the CATALOG
    * entries persist until session end — a long-lived caller that
    * no longer needs the join result should `DROP TABLE` them (they
    * cannot be dropped here: the returned frame reads them lazily). */
  def coLocatedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int = 8): DataFrame = {
    val id = s"${tableSeq.incrementAndGet()}_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val lt = s"graft_bkt_l_$id"
    val rt = s"graft_bkt_r_$id"
    left.write.bucketBy(buckets, leftKey).sortBy(leftKey)
      .option("path", graft.TempDirs.create("graft-bucket-l"))
      .saveAsTable(lt)
    right.write.bucketBy(buckets, rightKey).sortBy(rightKey)
      .option("path", graft.TempDirs.create("graft-bucket-r"))
      .saveAsTable(rt)
    val l = spark.table(lt)
    val r = spark.table(rt)
    l.join(r.hint("merge"), l(leftKey) === r(rightKey))
  }
}
