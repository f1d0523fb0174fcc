package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle into training shards — the
  * "shuffle then shard" step between curation and tokenization
  * (n62). Shard = md5 bucket of the doc id (co-sized shards, no
  * rand()); within-shard order = md5 of (doc_id, epoch tag), so
  * re-keying the tag re-shuffles every epoch reproducibly while shard
  * membership stays fixed — at 100 TB a re-shuffle is a metadata pass,
  * never a byte-moving exchange between shards.
  *
  * Scale design (VERDICT r8 #2): the naive form —
  * `row_number().over(Window.partitionBy("shard"))` — forces ONE task
  * to sort an ENTIRE shard (corpus/nShards per task: 12.5 TB at the
  * design point). This implementation is the classic two-phase global
  * ordering instead:
  *
  *  1. range-partition on (shard, ek, doc_id) into `numPartitions`
  *     slices — each task sorts corpus/numPartitions rows, and range
  *     bounds guarantee partition p's keys all precede partition
  *     p+1's, so a shard's global order is the concatenation of its
  *     per-partition runs;
  *  2. per-(partition, shard) row counts — BOUNDED driver data
  *     (numPartitions × nShards longs), never row data;
  *  3. cumulative offsets per shard across partitions, broadcast back
  *     as a tiny (pid, shard, start) table;
  *  4. pos = shard start offset + partition-local rank. The local
  *     rank needs no window: `monotonically_increasing_id()` packs
  *     (partition id << 33 | record index in partition), and records
  *     were sorted before the id was attached, so
  *     `local − min(local per (pid, shard))` IS the rank within the
  *     shard's slice of that partition.
  *
  * One eager localCheckpoint pins the materialized row placement so
  * the count pass and the output read identical ids (on a cluster: a
  * reliable checkpoint). Everything downstream of the single range
  * exchange is a broadcast join + projection — no second shuffle, no
  * window, no per-shard sort.
  *
  * Shard-count contract: `nShards` bounds only the OUTPUT layout, not
  * any task's working set — tasks scale with `numPartitions`
  * (defaulting to spark.sql.shuffle.partitions), so the operator
  * survives any corpus size at fixed nShards.
  */
object Sharding {

  def shardPositions(docs: DataFrame, id: String,
      nShards: Int = 8, epochTag: String = "ep1",
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nPart = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val keyed = docs.select(
      col(id).as("doc_id"),
      (conv(substring(md5(col(id).cast("string")), 1, 4), 16, 10)
        .cast("int") % nShards).as("shard"),
      md5(concat(col(id).cast("string"), lit(":" + epochTag))).as("ek"))
    // the ONE wide exchange; monotonically_increasing_id is attached
    // after the in-partition sort (nondeterministic expressions are
    // never reordered past the sort by Catalyst), then placement is
    // pinned so both downstream actions observe the same ids
    val ranged = keyed
      .repartitionByRange(nPart, col("shard"), col("ek"), col("doc_id"))
      .sortWithinPartitions(col("shard"), col("ek"), col("doc_id"))
      .withColumn("mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val pidded = ranged
      .withColumn("pid", shiftright(col("mid"), 33).cast("int"))
      .withColumn("local", col("mid").bitwiseAND(lit((1L << 33) - 1)))
    // phase 2: bounded metadata to the driver — one (count, min local)
    // pair per (partition, shard), NOT row data
    val perGroup = pidded.groupBy(col("pid"), col("shard"))
      .agg(count(lit(1)).as("cnt"), min(col("local")).as("min_local"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    // phase 3: prefix-sum offsets per shard across partitions
    val offsets = perGroup.map { case ((pid, sh), (_, minL)) =>
      val start = perGroup.collect {
        case ((p2, s2), (c2, _)) if s2 == sh && p2 < pid => c2
      }.sum
      (pid, sh, start, minL)
    }.toSeq.toDF("pid", "shard", "start", "min_local")
    // phase 4: broadcast join + projection — no further shuffle
    pidded
      .join(broadcast(offsets), Seq("pid", "shard"))
      .select(col("doc_id"), col("shard"),
        (col("start") + col("local") - col("min_local") + 1L).as("pos"))
  }
}
