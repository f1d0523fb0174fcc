package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design (100 TB): exact dedup is a hash-groupBy (one shuffle on
  * the digest — the minimum possible); near-dup avoids the O(n²) cross
  * join by blocking (here) or MinHash-LSH banding (MinHashLsh.scala),
  * both of which turn "all pairs" into "pairs sharing a bucket key",
  * i.e. an equi-join Spark can shuffle-partition.
  */
object Dedup {

  /** Exact duplicate groups: digest → group size + representative
    * (deterministic min-id member). */
  def exactGroups(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keep_id"))

  /** Normalized duplicate groups: fingerprint = md5(sorted distinct
    * tokens) — catches reorder/repetition duplicates. */
  def fingerprintGroups(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(Text.fingerprint(text).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keep_id"))

  /** Blocked n-gram Jaccard near-dup pairs: only pairs sharing
    * `blockKey` are compared (each block self-joins; at scale the block
    * key shuffles both sides to the same partitions — no global cross
    * join). Jaccard over distinct w-shingle sets; int/int division. */
  def jaccardPairs(docs: DataFrame, id: String, text: String,
      blockKey: String, w: Int = 3, threshold: Double = 0.55): DataFrame = {
    val withSets = docs.select(
      col(id), col(blockKey).as("block"),
      Text.shingleSet(col(text), w).as("sset"))
    val a = withSets.as("a")
    val b = withSets.as("b")
    val inter = size(array_intersect(col("a.sset"), col("b.sset")))
    val uni = size(array_union(col("a.sset"), col("b.sset")))
    val jac = inter.cast("double") / uni
    a.join(b, col("a.block") === col("b.block") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("a_id"), col(s"b.$id").as("b_id"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
