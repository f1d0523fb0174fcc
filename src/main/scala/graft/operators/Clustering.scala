package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** K-means over the embedding column — the corpus-clustering step of a
  * training-data pipeline (topic bucketing, diversity sampling,
  * cluster-balanced mixtures). Lloyd's algorithm with the classic
  * distributed plan:
  *
  *   - centroids are a k-row table, pivoted to ONE row and broadcast —
  *     assignment is a zero-shuffle codegen'd scan (k dot products per
  *     row via the native [[graft.functions.DotProduct]] kernel), the
  *     shape that scans 100 TB of vectors without moving them;
  *   - the centroid update is one map-side-combined aggregate to k rows
  *     (64 integer sums per cluster) — the only shuffle per iteration,
  *     and it carries k×64 longs.
  *
  * Determinism contract (DuckDB-oracle hash compare): embeddings are
  * quantized to an integer grid (floor(x·1e6) — floor, not round:
  * half-rounding differs across engines) so centroid updates are exact
  * integer sums with no float summation-order drift, and similarity is
  * cosine against the UNNORMALIZED centroid sum (cosine is
  * scale-invariant, so dividing by the cluster size — a cross-engine
  * decimal-division hazard — is unnecessary). Every remaining double op
  * (dot-product fold, sqrt, divide, compare) is IEEE-deterministic and
  * evaluated in the same order on both engines. Ties in the argmax go
  * to the lowest cluster id; init centroids are the first k vectors by
  * vec_id (deterministic seed, the k-means|| stand-in).
  */
object Clustering {

  val Dims = 64
  val Scale = 1000000.0

  /** floor-quantized embedding as array<double> of exact integer values
    * (unrolled element_at constructor, not a transform() HOF — HOFs are
    * CodegenFallback; this stays inside whole-stage codegen). */
  def quantized(emb: Column): Column =
    array((1 to Dims).map(i =>
      floor(element_at(emb, i).cast("double") * Scale).cast("double")): _*)

  /** embeddings(vec_id, embedding) -> (vec_id, qe, qn). */
  def prepare(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), quantized(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(Vec.dot(col("qe"), col("qe"))))

  /** k-row centroid table -> one broadcastable row with columns c0..c(k-1). */
  private def pivotCentroids(cents: DataFrame, k: Int): DataFrame =
    cents.groupBy().agg(
      first(when(col("cluster") === 0, col("c")), ignoreNulls = true).as("c0"),
      (1 until k).map(j =>
        first(when(col("cluster") === j, col("c")), ignoreNulls = true)
          .as(s"c$j")): _*)

  /** Assignment pass: argmax_j cosine(qe, c_j), ties to the lowest j.
    * The when-chain picks the first j whose cosine is >= every LATER
    * one — equivalent to lowest-index argmax (mirrored in the oracle
    * SQL). Zero shuffle: centroids ride in on a 1-row broadcast.
    *
    * An EMPTY cluster pivots to a NULL centroid, whose cosine would be
    * NULL; a NULL condition in the when-chain falls through to a LATER
    * index, not the best non-null cluster — so each cosine is coalesced
    * to -Infinity (identically in the oracle SQL), degrading the chain
    * to lowest-index argmax over the populated clusters. */
  def assign(prepared: DataFrame, cents: DataFrame, k: Int): DataFrame = {
    val withCos = prepared.crossJoin(broadcast(pivotCentroids(cents, k)))
      .select(col("vec_id") +: col("qe") +: (0 until k).map(j =>
        coalesce(
          Vec.dot(col("qe"), col(s"c$j")) /
            (col("qn") * sqrt(Vec.dot(col(s"c$j"), col(s"c$j")))),
          lit(Double.NegativeInfinity))
          .as(s"cos$j")): _*)
    val chain = (0 until k - 1).reverse.foldLeft(lit(k - 1): Column) { (els, j) =>
      val geAllLater = (j + 1 until k).map(m => col(s"cos$j") >= col(s"cos$m"))
        .reduce(_ && _)
      when(geAllLater, lit(j)).otherwise(els)
    }
    withCos.select(col("vec_id"), col("qe"), chain.as("cluster"))
  }

  /** Update pass: per-cluster component-wise integer sums -> the next
    * (unnormalized) centroid table. One shuffle to k rows. */
  def recompute(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cluster"))
      .agg(sum(element_at(col("qe"), 1).cast("long")).as("s1"),
        (2 to Dims).map(i =>
          sum(element_at(col("qe"), i).cast("long")).as(s"s$i")): _*)
      .select(col("cluster"),
        array((1 to Dims).map(i => col(s"s$i").cast("double")): _*).as("c"))

  /** Deterministic init: the first k vectors by vec_id become the k
    * centroids. THE single definition of the seed rule — the batch run,
    * the s14 streaming twin, and the spec all build init through here,
    * so changing the seed (e.g. to k-means||) changes all three and
    * their oracles together. */
  def initCentroids(prepared: DataFrame, k: Int): DataFrame =
    prepared.where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cluster"), col("qe").as("c"))

  /** Full run: init from the first k vectors, `iters` assignment passes
    * with a centroid update between each. Returns (vec_id, cluster). */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val prepared = prepare(embeddings)
    val init = initCentroids(prepared, k)
    val finalAssign = (1 until iters).foldLeft(assign(prepared, init, k)) {
      (a, _) => assign(prepared, recompute(a), k)
    }
    finalAssign.select(col("vec_id"), col("cluster"))
  }
}
