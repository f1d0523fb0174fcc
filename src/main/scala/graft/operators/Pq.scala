package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) over the embedding column —
  * the vector-compression step of a billion-scale ANN index: the
  * 64-dim space splits into [[M]] 16-dim subspaces, each subspace gets
  * its own tiny k-means codebook, and every vector compresses to M
  * small codes (here 4×2 bits; production uses 8–16×8 bits). Search
  * uses asymmetric distance computation (ADC): the query stays
  * full-precision, and its similarity to any compressed vector is a
  * sum of M table lookups — per probe the lookup table costs O(M·K)
  * kernel evaluations instead of O(N), which is what makes re-ranking
  * a 100 TB corpus feasible.
  *
  * Distributed plan, stage by stage:
  *   - TRAIN: the M codebooks fit in one broadcastable row (M·K
  *     sub-centroids), so each Lloyd pass over all subspaces is ONE
  *     zero-shuffle scan (assignment) plus ONE map-side-combined
  *     aggregate to ≤ M·K rows (update; subspaces ride a 4-way explode
  *     so all M updates share a single shuffle rather than M scans).
  *   - ENCODE: one scan against the broadcast codebook row — the same
  *     shape that encodes 100 TB without moving it.
  *   - SEARCH: the per-probe ADC lookup tables (probes × M·K cosines)
  *     build on the driver-sized probe set and broadcast; scoring is a
  *     broadcast nested-loop fan-out (probes × N rows) and the top-k
  *     rank filter collapses to per-task partial top-k
  *     (WindowGroupLimit) before the single per-probe merge.
  *
  * Determinism contract (DuckDB-oracle hash compare) is
  * [[Clustering]]'s, applied per subspace: floor-quantized integer
  * grid, exact integer-sum centroid updates, cosine against the
  * UNNORMALIZED centroid sums, coalesce(-∞) for empty clusters,
  * lowest-index argmax, every double fold evaluated in the same
  * ascending order as the oracle's unrolled SQL, and the ADC sum is a
  * pinned left-fold over subspaces (never an unordered aggregate).
  */
object Pq {

  val Dims = 64

  /** Subspaces × sub-dimension (M · SubDims = Dims). */
  val M = 4
  val SubDims = 16

  /** Centroids per subspace codebook. */
  val K = 4

  /** ADC probe set: the first [[Probes]] vectors by vec_id (the house
    * deterministic-seed rule), and results keep the top [[TopK]] per
    * probe. */
  val Probes = 8
  val TopK = 10

  /** embeddings(vec_id, embedding) → (vec_id, qe0..qe{M-1}, qn0..qn{M-1}):
    * floor-quantized 16-dim subvectors and their norms. */
  def prepare(embeddings: DataFrame): DataFrame = {
    val qe = Clustering.quantized(col("embedding"))
    val subCols = (0 until M).flatMap { m =>
      val sub = slice(qe, 1 + m * SubDims, SubDims).as(s"qe$m")
      Seq(sub)
    }
    embeddings.select(col("vec_id") +: subCols: _*)
      .select(col("vec_id") +: (0 until M).flatMap(m => Seq(
        col(s"qe$m"),
        sqrt(Vec.dot(col(s"qe$m"), col(s"qe$m"))).as(s"qn$m"))): _*)
  }

  /** M per-subspace centroid tables (cluster, c) → ONE broadcastable
    * row with columns c{m}_{j}; empty clusters pivot to NULL (coalesced
    * to -∞ at the cosine, as in [[Clustering.assign]]). */
  private def pivotCodebook(centsByM: Seq[DataFrame]): DataFrame =
    centsByM.zipWithIndex.map { case (cents, m) =>
      cents.groupBy().agg(
        first(when(col("cluster") === 0, col("c")), ignoreNulls = true)
          .as(s"c${m}_0"),
        (1 until K).map(j =>
          first(when(col("cluster") === j, col("c")), ignoreNulls = true)
            .as(s"c${m}_$j")): _*)
    }.reduce(_.crossJoin(_))

  private def cosTo(qeM: Column, qnM: Column, cent: Column): Column =
    coalesce(
      Vec.dot(qeM, cent) / (qnM * sqrt(Vec.dot(cent, cent))),
      lit(Double.NegativeInfinity))

  /** Lowest-index argmax over cos0..cos{K-1} column names. */
  private def argmaxChain(cosName: Int => String): Column =
    (0 until K - 1).reverse.foldLeft(lit(K - 1): Column) { (els, j) =>
      val geAllLater = (j + 1 until K).map(m => col(cosName(j)) >= col(cosName(m)))
        .reduce(_ && _)
      when(geAllLater, lit(j)).otherwise(els)
    }

  /** Assignment pass over ALL subspaces in one zero-shuffle scan:
    * (vec_id, qe*, qn*) × broadcast codebook row → code0..code{M-1}. */
  def assignAll(prepared: DataFrame, centsByM: Seq[DataFrame]): DataFrame = {
    val withCos = prepared.crossJoin(broadcast(pivotCodebook(centsByM)))
      .select(
        (col("vec_id") +: (0 until M).map(m => col(s"qe$m"))) ++
          (for (m <- 0 until M; j <- 0 until K)
            yield cosTo(col(s"qe$m"), col(s"qn$m"), col(s"c${m}_$j"))
              .as(s"cos${m}_$j")): _*)
    withCos.select(
      (col("vec_id") +: (0 until M).map(m => col(s"qe$m"))) ++
        (0 until M).map(m => argmaxChain(j => s"cos${m}_$j").as(s"code$m")): _*)
  }

  /** Centroid update for ALL subspaces in one shuffle: the (m, code,
    * subvector) triples ride a 4-way explode into a single
    * map-side-combined aggregate of exact integer sums (≤ M·K rows),
    * then split back into the M per-subspace tables (each ≤ K rows). */
  def recomputeAll(assigned: DataFrame): Seq[DataFrame] = {
    val exploded = assigned.select(explode(array((0 until M).map(m =>
      struct(lit(m).as("m"), col(s"code$m").as("cluster"),
        col(s"qe$m").as("sub"))): _*)).as("x"))
      .select(col("x.m").as("m"), col("x.cluster").as("cluster"),
        col("x.sub").as("sub"))
    val sums = exploded.groupBy(col("m"), col("cluster"))
      .agg(sum(element_at(col("sub"), 1).cast("long")).as("s1"),
        (2 to SubDims).map(i =>
          sum(element_at(col("sub"), i).cast("long")).as(s"s$i")): _*)
      .select(col("m"), col("cluster"),
        array((1 to SubDims).map(i => col(s"s$i").cast("double")): _*).as("c"))
    (0 until M).map(m => sums.where(col("m") === m).select(col("cluster"), col("c")))
  }

  /** Deterministic init (house seed rule): the first K vectors' m-th
    * subvectors are subspace m's initial codebook. */
  def initCodebooks(prepared: DataFrame): Seq[DataFrame] =
    (0 until M).map(m =>
      prepared.where(col("vec_id") < K)
        .select(col("vec_id").cast("int").as("cluster"), col(s"qe$m").as("c")))

  /** Train (1 Lloyd refinement) and return (refined codebooks, codes):
    * codes = (vec_id, code0..code{M-1}). */
  def train(embeddings: DataFrame): (Seq[DataFrame], DataFrame) = {
    val prepared = prepare(embeddings)
    val a1 = assignAll(prepared, initCodebooks(prepared))
    val c1 = recomputeAll(a1)
    val codes = assignAll(prepared, c1)
      .select(col("vec_id") +: (0 until M).map(m => col(s"code$m")): _*)
    (c1, codes)
  }

  /** Per-probe ADC lookup table: one row per probe with the M·K
    * sub-cosines p{m}_{j} = cos(probe's m-th subvector, codebook m's
    * centroid j). Probes × codebook is a broadcast NLJ over ≤ Probes
    * rows — driver-sized, then itself broadcast into the scoring scan. */
  def probeLut(prepared: DataFrame, centsByM: Seq[DataFrame]): DataFrame =
    prepared.where(col("vec_id") < Probes)
      .crossJoin(broadcast(pivotCodebook(centsByM)))
      .select(col("vec_id").as("probe_id") +:
        (for (m <- 0 until M; j <- 0 until K)
          yield cosTo(col(s"qe$m"), col(s"qn$m"), col(s"c${m}_$j"))
            .as(s"p${m}_$j")): _*)

  /** ADC top-k: score every (probe, vector) pair as a pinned left-fold
    * of M lookup-table CASEs, rank per probe (score DESC, vec_id), keep
    * the top [[TopK]]. Output: (probe_id, rk, vec_id, code*, adc_ppm). */
  def adcTopK(codes: DataFrame, lut: DataFrame): DataFrame = {
    val terms = (0 until M).map { m =>
      (0 until K - 1).foldRight(col(s"p${m}_${K - 1}"): Column) { (j, els) =>
        when(col(s"code$m") === j, col(s"p${m}_$j")).otherwise(els)
      }
    }
    val adc = terms.foldLeft(lit(0.0): Column)(_ + _)
    val scored = codes.crossJoin(broadcast(lut))
      .select(col("probe_id") +: col("vec_id") +:
        (0 until M).map(m => col(s"code$m")) :+ adc.as("adc"): _*)
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rk") <= TopK)
      .select(col("probe_id") +: col("rk") +: col("vec_id") +:
        (0 until M).map(m => col(s"code$m")) :+
        floor(col("adc") * lit(1000000.0)).cast("long").as("adc_ppm"): _*)
  }

  /** Full run: train on the corpus, encode it, ADC-search the probe
    * set. One operator = the IVF-PQ re-rank kernel a 100 TB ANN serving
    * path runs per query batch. */
  def pqAnn(embeddings: DataFrame): DataFrame = {
    val prepared = prepare(embeddings)
    val (c1, codes) = train(embeddings)
    adcTopK(codes, probeLut(prepared, c1))
  }
}
