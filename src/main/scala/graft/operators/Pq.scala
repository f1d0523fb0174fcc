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
  * small codes (here 4×2 bits; production uses 8–16×8 bits — see the
  * codebook-scale note below). Search uses asymmetric distance
  * computation (ADC): the query stays full-precision, and its
  * similarity to any compressed vector is a sum of M table lookups —
  * per probe the lookup table costs O(M·K) kernel evaluations instead
  * of O(N), which is what makes re-ranking a 100 TB corpus feasible.
  *
  * Distributed plan, stage by stage:
  *   - TRAIN: the M codebooks fit in one broadcastable row (M·K
  *     sub-centroids), so each Lloyd pass over all subspaces is ONE
  *     zero-shuffle scan (assignment) plus ONE map-side-combined
  *     aggregate to ≤ M·K rows (update; subspaces ride a 4-way explode
  *     so all M updates share a single shuffle rather than M scans).
  *     The ≤ M·K-row model localCheckpoints ONCE per pass inside
  *     [[recomputeAll]], so every downstream branch (next pass, final
  *     encode, probe LUT, per-micro-batch streaming plans) reuses the
  *     materialized model instead of re-running the training subtree —
  *     the scale-correct cache point: checkpoint the tiny model, never
  *     the corpus-sized prepared frame (recomputing `prepare` IS the
  *     pruned parquet scan; checkpointing it would write the corpus to
  *     the block manager). Net corpus scans for train+encode: one per
  *     Lloyd pass plus one for the final encode — the inherent cost.
  *   - ENCODE: one scan against the broadcast codebook row — the same
  *     shape that encodes 100 TB without moving it.
  *   - SEARCH: the per-probe ADC lookup tables (probes × M·K cosines)
  *     build on the driver-sized probe set and broadcast; scoring is a
  *     broadcast nested-loop fan-out (probes × N rows) and the top-k
  *     rank filter collapses to per-task partial top-k
  *     (WindowGroupLimit) before the single per-probe merge.
  *
  * Codebook scale: K=4 centroids × M=4 subspaces (2-bit codes, one
  * Lloyd refinement) is deliberately the fixture-supportable setting,
  * not a production one — the sf0.01 oracle corpus holds 500 vectors,
  * so K=256 sub-codebooks (8-bit codes) would average < 2 training
  * vectors per centroid and most clusters would be empty or
  * single-vector (a degenerate codebook that memorizes, not
  * quantizes). The ceiling is MEASURED, not folklore: everything is
  * parameter-driven — [[K]]/[[M]]/[[SubDims]]/[[Iters]] feed every
  * loop here AND the generated DuckDB oracle SQL (SparkEntry's pq*
  * builders unroll from the same constants) — and the round-12
  * K=8 × Iters=2 experiment stayed oracle-green while costing ~+50%
  * per PQ query with a statistically unchanged n76 recall table (500
  * training vectors cannot exploit the doubled codebook; BASELINE.md
  * round-12 section). Production 8-bit × 8-subspace codebooks are the
  * same two-constant edit: the plan shapes above are invariant in
  * K/M/Iters — bigger codebooks only widen the broadcast row
  * (M·K·SubDims doubles: 8 MB at K=256, M=8 — still broadcastable)
  * and add Lloyd passes (one scan each).
  *
  * Determinism contract (DuckDB-oracle hash compare) is
  * [[Clustering]]'s, applied per subspace: floor-quantized integer
  * grid, exact integer-sum centroid updates, cosine against the
  * UNNORMALIZED centroid sums, coalesce(-∞) for empty clusters,
  * lowest-index argmax, every double fold evaluated in the same
  * ascending order as the oracle's unrolled SQL, and the ADC sum is a
  * pinned left-fold over subspaces (never an unordered aggregate).
  * Finite-ADC guarantee: [[prepare]] raises a loud error on any
  * zero-norm quantized subvector (the only NaN source — 0/0 cosine;
  * impossible on the md5-derived fixtures, possible on degenerate
  * all-⌊0⌋ user data where Spark's NaN ordering and DuckDB's would
  * silently diverge), and an EMPTY cluster's -∞ LUT entry is never
  * summed because no code can point at an empty cluster (argmax never
  * selects a -∞ cosine while any finite one exists, and with qn > 0
  * at least the vector's own nearest centroid is finite) — so every
  * emitted adc value is finite and floor(adc·10⁶)::BIGINT agrees
  * across engines.
  */
object Pq {

  val Dims = 64

  /** Subspaces × sub-dimension (M · SubDims = Dims). */
  val M = 4
  val SubDims = 16

  /** Centroids per subspace codebook. */
  val K = 4

  /** Lloyd refinement passes over the deterministic init. */
  val Iters = 1

  /** ADC probe set: the first [[Probes]] vectors by vec_id (the house
    * deterministic-seed rule), and results keep the top [[TopK]] per
    * probe. */
  val Probes = 8
  val TopK = 10

  /** embeddings(vec_id, embedding) → (vec_id, extra*, qe0..qe{M-1},
    * qn0..qn{M-1}): floor-quantized 16-dim subvectors and their norms,
    * with optional pass-through columns (e.g. the full-precision
    * vector for a composed IVF+PQ scan — Catalyst prunes them wherever
    * unused). Zero-norm subvectors fail LOUDLY here (see the
    * finite-ADC note in the header). */
  def prepareKeeping(embeddings: DataFrame, extra: Column*): DataFrame = {
    val qe = Clustering.quantized(col("embedding"))
    val base = embeddings.select(
      col("vec_id") +: (extra :+ qe.as("qe")): _*)
    val keep = base.columns.filter(_ != "qe").map(col).toSeq
    base
      .select(keep ++ (0 until M).map(m =>
        slice(col("qe"), 1 + m * SubDims, SubDims).as(s"qe$m")): _*)
      .select(keep ++ (0 until M).flatMap { m =>
        val d2 = Vec.dot(col(s"qe$m"), col(s"qe$m"))
        Seq(col(s"qe$m"),
          when(d2 > 0, sqrt(d2)).otherwise(raise_error(concat(
            lit(s"Pq: zero-norm quantized subvector $m for vec_id="),
            col("vec_id").cast("string")))).as(s"qn$m"))
      }: _*)
  }

  /** embeddings(vec_id, embedding) → (vec_id, qe*, qn*). */
  def prepare(embeddings: DataFrame): DataFrame = prepareKeeping(embeddings)

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
    * input columns pass through unchanged (so a composed scan can
    * carry e.g. the full-precision vector and an IVF cell) and
    * code0..code{M-1} append from the broadcast codebook row. */
  def assignAll(prepared: DataFrame, centsByM: Seq[DataFrame]): DataFrame = {
    val keep = prepared.columns.map(col).toSeq
    val withCos = prepared.crossJoin(broadcast(pivotCodebook(centsByM)))
      .select(keep ++
        (for (m <- 0 until M; j <- 0 until K)
          yield cosTo(col(s"qe$m"), col(s"qn$m"), col(s"c${m}_$j"))
            .as(s"cos${m}_$j")): _*)
    withCos.select(keep ++
      (0 until M).map(m => argmaxChain(j => s"cos${m}_$j").as(s"code$m")): _*)
  }

  /** Centroid update for ALL subspaces in one shuffle: the (m, code,
    * subvector) triples ride a 4-way explode into a single
    * map-side-combined aggregate of exact integer sums (≤ M·K rows),
    * then split back into the M per-subspace tables (each ≤ K rows).
    * The combined sums frame localCheckpoints HERE — eagerly, once —
    * so the training subtree (scan → explode → shuffle) behind it
    * never re-executes in the branches that consume the model (the
    * next Lloyd pass, the final encode, the probe LUT, every
    * streaming micro-batch). The checkpoint is ≤ M·K rows — model-
    * sized, not corpus-sized. */
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
      .localCheckpoint()
    (0 until M).map(m => sums.where(col("m") === m).select(col("cluster"), col("c")))
  }

  /** Deterministic init (house seed rule): the first K vectors' m-th
    * subvectors are subspace m's initial codebook. */
  def initCodebooks(prepared: DataFrame): Seq[DataFrame] =
    (0 until M).map(m =>
      prepared.where(col("vec_id") < K)
        .select(col("vec_id").cast("int").as("cluster"), col(s"qe$m").as("c")))

  /** Train ([[Iters]] Lloyd refinements) over an already-prepared
    * frame and return (refined codebooks, codes): the prepared frame
    * is built ONCE by the caller and reused across every pass (it is
    * a narrow projection of the scan — each pass re-runs the pruned
    * scan, which is the honest per-pass cost at any scale; the model
    * between passes is checkpointed by [[recomputeAll]]). */
  def trainPrepared(prepared: DataFrame): (Seq[DataFrame], DataFrame) = {
    val refined = (1 to Iters).foldLeft(initCodebooks(prepared)) { (cents, _) =>
      recomputeAll(assignAll(prepared, cents))
    }
    val codes = assignAll(prepared, refined)
      .select(col("vec_id") +: (0 until M).map(m => col(s"code$m")): _*)
    (refined, codes)
  }

  /** Train on a raw embeddings table (prepares internally). */
  def train(embeddings: DataFrame): (Seq[DataFrame], DataFrame) =
    trainPrepared(prepare(embeddings))

  /** The house probe set as a prepared-probe frame: the first
    * [[Probes]] corpus vectors by vec_id — a partition-pruned sliver
    * of the prepared scan. */
  def corpusProbes(prepared: DataFrame): DataFrame =
    prepared.where(col("vec_id") < Probes)
      .select(col("vec_id").as("probe_id") +:
        (0 until M).flatMap(m => Seq(col(s"qe$m"), col(s"qn$m"))): _*)

  /** Per-probe ADC lookup table over any prepared-probe frame
    * (probe_id, extra*, qe*, qn*): one row per probe with the M·K
    * sub-cosines p{m}_{j} = cos(probe's m-th subvector, codebook m's
    * centroid j); non-qe/qn input columns pass through. Probes ×
    * codebook is a broadcast NLJ over the driver-sized probe set,
    * itself then broadcast into the scoring scan. */
  def probeLut(preparedProbes: DataFrame, centsByM: Seq[DataFrame]): DataFrame = {
    val keep = preparedProbes.columns
      .filterNot(c => c.startsWith("qe") || c.startsWith("qn")).map(col).toSeq
    preparedProbes.crossJoin(broadcast(pivotCodebook(centsByM)))
      .select(keep ++
        (for (m <- 0 until M; j <- 0 until K)
          yield cosTo(col(s"qe$m"), col(s"qn$m"), col(s"c${m}_$j"))
            .as(s"p${m}_$j")): _*)
  }

  /** The pinned ADC left-fold over subspaces: Σ_m lut[m][code_m],
    * each term a lowest-first CASE chain over the LUT columns. */
  def adcScore: Column = {
    val terms = (0 until M).map { m =>
      (0 until K - 1).foldRight(col(s"p${m}_${K - 1}"): Column) { (j, els) =>
        when(col(s"code$m") === j, col(s"p${m}_$j")).otherwise(els)
      }
    }
    terms.foldLeft(lit(0.0): Column)(_ + _)
  }

  /** ADC top-k: score every (probe, vector) pair as a pinned left-fold
    * of M lookup-table CASEs, rank per probe (score DESC, vec_id), keep
    * the top [[TopK]]. Output: (probe_id, rk, vec_id, code*, adc_ppm). */
  def adcTopK(codes: DataFrame, lut: DataFrame): DataFrame = {
    val scored = codes.crossJoin(broadcast(lut))
      .select(col("probe_id") +: col("vec_id") +:
        (0 until M).map(m => col(s"code$m")) :+ adcScore.as("adc"): _*)
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
    * set. One operator = the PQ re-rank kernel a 100 TB ANN serving
    * path runs per query batch. The prepared frame builds ONCE and
    * feeds training, the encode and the probe LUT; the trained model
    * is checkpointed, so the whole query costs Iters+1 pruned corpus
    * scans (one per Lloyd pass, one for the encode) plus the
    * probe-sliver scan — nothing re-runs the training subtree. */
  def pqAnn(embeddings: DataFrame): DataFrame = {
    val prepared = prepare(embeddings)
    val (c1, codes) = trainPrepared(prepared)
    adcTopK(codes, probeLut(corpusProbes(prepared), c1))
  }
}
