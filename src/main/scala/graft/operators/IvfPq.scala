package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC (Jégou et al., TPAMI 2011, §V): the composed ANN serving
  * path a billion-scale index actually runs per query batch — coarse
  * IVF cell pruning first (search only the probe's nprobe nearest
  * cells), then ranking the surviving candidates by PQ asymmetric
  * distance (M table lookups per candidate) instead of full-precision
  * cosine. n15 exercises the pruner alone, n75 the ADC re-ranker
  * alone, n72 the recall harness alone; this operator runs the real
  * pipeline and measures what the composition COSTS in recall:
  * IVFADC's top-k vs plain IVF (exact scoring, same candidate set) at
  * EQUAL probe budget (nprobe = 1 and 2), both against the exact
  * full-corpus top-k ground truth.
  *
  * Plan, built for the 100 TB case:
  *   - ONE corpus scan produces (vec_id, v, cell, code0..M): the IVF
  *     cell and the PQ codes are both per-row expressions against
  *     broadcast models (fixed coarse centroids as literals, trained
  *     codebooks as the checkpointed ≤ M·K-row frame) — at scale this
  *     scan is the index build, written once and bucketed by cell.
  *   - The probe set (driver-sized) quantizes through the SAME
  *     [[Pq.prepareKeeping]] path as the corpus, gets its ADC lookup
  *     table from [[Pq.probeLut]], and broadcasts into the scoring
  *     fan-out (probes × N — the price of evaluating all probes and
  *     the ground truth in one pass; a pure serving run would filter
  *     `cell ∈ probe cells` FIRST and scan 1/Cells of the data).
  *   - Every top-k is a rank-filtered window that Catalyst rewrites
  *     to WindowGroupLimit: each map task keeps its per-probe top k
  *     BEFORE the exchange, so no shuffle ever carries the corpus.
  *
  * Determinism: the IVF side is [[Similarity]]'s contract (fixed
  * dyadic centroids/probes, left-fold dot products, argmin ties to
  * the lowest cell, vec_id tiebreaks); the PQ side is [[Pq]]'s
  * (integer-grid quantization, pinned ADC left-fold, finite by the
  * qn > 0 guard). Recall counts are exact integers, ppm by integer
  * division — the oracle re-derives every row mechanically.
  *
  * Why RAW-vector PQ, not Jégou §V's residual encoding (x − c(cell)):
  * a deliberate, pinned choice, for two reasons.
  *   - GEOMETRY: residual ADC is inseparable from L2 — the
  *     approximation d(y,x)² ≈ Σ_m ‖(y−c)_m − r̂_m‖² only means
  *     anything as a squared distance; there is no cosine reading of
  *     "probe residual vs candidate residual" that ranks candidates
  *     for the probe (residual directions near an accurate centroid
  *     are noise-dominated, and cosine discards exactly the magnitude
  *     L2 keeps). This engine's whole cross-engine-exactness contract
  *     is built on cosine's SCALE-INVARIANCE: training can keep
  *     unnormalized integer centroid sums (exact BIGINT arithmetic on
  *     both engines — [[Clustering]]/[[Pq.recomputeAll]]); an L2
  *     codebook needs the mean, whose division rounds differently
  *     across engines, or exact cross-multiplied comparisons whose
  *     terms at the 10⁶ integer grid exceed 64-bit (int128/DECIMAL(38)
  *     paths whose overflow/rounding semantics the two engines don't
  *     share). Residual-PQ-done-faithfully would trade the repo's
  *     bit-exact oracle for a tolerance band on its flagship ANN path.
  *   - EVIDENCE: the r12 codebook-scale experiment (BASELINE.md
  *     round-12 section) doubled K at Iters=2 and left the n76 recall
  *     table statistically unchanged — ~500 training vectors cannot
  *     exploit a finer codebook, and residual encoding is precisely a
  *     finer-codebook play (it spends the codes on residual energy).
  *     The recall table, not folklore, says the fixture regime has no
  *     headroom for it; at production scale the switch is the L2
  *     kernel above plus one subtraction in [[Pq.prepareKeeping]]'s
  *     input expression, with the plan shapes unchanged.
  */
object IvfPq {

  /** Probe set: [[Similarity.Probes]] dyadic vectors spread across
    * cells (the n72 harness set), as (vec_id, embedding, pcell,
    * pcell2) — vec_id because [[Pq.prepareKeeping]] keys on it. */
  private[graft] def probeFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until Similarity.Probes)
      .map(p => (p, Similarity.probeVec(p), Similarity.probeCell(p),
        Similarity.probeCells(p)(1)))
      .toDF("vec_id", "embedding", "pcell", "pcell2")
  }

  /** recall@k of IVFADC vs plain IVF at equal probe budget, one row
    * per probe: (probe_id, cell, n_ivf, n_ivfadc, n_ivf_mp2,
    * n_ivfadc_mp2, recall_*_ppm×4). `n_ivf` ranks the nprobe=1
    * candidate cell by exact cosine (what n72 measures), `n_ivfadc`
    * ranks the SAME candidates by ADC — the delta is pure
    * quantization loss; `*_mp2` repeats both at nprobe=2. */
  def ivfPqRecall(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    // one prepared frame feeds training, encode and the IVF cell
    val prepared = Pq.prepareKeeping(embeddings,
      col("embedding").cast("array<double>").as("v"))
    val (codebooks, _) = Pq.trainPrepared(prepared)
    val encoded = Pq.assignAll(prepared, codebooks)
      .withColumn("cell", Similarity.ivfCell(col("v")))
    // probes ride the same quantization path, then pick up their ADC
    // lookup table against the trained codebooks
    val pPrepared = Pq.prepareKeeping(probeFrame(spark),
      col("embedding").as("pvec"), col("pcell"), col("pcell2"))
      .withColumnRenamed("vec_id", "probe_id")
    val lut = Pq.probeLut(pPrepared, codebooks)
    val scored = encoded.crossJoin(broadcast(lut))
      .select(col("probe_id"), col("pcell"), col("pcell2"),
        col("vec_id"), col("cell"),
        Similarity.cosine(col("v"), col("pvec")).as("cos"),
        Pq.adcScore.as("adc"))
    val byCos = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val byAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    def topIds(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
        .select(col("probe_id"), col("vec_id"))
    // the exact ground truth feeds all four match branches — checkpoint
    // it so the scored subtree runs once for it, not four times; it is
    // Probes·k rows (driver-sized at any corpus size), the same
    // model-sized-cache rule as Pq.recomputeAll
    val exact = topIds(scored, byCos).localCheckpoint()
    def matched(cand: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
                out: String): DataFrame =
      exact.join(topIds(cand, w), Seq("probe_id", "vec_id"), "left_semi")
        .groupBy(col("probe_id")).agg(count(lit(1)).as(out))
    // the nprobe=2 candidate set materializes ONCE and feeds all four
    // match branches (nprobe=1 is its cell==pcell subset): without the
    // cut each branch re-evaluates the probes×N scoring fan-out — 5
    // full cross-join passes per query (ground truth + 4 branches)
    // measured at ~5× the one-pass task time. The checkpoint is the
    // IVF-PRUNED working set (≈ nprobe/Cells · probes·N rows — the
    // exact candidate volume a production IVFADC serve materializes),
    // never the corpus, so the cut scales with the serving budget.
    val two = scored.where(col("cell") === col("pcell") ||
      col("cell") === col("pcell2")).localCheckpoint()
    val one = two.where(col("cell") === col("pcell"))
    val counts = Seq(
      matched(one, byCos, "n_ivf"), matched(one, byAdc, "n_ivfadc"),
      matched(two, byCos, "n_ivf_mp2"), matched(two, byAdc, "n_ivfadc_mp2"))
    val base = probeFrame(spark)
      .select(col("vec_id").as("probe_id"), col("pcell").as("cell"))
    val joined = counts.foldLeft(base)((acc, m) =>
      acc.join(m, Seq("probe_id"), "left"))
    val filled = Seq("n_ivf", "n_ivfadc", "n_ivf_mp2", "n_ivfadc_mp2")
      .foldLeft(joined)((df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L))))
    Seq("ivf", "ivfadc", "ivf_mp2", "ivfadc_mp2").foldLeft(filled)((df, s) =>
      df.withColumn(s"recall_${s}_ppm", expr(s"n_$s * 1000000 div $k")))
  }

  /** SERVING-shaped IVFADC at nprobe=2 (n78) — the production plan the
    * [[ivfPqRecall]] harness deliberately doesn't run: candidates are
    * cell-pruned FIRST, before any per-probe work, and the result is
    * the actual ADC top-k rows (probe_id, rk, vec_id, cell, adc_ppm),
    * provably identical to n76's IVFADC\@nprobe=2 ranking (IvfPqSpec
    * pins plan-changes-answer-doesn't, the SKEW.md idiom).
    *
    * Two structural differences from the harness query, both the
    * reason IVF exists:
    *   - The candidate filter is a LITERAL `cell IN (probed cells)`
    *     predicate — the probe cells are deterministic driver-side
    *     values, so on a corpus stored partitioned/bucketed by cell
    *     (the index layout an IVFADC deployment writes — the scaladoc
    *     header's "written once and bucketed by cell") this is
    *     partition pruning: the scan READS nprobe/Cells of the data,
    *     the 1/Cells scan reduction of IvfPq.scala:28-30's caveat.
    *     Here the cells are computed in-query, so the filter prunes
    *     the fan-out, not the file scan.
    *   - Probe × candidate scoring is an EQUI-JOIN on cell against the
    *     per-(probe, cell) LUT rows — each candidate meets only the
    *     probes actually probing its cell, emitting Σ_p |cells_p∩data|
    *     scored rows (≈ nprobe/Cells · probes·N) instead of the
    *     harness's probes × N cross-join fan-out. BenchUtil's
    *     numOutputRows on the join node measures the reduction.
    *
    * Everything else — quantization grid, trained codebooks, ADC
    * left-fold, (adc DESC, vec_id) tiebreak, WindowGroupLimit top-k —
    * is byte-identical to the n76 path, which is what makes the
    * equality assertion meaningful. */
  /** Literal probed-cell set at nprobe=2, known before the query runs
    * — the partition-prune predicate at production layout. */
  private[graft] def probedCells: Seq[Int] =
    (0 until Similarity.Probes)
      .flatMap(p => Similarity.probeCells(p).take(2)).distinct.sorted

  /** (vec_id, embedding) → (vec_id, cell, code0..M) against trained
    * codebooks — the pure per-row index-ENTRY expression (broadcast
    * model, zero shuffle) shared by the batch build and the streaming
    * append path (s33): a vector compresses the same way whether it
    * arrives in the initial build scan or in a later micro-batch. */
  private[graft] def encodeAgainst(embeddings: DataFrame,
      codebooks: Seq[DataFrame]): DataFrame =
    Pq.assignAll(Pq.prepareKeeping(embeddings,
        col("embedding").cast("array<double>").as("v")), codebooks)
      .withColumn("cell", Similarity.ivfCell(col("v")))
      .select(col("vec_id") +: col("cell") +:
        (0 until Pq.M).map(m => col(s"code$m")): _*)

  /** Train on the corpus and return (codebooks, encoded corpus with
    * its IVF cell) — the index-build stage shared by both serving
    * shapes (private[graft]: IvfPqSpec re-uses it to write its own
    * partitioned index for the file-level pruning proof). */
  private[graft] def buildIndex(embeddings: DataFrame): (Seq[DataFrame], DataFrame) = {
    val (codebooks, _) = Pq.train(embeddings)
    (codebooks, encodeAgainst(embeddings, codebooks))
  }

  /** The serving tail shared by [[ivfPqServe]]/[[ivfPqServeIndexed]]:
    * per-(probe, cell) LUT rows equi-joined onto the cell-pruned
    * candidates, ranked by the pinned ADC fold. */
  private def serveTail(spark: org.apache.spark.sql.SparkSession,
      candidates: DataFrame, codebooks: Seq[DataFrame], k: Int): DataFrame = {
    val pPrepared = Pq.prepareKeeping(probeFrame(spark),
      col("pcell"), col("pcell2"))
      .withColumnRenamed("vec_id", "probe_id")
    // LUT exploded to one row per (probe, probed cell): the equi-join
    // key that replaces the harness's cross-join-then-filter
    val lutByCell = Pq.probeLut(pPrepared, codebooks)
      .select(col("*"),
        explode(array(col("pcell"), col("pcell2"))).as("cell"))
      .drop("pcell", "pcell2")
    val scored = candidates.join(broadcast(lutByCell), Seq("cell"))
      .select(col("probe_id"), col("vec_id"), col("cell"),
        Pq.adcScore.as("adc"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id"),
        col("cell").cast("int").as("cell"),
        floor(col("adc") * lit(1000000.0)).cast("long").as("adc_ppm"))
  }

  def ivfPqServe(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val (codebooks, encoded) = buildIndex(embeddings)
    val candidates = encoded
      .where(col("cell").isin(probedCells.map(_.asInstanceOf[Any]): _*))
    serveTail(spark, candidates, codebooks, k)
  }

  /** The MATERIALIZED index layout (n79): [[ivfPqServe]] claims that
    * on a cell-partitioned store the literal IN prunes the SCAN, not
    * just the fan-out — this operator makes that claim checkable by
    * actually writing the encoded corpus `partitionBy("cell")` (the
    * index build a deployment runs once, amortized over every query
    * batch), reading it back, and serving from the pruned read. `cell`
    * comes back as a PARTITION column, so the IN predicate is
    * partition pruning proper: directories of unprobed cells are never
    * listed into the scan (IvfPqSpec reads PartitionFilters + the
    * scan's file count from the executed plan; with the fixture's
    * nprobe=2/Cells=4 every cell happens to be probed by SOME probe,
    * so the spec also serves a nprobe=1 subset where files genuinely
    * drop out). Same oracle as n78 VERBATIM — three plans (harness
    * fan-out, in-query prune, partitioned-store prune), one answer,
    * one byte-identical SQL twin: the n46/n63 idiom at its strongest. */
  def ivfPqServeIndexed(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val (codebooks, encoded) = buildIndex(embeddings)
    val idxDir = graft.TempDirs.create("graft-ivf-index")
    encoded.write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    serveFromStore(spark, idxDir, codebooks, k)
  }

  /** Serve from a MATERIALIZED cell-partitioned store (written by
    * [[ivfPqServeIndexed]]'s batch build or s33's streaming append —
    * the store layout is the contract, not who wrote it): read back,
    * prune with the literal probed-cell IN (partition pruning proper,
    * `cell` is a partition column), rank via [[serveTail]]. */
  private[graft] def serveFromStore(spark: org.apache.spark.sql.SparkSession,
      idxDir: String, codebooks: Seq[DataFrame], k: Int): DataFrame = {
    val index = spark.read.parquet(idxDir)
    val candidates = index
      .where(col("cell").isin(probedCells.map(_.asInstanceOf[Any]): _*))
    serveTail(spark, candidates, codebooks, k)
  }
}
