package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine — a single scan, no shuffle, fully
  * codegen'd (zip_with + left-fold aggregate; no UDF). The scale path is
  * LSH bucketing (SimilarityLsh) which prunes candidates before the
  * exact re-score.
  *
  * Numeric determinism: float→double casts and float-product doubles are
  * exact; the dot/norm folds are left-to-right, so any engine computing
  * the same fold order produces bit-identical doubles (the DuckDB oracle
  * unrolls the same fold).
  */
object Similarity {

  /** Native left-fold dot product (see functions.DotProduct) — the HOF
    * `aggregate(zip_with(...))` form computes the identical double but
    * interpreted; bit-parity is covered by ShinglesSpec/VecSpec. */
  def dot(a: Column, b: Column): Column = Vec.dot(a, b)

  def norm(a: Column): Column = Vec.norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact dyadic query vector (multiples of 0.125 — binary-exact in
    * both engines and in its SQL decimal literal form). */
  val queryVec: Seq[Double] = (0 until 64).map(i => ((i % 7) - 3) * 0.125)

  def queryVecLit: Column = array(queryVec.map(lit): _*)

  /** Brute-force cosine vs the fixture query vector. */
  def bruteForceCosine(embeddings: DataFrame): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    embeddings.select(col("vec_id"), cosine(emb, queryVecLit).as("cos"))
  }

  /** All vectors above a cosine threshold (set-deterministic). */
  def aboveThreshold(embeddings: DataFrame, t: Double): DataFrame =
    bruteForceCosine(embeddings).where(col("cos") > t)

  /** Exact top-k with deterministic tiebreak. */
  def topK(embeddings: DataFrame, k: Int): DataFrame =
    bruteForceCosine(embeddings)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  // ------------------------------------------------------------------
  // Scale path: signed-random-projection (SRP) LSH bucketing.
  //
  // Each vector gets a `Planes`-bit bucket: bit i = (v · h_i > 0) for a
  // fixed ±1 hyperplane h_i. Search touches ONLY the probe's bucket —
  // at 100 TB that turns the full scan into a partition-pruned read
  // (bucket as a partition/bucketing column), trading recall (vectors
  // whose bucket differs from the probe's are never scored) for a
  // 2^Planes fan-in reduction. The oracle mirrors the bucketing
  // exactly, so this is verified as the deterministic semantics it is.

  /** Number of SRP hyperplanes (16 buckets). */
  val Planes = 4

  /** Fixed ±1 hyperplane i — arbitrary but deterministic pattern,
    * shared with the SQL oracle text. */
  def hyperplane(i: Int): Seq[Double] =
    (0 until 64).map(j => if ((j * 31 + i * 17) % 5 < 2) -1.0 else 1.0)

  /** SRP bucket id of an `array<double>` column (native dot kernel). */
  def srpBucket(v: Column): Column =
    (0 until Planes).map { i =>
      val plane = array(hyperplane(i).map(lit): _*)
      when(Vec.dot(v, plane) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The probe vector's bucket, computed driver-side with the same
    * left-fold arithmetic. */
  lazy val queryBucket: Int =
    (0 until Planes).map { i =>
      val h = hyperplane(i)
      var acc = 0.0
      var j = 0
      while (j < 64) { acc += queryVec(j) * h(j); j += 1 }
      if (acc > 0) 1 << i else 0
    }.sum

  /** Bucketed ANN: score only vectors in the probe's SRP bucket, then
    * exact cosine top-k within it. */
  def lshBucketTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    embeddings
      .select(col("vec_id"), v.as("v"))
      .where(srpBucket(col("v")) === lit(queryBucket))
      .select(col("vec_id"), cosine(col("v"), queryVecLit).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // IVF-style cell pruning: assign every vector to its nearest of
  // `Cells` fixed coarse centroids, search only the probe's cell. (A
  // production IVF trains centroids with k-means; fixed deterministic
  // centroids keep the oracle exact while exercising the identical
  // plan shape — at 100 TB the cell id is a partition column and the
  // probe reads 1/Cells of the data, optionally multi-probing
  // neighboring cells for recall.)

  val Cells = 4

  /** Fixed centroid m — deterministic dyadic entries (exact in SQL
    * literals and doubles). */
  def centroid(m: Int): Seq[Double] =
    (0 until 64).map(j => (((j * 13 + m * 29) % 7) - 3) * 0.25)

  /** ‖c‖² for centroid m, left-fold (matches the oracle's fold). */
  def centroidNorm2(m: Int): Double = {
    val c = centroid(m)
    var acc = 0.0
    var j = 0
    while (j < 64) { acc += c(j) * c(j); j += 1 }
    acc
  }

  /** Nearest-centroid score: argmin_m ‖v−c_m‖² = argmin_m (‖c_m‖² − 2·v·c_m)
    * — the ‖v‖² term is constant across m and dropped on BOTH sides, so
    * the tie-order is bit-identical to the oracle. Ties → lowest m. */
  def ivfCell(v: Column): Column = {
    val scores = (0 until Cells).map { m =>
      val c = array(centroid(m).map(lit): _*)
      lit(centroidNorm2(m)) - lit(2.0) * Vec.dot(v, c)
    }
    // argmin as a when-chain: first m that is <= all later scores
    var cell: Column = lit(Cells - 1)
    var m = Cells - 2
    while (m >= 0) {
      val beatsRest = (m + 1 until Cells).map(k => scores(m) <= scores(k)).reduce(_ && _)
      cell = when(beatsRest, lit(m)).otherwise(cell)
      m -= 1
    }
    cell
  }

  /** The probe vector's cell, same arithmetic driver-side. */
  lazy val queryCell: Int = {
    val scores = (0 until Cells).map { m =>
      val c = centroid(m)
      var acc = 0.0
      var j = 0
      while (j < 64) { acc += queryVec(j) * c(j); j += 1 }
      centroidNorm2(m) - 2.0 * acc
    }
    (0 until Cells).minBy(m => (scores(m), m))
  }

  /** IVF ANN: exact cosine top-k restricted to the probe's cell. */
  def ivfTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    embeddings
      .select(col("vec_id"), v.as("v"))
      .where(ivfCell(col("v")) === lit(queryCell))
      .select(col("vec_id"), cosine(col("v"), queryVecLit).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // ANN recall harness: the measurement a pruned-index deployment is
  // actually judged by — recall@k of the approximate path against the
  // exact top-k ground truth, per probe. Both paths are deterministic
  // here (fixed centroids, exact fold arithmetic, vec_id tiebreaks),
  // so recall is an EXACT integer per probe, not a sampled estimate —
  // the oracle recomputes it to the ppm.

  /** Number of probe vectors in the recall harness. */
  val Probes = 6

  /** Probe p — dyadic entries (multiples of 0.125, binary-exact in SQL
    * literals and doubles), pattern varied per probe so the probe set
    * spreads across IVF cells. */
  def probeVec(p: Int): Seq[Double] =
    (0 until 64).map(j => (((j * (p + 3) + p * 11) % 9) - 4) * 0.125)

  /** Probe p's cells ordered nearest-first, same driver-side fold as
    * [[queryCell]] — index 0 is the single-probe cell, the prefix of
    * length nprobe is the multi-probe search set. */
  def probeCells(p: Int): Seq[Int] = {
    val pv = probeVec(p)
    val scores = (0 until Cells).map { m =>
      val c = centroid(m)
      var acc = 0.0
      var j = 0
      while (j < 64) { acc += pv(j) * c(j); j += 1 }
      centroidNorm2(m) - 2.0 * acc
    }
    (0 until Cells).sortBy(m => (scores(m), m))
  }

  /** Probe p's IVF cell (nearest centroid). */
  def probeCell(p: Int): Int = probeCells(p).head

  /** recall@k of the IVF cell-pruned path vs exact top-k, per probe.
    *
    * Plan shape, built for the 100 TB case: the corpus is scanned ONCE
    * (cell assignment + probe fan-out are one narrow projection — the
    * Probes× row fan-out is the price of evaluating all probes in one
    * pass); each top-k is a rank-filtered window, which Catalyst
    * rewrites to WindowGroupLimit — every map task keeps only its
    * per-probe top k BEFORE the exchange, so the shuffle carries
    * O(tasks·Probes·k) rows, never the corpus, and the per-probe
    * partition skew of a naive full-sort window never materializes.
    * Output: one row per probe with the exact match count and recall
    * in integer ppm, at nprobe=1 (the probe's cell) and nprobe=2 (two
    * nearest cells) — the multi-probe column shows what the standard
    * IVF recall knob buys: the superset candidate set can only keep or
    * gain true top-k members (monotone under the tie-broken ranking),
    * at 2/Cells of the corpus scanned instead of 1/Cells. */
  def recallAtK(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val probes = (0 until Probes)
      .map(p => (p, probeVec(p), probeCell(p), probeCells(p)(1)))
      .toDF("probe_id", "pvec", "pcell", "pcell2")
    val scored = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", ivfCell(col("v")))
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("pcell"), col("pcell2"), col("vec_id"),
        col("cell"), cosine(col("v"), col("pvec")).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    def topK(df: DataFrame): DataFrame = df
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"))
    val exact = topK(scored)
    def matchedCount(candidates: DataFrame, out: String): DataFrame =
      exact.join(topK(candidates), Seq("probe_id", "vec_id"), "left_semi")
        .groupBy(col("probe_id")).agg(count(lit(1)).as(out))
    val m1 = matchedCount(scored.where(col("cell") === col("pcell")), "n_matched")
    val m2 = matchedCount(
      scored.where(col("cell") === col("pcell") || col("cell") === col("pcell2")),
      "n_matched_mp2")
    probes.select(col("probe_id"), col("pcell").as("cell"))
      .join(m1, Seq("probe_id"), "left")
      .join(m2, Seq("probe_id"), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("n_matched_mp2", coalesce(col("n_matched_mp2"), lit(0L)))
      .withColumn("recall_ppm", expr(s"n_matched * 1000000 div $k"))
      .withColumn("recall_ppm_mp2", expr(s"n_matched_mp2 * 1000000 div $k"))
  }

  /** Embedding-cosine near-dup pairs: all (a,b), a<b, with
    * cos(a,b) ≥ t. Norms are computed once per side BEFORE the pair
    * join, so the O(n²) inner loop is a single native dot product per
    * pair inside whole-stage codegen (the join is a broadcast
    * nested-loop — no equi key exists; at 100 TB, pre-bucket by
    * [[srpBucket]] and join bucket-to-bucket first). */
  def cosinePairs(embeddings: DataFrame, t: Double): DataFrame = {
    val v = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Vec.norm(col("v")))
    val a = v.as("a")
    val b = v.as("b")
    val cos = Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), cos.as("cos"))
      .where(col("cos") >= t)
  }

  /** Exact cosine near-dup pairs as a grid-distributed EQUI-join — the
    * scale-safe replacement for [[cosinePairs]]' broadcast nested loop.
    *
    * Dense 64-dim cosine at a mid threshold has no exact sub-quadratic
    * candidate filter (measured on the fixture: pairs at cos ≥ 0.45 sit
    * at SRP-bucket Hamming distance up to 4 of 4 — i.e. bucketing loses
    * pairs at ANY probe radius short of "all buckets"; see
    * [[cosinePairsBucketed]] for the high-similarity regime where
    * bucketing does apply). What CAN be fixed at scale is the join
    * topology: a broadcast NLJ ships one full side to every executor —
    * impossible at 10⁹ rows — whereas this √g×√g grid join
    * (1-bucket-theta, Okcan & Riedewald SIGMOD'11) hash-assigns each
    * side a block in [0,√g), replicates each side √g times (left
    * across its row's cells, right down its column's cells), and meets
    * every pair exactly once in one grid cell — an equi-join on the
    * cell key. Work stays O(n²) dot products (it must — the result is
    * exact), shuffle volume is 2n·√g (vs n·g for one-sided
    * replication), each cell holds ~n/√g rows per side, the layout is
    * uniform by construction (hash blocks — no skew), and `gridCells`
    * scales with the cluster, not the data. Same result set as
    * [[cosinePairs]]: verified against the identical brute-force
    * oracle.
    */
  def cosinePairsGrid(embeddings: DataFrame, t: Double, gridCells: Int = 36): DataFrame = {
    val g = math.max(1, math.round(math.sqrt(gridCells.toDouble)).toInt)
    val v = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Vec.norm(col("v")))
    val a = v.withColumn("rb", pmod(hash(col("vec_id")), lit(g)))
      .withColumn("cb", explode(array((0 until g).map(lit): _*))).as("a")
    val b = v.withColumn("cb", pmod(hash(col("vec_id")), lit(g)))
      .withColumn("rb", explode(array((0 until g).map(lit): _*))).as("b")
    val cos = Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    a.join(b,
        col("a.rb") === col("b.rb") && col("a.cb") === col("b.cb") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), cos.as("cos"))
      .where(col("cos") >= t)
  }

  /** SRP-bucketed near-dup pairs: candidates = pairs whose SRP buckets
    * differ in at most `probeHamming` of the [[Planes]] bits, then exact
    * cosine ≥ t inside the candidate set. The bucket constraint is part
    * of the operator's SEMANTICS (the oracle mirrors it bit-exactly,
    * the same honesty contract as the n12/n15 query-ANN paths) — this is
    * the right tool for the high-similarity regime (cos ≳ 0.9, where a
    * separating plane is improbable), NOT for mid thresholds (measured:
    * at cos ≈ 0.45–0.6 fixture pairs span all Hamming distances, which
    * is why the exact path [[cosinePairsGrid]] exists).
    *
    * Plan shape: the left side explodes its Hamming-ball probe keys
    * (1 + Planes keys for radius 1), the right side keeps its own
    * bucket, and the join is a hash EQUI-join on the key — a pair within
    * the radius matches on exactly one probe key, so no post-join dedup
    * is needed. At 100 TB the bucket is a partition column: Σ|bucket|²
    * bounded work, no broadcast of the fact table, no NLJ.
    */
  def cosinePairsBucketed(embeddings: DataFrame, t: Double,
                          probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= Planes)
    val v = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Vec.norm(col("v")))
      .withColumn("bkt", srpBucket(col("v")))
    // all XOR masks with popcount <= probeHamming (constant, tiny: 2^Planes)
    val masks = (0 until (1 << Planes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val b = v.as("b")
    val a = v.withColumn("probe",
      explode(array(masks.map(m => col("bkt").bitwiseXOR(lit(m))): _*))).as("a")
    val cos = Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    a.join(b, col("a.probe") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), cos.as("cos"))
      .where(col("cos") >= t)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    * cluster the embedding space globally (cheap, linear), then mark
    * near-duplicates ONLY within a cluster — the cluster id is the
    * blocking key that replaces the all-pairs cosine with a hash
    * EQUI-join. At 100 TB the cluster count scales with the corpus
    * (the paper uses k ≈ √n), so per-cluster pair work stays bounded
    * and no fact-table broadcast or NLJ ever appears.
    *
    * Determinism: cosine runs over [[Clustering]]'s floor-quantized
    * integer-grid vectors (`qe`/`qn`) with the same left-fold order as
    * the oracle SQL, so every double op is bit-identical cross-engine.
    * A vector is `dropped` iff a SMALLER vec_id in the same cluster has
    * cosine ≥ t with it (keep-lowest-id, the same convention as the
    * n16 dedup-apply path).
    *
    * @param embeddings  (vec_id, embedding) — the rows to dedup (may be
    *                    a sampled subset)
    * @param assignments (vec_id, cluster) — e.g. [[Clustering.kmeans]]
    *                    over the FULL table
    * @return (vec_id, cluster, dropped 0/1) one row per input vector
    */
  def semanticDedup(embeddings: DataFrame, assignments: DataFrame,
                    t: Double): DataFrame = {
    val v = Clustering.prepare(embeddings).join(assignments, "vec_id")
    val a = v.as("a")
    val b = v.as("b")
    val cos = Vec.dot(col("a.qe"), col("b.qe")) / (col("a.qn") * col("b.qn"))
    val drops = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .where(cos >= t)
      .select(col("b.vec_id").as("vec_id")).distinct()
    v.join(drops.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dropped"), lit(0)).as("dropped"))
  }
}
