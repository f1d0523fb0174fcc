package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** MinHash + LSH near-duplicate detection (Broder '97 resemblance
  * sketches; banding per Leskovec/Rajaraman/Ullman MMDS ch.3).
  *
  * Scale shape: signatures are computed in one scan (k seeded hashes per
  * shingle set, map-side only); banding explodes each doc into b rows;
  * candidate generation is an equi-join on (band, key) — the only
  * shuffle, partitioned by band key, no global cross join. Candidates
  * are then verified with exact Jaccard, so precision is 1.0 and recall
  * is the LSH S-curve: P(detect) = 1-(1-j^r)^b.
  *
  * Parameter choice (r=2, b=16, verify threshold 0.8): the verify
  * threshold sits where the S-curve is ≈1, so the LSH output EQUALS the
  * exact-Jaccard answer rather than approximating it — miss probability
  * is (1-j²)^16 ≤ 0.36^16 ≈ 8e-8 at j=0.8 and ≈3e-12 at j=0.9. (The
  * r01 configuration verified at t=0.55 where the r=2 S-curve dips to
  * ~0.94 per pair — correct on the fixtures, fragile to fixture change.)
  * Exact detection at lower thresholds is Dedup.jaccardPairs's job.
  *
  * Hash = xxhash64(seed, shingle) with the numeric min as the sketch
  * component — deterministic, an order of magnitude cheaper per byte
  * than md5, and free to choose because the oracle never recomputes the
  * sketch: it checks the exact-Jaccard answer the sketch must converge
  * to.
  */
object MinHashLsh {

  /** k-component MinHash signature of a shingle-set column (native
    * XXH64 kernel — one pass over the set for all k seeds). */
  def signature(shingleSet: Column, k: Int): Column =
    graft.functions.Shingles.minhashSig(shingleSet, k)

  /** Banding index of a (did, sset) frame: one NARROW (did, band, key)
    * row per band — shared by the batch join (here) and the streaming
    * bucket state (s19, StreamQueries.streamLshPairs), so the two
    * paths cannot drift. Carrying the shingle arrays through the b-way
    * explode would copy every set b times; candidates re-join the sets
    * later instead. */
  def banded(sets: DataFrame, k: Int, r: Int): DataFrame = {
    require(k % r == 0, "k must be a multiple of band width r")
    sets
      .withColumn("sig", signature(col("sset"), k))
      .select(col("did"),
        explode(bandKeysFromSig(col("sig"), k, r)).as("bk"))
      .select(col("did"), col("bk.band"), col("bk.key"))
  }

  /** The (band, key) array of a materialized signature column — ONE
    * shared kernel for every banding consumer (batch join, s19 bucket
    * state, s37's per-row stream banding), so the paths cannot drift. */
  private[graft] def bandKeysFromSig(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, "k must be a multiple of band width r")
    val b = k / r
    array((0 until b).map(bi => struct(
      lit(bi).as("band"),
      concat_ws("|", transform(slice(sig, bi * r + 1, r),
        _.cast("string"))).as("key"))): _*)
  }

  /** Exact Jaccard of two shingle-set columns — the one formula every
    * verifier (batch, s19, s37) applies. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs
    * against the sets frame — precision 1.0 regardless of how the
    * candidates were generated (batch band join or streaming bucket
    * state). */
  def verify(candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    val jac = jaccard(col("a_set"), col("b_set"))
    candidates
      .join(sets.select(col("did"), col("sset").as("a_set")), col("a_id") === col("did"))
      .drop("did")
      .join(sets.select(col("did"), col("sset").as("b_set")), col("b_id") === col("did"))
      .drop("did")
      .select(col("a_id"), col("b_id"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Near-dup pairs: LSH candidates (any equal band) verified with exact
    * Jaccard >= threshold. Output: a_id, b_id, jaccard. */
  def nearDupPairs(docs: DataFrame, id: String, text: String,
      k: Int = 32, r: Int = 2, threshold: Double = 0.8): DataFrame = {
    // persisted: referenced by the banding pass AND both candidate
    // back-joins — without it the parquet scan + shingle kernel run 3×
    // per query (only identical exchanges get plan-level reuse). Tiny
    // at harness scale (the cache lives until session end); a 100 TB
    // deployment would persist to disk with an explicit unpersist, or
    // accept recompute.
    val sets = docs
      .select(col(id).as("did"), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0) // empty sets would band-collide globally
      .persist()

    val bd = banded(sets, k, r)
    val a = bd.as("a")
    val bb = bd.as("b")
    val candidates = a.join(bb,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("a_id"), col("b.did").as("b_id"))
      .dropDuplicates("a_id", "b_id")

    verify(candidates, sets, threshold)
  }

  /** Cross-snapshot NEAR-dup delta — [[nearDupPairs]]'s incremental-
    * crawl shape and n84's near-duplicate completion: which docs of
    * the NEW snapshot `b` near-duplicate (Jaccard ≥ threshold) a doc
    * of the PREVIOUS snapshot `a`. The two snapshots band SEPARATELY
    * and the candidate join is a↔b only, so within-snapshot pairs
    * never materialize: running [[nearDupPairs]] on the union would
    * pay the |A|²+|B|² within-snapshot band collisions just to throw
    * them away, and on successive crawls |A| is the accumulated corpus
    * — the dominant term. In production `a`'s banding index is the
    * PRECOMPUTED artifact (exactly the bucket table s19 maintains as
    * streaming state); here it derives inline. Exact-Jaccard
    * verification (precision 1.0) runs against the union of the two
    * sets frames; ids must be distinct across snapshots. Output:
    * (a_id old doc, b_id new doc, jaccard). */
  def snapshotNearDupPairs(a: DataFrame, b: DataFrame, id: String,
      text: String, k: Int = 32, r: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    def setsOf(df: DataFrame) = df
      .select(col(id).as("did"), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0)
    // persisted for the same 3-reference reason as nearDupPairs, and
    // with the same lifecycle caveat: the entries live until session
    // end (the bench clears caches between queries; a long-lived
    // session composing these operators should unpersist after
    // materializing, or persist to disk — same trade as nearDupPairs)
    val setsA = setsOf(a).persist()
    val setsB = setsOf(b).persist()
    val candidates = banded(setsA, k, r).as("a")
      .join(banded(setsB, k, r).as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.did").as("a_id"), col("b.did").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    verify(candidates, setsA.union(setsB), threshold)
  }

  /** Probe a previous snapshot's (bands, sets) index with arriving
    * docs — the ONE serving kernel behind s37 (index derived inline),
    * s38 (index read from the [[SnapshotStore]] parquet layout) and
    * any batch probe: each arriving doc bands per-row with the shared
    * [[bandKeysFromSig]] kernel, candidates come from a stateless
    * equi-join on (band, key), the old set is fetched by a second
    * equi-join, and exact Jaccard verifies (precision 1.0). The
    * closing groupBy(a_id, b_id) max-agg dedups multi-band hits of
    * the same pair — a plain aggregate batch-side, the complete-mode
    * state when `arriving` is a stream. Row-equal to
    * [[snapshotNearDupPairs]] on the same corpora: the bands are the
    * same kernel, so the candidate set matches, and both verify
    * exactly. */
  def probeIndex(bandsA: DataFrame, setsA: DataFrame, arriving: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, threshold: Double = 0.8): DataFrame = {
    val banded = arriving
      .select(col(id).as("b_id"), Text.shingleSet(col(text)).as("b_set"))
      .where(size(col("b_set")) > 0)
      .withColumn("sig", signature(col("b_set"), k))
      .select(col("b_id"), col("b_set"),
        explode(bandKeysFromSig(col("sig"), k, r)).as("bk"))
      .select(col("b_id"), col("b_set"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded
      .join(bandsA, Seq("band", "key"))
      .select(col("did").as("a_id"), col("b_id"), col("b_set"))
      .join(setsA.select(col("did").as("a_id"), col("sset").as("a_set")),
        Seq("a_id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_set"), col("b_set")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  // -- the SPLIT probe shape [[SnapshotStore.serveNearDup]]'s sketch
  //    pruning composes (guide §2.3: move keys, not payloads): the
  //    arriving shingle sets materialize ONCE (never replicated through
  //    the per-band explode — probeIndex's inline `banded` carries
  //    b_set b times, which is fine fused in one stage but ruinous to
  //    materialize), the lean (b_id, band, key) frame feeds both the
  //    sketch probe and the band join, and b_set re-attaches by the
  //    unique b_id — so the result is row-identical to probeIndex's:
  //    same candidate multiset (same band-key equi-join), same exact
  //    verification values (b_set joined by its unique key). --

  /** The arriving docs' shingle sets: (b_id, b_set). */
  private[operators] def arrivingSets(arriving: DataFrame, id: String,
      text: String): DataFrame =
    arriving
      .select(col(id).as("b_id"), Text.shingleSet(col(text)).as("b_set"))
      .where(size(col("b_set")) > 0)

  /** The per-row band keys of an arriving sets frame, WITHOUT the
    * shingle arrays: (b_id, band, key). */
  private[operators] def bandKeysOf(setsB: DataFrame, k: Int,
      r: Int): DataFrame =
    setsB
      .withColumn("sig", signature(col("b_set"), k))
      .select(col("b_id"), explode(bandKeysFromSig(col("sig"), k, r)).as("bk"))
      .select(col("b_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** [[probeIndex]]'s join+verify over the split arriving frames —
    * row-identical output (see the block comment above). */
  private[operators] def probeSplit(bandsA: DataFrame, setsA: DataFrame,
      bandKeys: DataFrame, setsB: DataFrame, threshold: Double): DataFrame =
    bandKeys
      .join(bandsA, Seq("band", "key"))
      .select(col("did").as("a_id"), col("b_id"))
      .join(setsB, Seq("b_id"))
      .join(setsA.select(col("did").as("a_id"), col("sset").as("a_set")),
        Seq("a_id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_set"), col("b_set")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(max(col("jaccard")).as("jaccard"))
}
