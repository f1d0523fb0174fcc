package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Text, TextStats}

/** The composed corpus-curation pipeline (n80) — the FineWeb/Gopher-
  * style end-to-end corpus build that chains the individually-verified
  * stages into one declared query, proving the operators compose
  * without column or semantic collisions (every stage below is the
  * exact arithmetic of its standalone query):
  *
  *   stage 1  quality gate      — n66's Gopher rule list (integer-exact
  *                                TextStats kernel, pure per-row);
  *   stage 2  exact dedup       — the n01/n10 hash-groupBy keep-min
  *                                policy over stage-1 survivors, keyed
  *                                on n10's reorder-robust fingerprint
  *                                (md5 of the sorted distinct token
  *                                set): the fixtures' exact-duplicate
  *                                family is reorder/repetition dupes —
  *                                n01's byte hash matches zero pairs
  *                                there, which would make this stage
  *                                vacuously composable; the plan shape
  *                                (hash agg min-id + equi-join back)
  *                                is identical either way;
  *   stage 3  near-dup survivor — n03/n16's MinHash-LSH pairs at t=0.8
  *                                over stage-2 survivors, greedy
  *                                keep-a/drop-b (doc-level fuzzy dedup
  *                                runs BEFORE segment-level, the
  *                                FineWeb order — the reverse would
  *                                let the segment gate consume every
  *                                whole-doc near-dup first and reduce
  *                                this stage to a proven no-op on
  *                                these fixtures);
  *   stage 4  segment gate      — n73's first-occurrence index over
  *                                stage-3 survivors as a doc-level
  *                                boilerplate gate: drop docs
  *                                retaining < 90 % of their 8-token
  *                                segments (10·n_kept ≥ 9·n_segs
  *                                keeps) — the partial-duplication
  *                                tail LSH's 0.8 whole-doc threshold
  *                                cannot see;
  *   stage 5  mixture reweight  — n38's per-language token-budget
  *                                rates over stage-4 survivors,
  *                                deterministic md5-bucket thinning
  *                                (budgets are pipeline parameters,
  *                                sized so the stage is live at the
  *                                declared fixtures).
  *
  * Output: ONE row per stage (stage, n_docs, n_tokens, corpus_xor),
  * where corpus_xor is an order-independent corpus signature — the
  * bit_xor of each surviving doc's 60-bit md5-prefix hash (the n27/n40
  * hash idiom; XOR instead of sum so the digest can never overflow at
  * any corpus size, and doc ids are unique so pair-cancellation cannot
  * occur). The retention counts are the numbers a curation run
  * reports; the signature pins the exact surviving doc SET per stage.
  *
  * Plan, built for the 100 TB case:
  *  - survivorship is a FLAG COLUMN per stage on one flagged frame,
  *    not five materialized intermediate corpora: the final report is
  *    a single map-side-combined aggregate over that frame (6 × 3
  *    conditional aggregates → one exchange row per partition), then a
  *    6-row explode — no per-stage rescan of the corpus at the report;
  *  - each stage's index is the same bounded shape as its standalone
  *    query: the fingerprint firsts are a map-side-combined min
  *    aggregate equi-joined back (never a window over a hot key), the
  *    LSH stage is the banded equi-join (never all pairs), the segment
  *    index is min(struct) + equi-join, and the mixture rates ride a
  *    |langs|-row broadcast;
  *  - later stages filter on earlier flags INSIDE their index builds,
  *    so each index processes only its stage's input (e.g. the LSH
  *    band join runs over stage-2 survivors only) — exactly how a
  *    production pipeline narrows corpus volume stage by stage.
  *
  * Determinism: every gate is integer arithmetic on md5-derived values
  * (no rand(), no floats except LSH's exact-Jaccard verify, itself one
  * int/int division) — the oracle is the stages' own CTE chain.
  */
object Curation {

  /** Stage labels in pipeline order (shared with the oracle). */
  val Stages: Seq[(String, String)] = Seq(
    "0_input" -> "pass0", "1_quality" -> "pass1",
    "2_exact_dedup" -> "pass2", "3_near_dedup" -> "pass3",
    "4_segment_gate" -> "pass4", "5_mixture" -> "pass5")

  /** 60-bit md5-prefix hash of a doc id (the corpus-signature term). */
  private def hash60(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** docs(doc_id, lang, text) → (stage, n_docs, n_tokens, corpus_xor),
    * one row per [[Stages]] entry. `budgetEn`/`budgetOther`: stage-5
    * per-language token budgets. */
  def pipeline(docs: DataFrame, budgetEn: Long, budgetOther: Long): DataFrame = {
    // one TextStats kernel pass feeds the gate AND the token accounting
    // (n66's single-pass contract); tok is the same whitespace count
    // the mixture stage budgets against
    val base = docs
      .select(col("doc_id"), col("lang"), col("text"),
        TextStats.textStats(col("text")).as("st"))
      .select(col("doc_id"), col("lang"), col("text"),
        col("st.n_tokens").cast("long").as("tok"),
        (col("st.n_tokens").between(20, 1000) &&
          col("st.len_sum") >= col("st.n_tokens") * 3 &&
          col("st.len_sum") <= col("st.n_tokens") * 10 &&
          col("st.max_len") <= 20 && col("st.stop_hits") >= 2).as("pass1"))

    // stage 2: n10's keep-min-id per reorder-robust fingerprint,
    // indexed over stage-1 survivors only; non-survivors join to a
    // null keep_id, and pass1 guards the conjunction so the flag stays
    // two-valued
    val firsts2 = base.where(col("pass1"))
      .groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"))
    val b2 = base.withColumn("fp", Text.fingerprint(col("text")))
      .join(firsts2, Seq("fp"), "left")
      .withColumn("pass2", col("pass1") && col("doc_id") === col("keep_id"))
      .drop("fp", "keep_id")

    // stage 3: n03's banded LSH pairs over stage-2 survivors (S-curve
    // ≈ 1 at t=0.8, so the pair set equals brute force), n16's greedy
    // drop-b policy
    val losers = MinHashLsh.nearDupPairs(
        b2.where(col("pass2")).select(col("doc_id"), col("text")),
        "doc_id", "text", threshold = 0.8)
      .select(col("b_id").as("loser_id")).distinct()
    val b3 = b2.join(losers, b2("doc_id") === col("loser_id"), "left")
      .withColumn("pass3", col("pass2") && col("loser_id").isNull)
      .drop("loser_id")

    // stage 4: n73's first-occurrence segment index over stage-3
    // survivors; docs retaining < 90 % of their segments drop
    // (coalesce: non-survivors have no retention row)
    val segs = Dedup.segmentsOf(b3.where(col("pass3")), k = 8)
    val ret = Dedup.applySegmentDedup(segs, Dedup.firstOccurrences(segs))
      .select(col("doc_id"), col("n_segs"), col("n_kept"))
    val b4 = b3.join(ret, Seq("doc_id"), "left")
      .withColumn("pass4", coalesce(
        col("pass3") && col("n_kept") * 10 >= col("n_segs") * 9, lit(false)))
      .drop("n_segs", "n_kept")

    // stage 5: n38's per-language rates over stage-4 survivors (a
    // |langs|-row broadcast), md5-bucket thinning — deterministic,
    // reproducible, never rand(). A lang with no stage-4 survivor has
    // no rate row; pass4 is false for all its docs, and the null-
    // guarding coalesce keeps the flag two-valued.
    val rates = b4.where(col("pass4")).groupBy(col("lang"))
      .agg(sum(col("tok")).as("actual"))
      .select(col("lang"), least(lit(1000000L), expr(
        s"(CASE WHEN lang = 'en' THEN ${budgetEn}L ELSE ${budgetOther}L END)" +
          " * 1000000L div actual")).as("rate_ppm"))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L)
    val flagged = b4.join(broadcast(rates), Seq("lang"), "left")
      .withColumn("pass5",
        coalesce(col("pass4") && bucket < col("rate_ppm"), lit(false)))
      .select(col("doc_id") +: col("tok") +: hash60(col("doc_id")).as("hv") +:
        lit(true).as("pass0") +: Stages.tail.map { case (_, f) => col(f) }: _*)

    // the report: ONE aggregate over the flagged frame (3 conditional
    // aggregates per stage, map-side combined), explode to 6 rows
    val aggs = Stages.flatMap { case (nm, f) => Seq(
      sum(when(col(f), 1L).otherwise(0L)).as(s"nd_$nm"),
      coalesce(sum(when(col(f), col("tok"))), lit(0L)).as(s"nt_$nm"),
      coalesce(expr(s"bit_xor(CASE WHEN $f THEN hv END)"), lit(0L))
        .as(s"bx_$nm"))
    }
    flagged.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(Stages.map { case (nm, _) =>
        struct(lit(nm).as("stage"), col(s"nd_$nm").as("n_docs"),
          col(s"nt_$nm").as("n_tokens"), col(s"bx_$nm").as("corpus_xor"))
      }: _*)).as("s"))
      .select(col("s.stage"), col("s.n_docs"), col("s.n_tokens"),
        col("s.corpus_xor"))
  }
}
