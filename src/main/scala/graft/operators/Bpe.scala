package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BPE merge-rule TRAINING (Sennrich et al. '16) as pure distributed
  * aggregation — no UDFs, no driver-side tokenization, and crucially
  * no per-row sequential loop: the greedy left-to-right non-overlap
  * rule of a BPE merge application is expressed with the
  * gaps-and-islands window idiom.
  *
  * Setup is the standard one: train on the (word, freq) vocabulary
  * table, NOT the corpus — the corpus-sized work is exactly one
  * explode+count (the vocab build); every Lloyd-style training
  * iteration after that runs on the vocabulary, whose size is bounded
  * by the language, not the 100 TB corpus. State is the LONG-FORMAT
  * symbol table (word, pos, sym) — window/join-friendly, no list
  * lambdas anywhere, so the whole loop stays in codegen'd operators
  * and the DuckDB oracle can mirror it CTE-for-CTE.
  *
  * One iteration:
  *  1. adjacent pairs: lead(sym) over (word, pos) — one window;
  *  2. pair counts: join the vocab freq, sum per (a, b) — counts
  *     weight by word frequency exactly as Sennrich's counter does;
  *  3. best pair: max by (n, then lexicographic a, b) — deterministic
  *     1-row TakeOrdered, broadcast back;
  *  4. greedy application: matching positions that are CONSECUTIVE
  *     (only possible when a == b, e.g. "aaa" under (a,a)) must merge
  *     at alternate offsets only — islands of consecutive matches via
  *     pos - row_number(), then keep (pos - island_start) % 2 == 0;
  *     consumed = applied.pos + 1; survivors renumber by row_number.
  *
  * Returns the learned merge table (it, a, b, n) — the artifact a
  * tokenizer ships. */
object Bpe {

  /** Corpus → (word, freq) vocabulary: the only corpus-sized pass. */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Vocabulary → initial long-format symbol table (word, pos, sym),
    * one character per row, pos 1-based. */
  def initSymbols(vocab: DataFrame): DataFrame =
    vocab.select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("pos"), expr("substr(word, pos, 1)").as("sym"))

  /** One training iteration; returns (best-merge 1-row frame with
    * columns a/b/n, next symbol table). */
  def step(syms: DataFrame, freq: DataFrame): (DataFrame, DataFrame) = {
    val byPos = Window.partitionBy(col("word")).orderBy(col("pos"))
    val pairs = syms
      .withColumn("nsym", lead(col("sym"), 1).over(byPos))
      .where(col("nsym").isNotNull)
      .select(col("word"), col("pos"), col("sym").as("a"), col("nsym").as("b"))
    val best = pairs.join(freq, "word")
      .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("a").asc, col("b").asc).limit(1)
    val matched = pairs.join(broadcast(best.select(col("a"), col("b"))), Seq("a", "b"))
      .select(col("word"), col("pos"))
    val applied = matched
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .withColumn("start",
        min(col("pos")).over(Window.partitionBy(col("word"), col("grp"))))
      .where(((col("pos") - col("start")) % 2) === 0)
      .select(col("word"), col("pos"))
    val consumed = applied.select(col("word"), (col("pos") + 1).as("pos"))
    val next = syms
      .join(consumed, Seq("word", "pos"), "left_anti")
      .join(applied.withColumn("app", lit(1)), Seq("word", "pos"), "left")
      .crossJoin(broadcast(best.select(concat(col("a"), col("b")).as("ab"))))
      .select(col("word"),
        row_number().over(byPos).as("pos"),
        when(col("app") === 1, col("ab")).otherwise(col("sym")).as("sym"))
    (best, next)
  }

  /** Learn `iters` merges from a documents frame; returns the merge
    * table (it 1-based, a, b, n). */
  def learnMerges(docs: DataFrame, iters: Int): DataFrame = {
    val v = vocab(docs)
    var syms = initSymbols(v)
    val merges = Seq.newBuilder[DataFrame]
    for (i <- 1 to iters) {
      val (best, next) = step(syms, v)
      merges += best.select(lit(i).as("it"), col("a"), col("b"), col("n"))
      syms = next
    }
    merges.result().reduce(_ unionAll _)
  }

  /** ENCODE with the learned merges: after `iters` training steps the
    * symbol table IS the encoded vocabulary — (word, n_sym) is each
    * word's BPE token count. Encoding a corpus is then one exploded
    * equi-join against this vocabulary-sized table (broadcast while it
    * fits): per doc, the BPE token count, the character count, and the
    * exact compression in ppm. The corpus is never re-tokenized
    * per-merge — the vocab table absorbs all `iters` rewrites. */
  def encodeStats(docs: DataFrame, iters: Int): DataFrame = {
    val v = vocab(docs)
    var syms = initSymbols(v)
    for (_ <- 1 to iters) syms = step(syms, v)._2
    val nSym = syms.groupBy(col("word")).agg(count(lit(1)).as("n_sym"))
    docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .join(nSym, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("n_bpe"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("doc_id"), col("n_bpe"), col("n_chars"),
        expr("n_bpe * 1000000 div n_chars").as("ratio_ppm"))
  }
}
