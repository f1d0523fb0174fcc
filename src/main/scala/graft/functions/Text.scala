package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines (north-star
  * extensions, /root/repo/BASELINE.json): tokenization, language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  *
  * All pure Catalyst expressions (codegen'd, no UDFs). Double-valued
  * scores use only single divisions / fixed-order folds so the DuckDB
  * oracle computes bit-identical values.
  */
object Text {

  /** Whitespace tokens, empties dropped (documents.text has a trailing
    * space — Python str.split() semantics, not split(' ')).
    * `array_remove` rather than a `filter` HOF: HOFs are CodegenFallback
    * (interpreted per element); split+array_remove stay inside
    * whole-stage codegen. */
  def tokens(c: Column): Column =
    array_remove(split(c, " "), "")

  def tokenCountWs(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — the usual GPT-2-style pre-split approximation. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** Stopword hits (shared list with the oracle SQL). */
  val Stopwords = Seq("the", "a", "of", "and", "to")
  def stopwordHits(c: Column): Column =
    size(filter(tokens(c), t => t.isin(Stopwords.map(_.asInstanceOf[Any]): _*)))

  /** n-gram/stopword language-ID heuristic: English function words vs
    * none. (Fixture text is synthetic English-ish; the `lang` column is
    * a label, not derivable — this is the heuristic the reference-class
    * pipeline would run.) */
  def langId(c: Column): Column =
    when(stopwordHits(c) >= 2, lit("en"))
      .when(tokenCountWs(c) === 0, lit("empty"))
      .otherwise(lit("und"))

  /** Mean whitespace-token length: int sum / int count (one division). */
  def avgTokenLen(c: Column): Column =
    aggregate(transform(tokens(c), length(_)), lit(0),
      (acc, x) => acc + x).cast("double") / tokenCountWs(c)

  /** Stopword ratio: int / int, one division. */
  def stopwordRatio(c: Column): Column =
    stopwordHits(c).cast("double") / tokenCountWs(c)

  /** Composite quality score in [0,1]: length term + (1 - stopword
    * ratio) term + word-length term, fixed evaluation order. */
  def qualityScore(c: Column): Column = {
    val lenTerm = least(tokenCountWs(c), lit(50)).cast("double") / 50.0
    val stopTerm = lit(1.0) - stopwordRatio(c)
    val wordTerm = least(avgTokenLen(c) / 10.0, lit(1.0))
    lenTerm * 0.5 + stopTerm * 0.3 + wordTerm * 0.2
  }

  /** Normalization fingerprint: md5 over the sorted distinct token set —
    * collapses documents that differ only in word order / repetition
    * (rolling-hash-class dedup key). */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** w-word shingles (default 3), joined by single spaces; fewer than w
    * tokens → empty array. HOF reference form — kept as the
    * property-test oracle for the native kernel; use [[shingleSet]]
    * (native, codegen'd) in query plans. */
  def shinglesHof(c: Column, w: Int = 3): Column = {
    val toks = tokens(c)
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set (the unit for Jaccard / MinHash dedup).
    * Native single-pass kernel — the HOF chain was the n02/n03
    * bottleneck (see ShingleSet scaladoc). */
  def shingleSet(c: Column, w: Int = 3): Column = Shingles.shingleSet(c, w)
}
