package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword-rule classification semantics, as pure Catalyst expressions.
  *
  * Reference: `/root/reference/kafka_stream/kafka_s.py:240-285` (also the
  * standalone copy `mysql_yi/mysql_rules.py:26-64`). A rule row carries
  *  - `inRules`:     `、`-separated disjuncts; each disjunct is stripped and
  *                   then `&`-split into a conjunction of substrings
  *                   (kafka_s.py:243-244). The `&`-parts are NOT stripped —
  *                   `" group & data "` → `["group ", " data"]`.
  *  - `filterRules`: `、`-separated veto substrings, stripped, and crucially
  *                   NOT `&`-split (kafka_s.py:245, quirk Q2 in SURVEY §2.16).
  * A title matches iff some conjunction has ALL its words as substrings of
  * the title (kafka_s.py:263-264, quirk Q3: list-equality ⇒ all words), and
  * no veto token is a substring (kafka_s.py:267-273). Empty `inRules` /
  * `filterRules` produce EMPTY lists (the `if inRules_list` guards at
  * kafka_s.py:243,245), i.e. no match / no veto — NOT a match-all.
  *
  * Everything below is built from `split`/`transform`/`exists`/`forall`/
  * `contains` higher-order functions — fully codegen'd, no UDFs, so the
  * rule scan stays inside whole-stage codegen when the rules dimension is
  * broadcast (SURVEY §4).
  */
object Rules {

  /** Python str.strip() equivalent. CPython strips every char where
    * str.isspace() — Unicode whitespace (e.g. U+3000 full-width space,
    * common in Chinese rule text) plus the C0 separators \x1c-\x1f that
    * Unicode White_Space excludes. `(?U)` lifts Java's \s from ASCII to
    * White_Space; the explicit range adds the C0 separators. */
  private[functions] val PyWhitespace = "(?U)[\\s\\x1c-\\x1f]"
  def pyStrip(c: Column): Column =
    regexp_replace(c, s"^$PyWhitespace+|$PyWhitespace+$$", "")

  /** `inRules` string → array<array<string>> (OR of ANDs).
    * Empty/null input → empty array (kafka_s.py:243 guard). */
  def parseInRules(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<array<string>>"))
      .otherwise(transform(split(c, "、"), d => split(pyStrip(d), "&")))

  /** `filterRules` string → array<string> of veto literals (never `&`-split).
    * Empty/null input → empty array (kafka_s.py:245 guard). */
  def parseFilterRules(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(transform(split(c, "、"), pyStrip(_)))

  /** Match predicate over parsed rules (kafka_s.py:252-273). */
  def ruleMatches(title: Column, inArr: Column, filtArr: Column): Column =
    exists(inArr, conj => forall(conj, w => contains(title, w))) &&
      !exists(filtArr, f => contains(title, f))

  /** Convenience: predicate straight from the raw rule strings. */
  def ruleMatchesRaw(title: Column, inRules: Column, filterRules: Column): Column =
    ruleMatches(title, parseInRules(inRules), parseFilterRules(filterRules))

  /** Sentiment label map (kafka_s.py:72,452-459); missing key → null. */
  def emoLabel(emoScore: Column): Column =
    when(emoScore.cast("string") === "1", lit("正向"))
      .when(emoScore.cast("string") === "-1", lit("负向"))
      .when(emoScore.cast("string") === "0", lit("中性"))

  /** Importance label map (kafka_s.py:73,444-451); missing key → null. */
  def impLabel(impScore: Column): Column =
    when(impScore.isin(1, 2, 3), lit("相对不重要"))
      .when(impScore === 4, lit("重要"))
      .when(impScore === 5, lit("非常重要"))

  /** Plain-Scala parse of `inRules` with the reference's exact
    * semantics (kafka_s.py:243-244) — shared by the property-test
    * oracle and the mechanical SQL expansion of generated rules. */
  def parsedInRules(inRules: String): Seq[Seq[String]] =
    if (inRules == null || inRules.isEmpty) Seq.empty
    else inRules.split("、", -1).toSeq.map(d => stripPy(d).split("&", -1).toSeq)

  /** Plain-Scala parse of `filterRules` (kafka_s.py:245, quirk Q2). */
  def parsedFilterRules(filterRules: String): Seq[String] =
    if (filterRules == null || filterRules.isEmpty) Seq.empty
    else filterRules.split("、", -1).toSeq.map(stripPy)

  /** Reference-oracle reimplementation of `list_if` (kafka_s.py:252-285)
    * for property tests: plain Scala, used to cross-check the Catalyst
    * expressions on random inputs. */
  def listIfOracle(inRules: String, filterRules: String, title: String): Boolean = {
    val matched =
      parsedInRules(inRules).exists(conj => conj.forall(w => title.contains(w)))
    matched && !parsedFilterRules(filterRules).exists(f => title.contains(f))
  }

  private def stripPy(s: String): String =
    s.replaceAll(s"^$PyWhitespace+|$PyWhitespace+$$", "")
}
