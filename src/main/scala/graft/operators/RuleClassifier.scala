package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Rules

/** The reference engine's centerpiece: every event title is tested against
  * every classification-rule row; a title matching N rules emits N output
  * rows (flatMap semantics — /root/reference/kafka_stream/kafka_s.py:240-251).
  *
  * Spark-first shape: a **broadcast nested-loop cross join** with the
  * OR-of-AND contains predicate (SURVEY §2 O12/O13). The rules dimension is
  * KB–MB scale (it fits in a pandas frame in the reference), so at 100 TB
  * the only sane plan is: parse rules ONCE on the dim side, broadcast the
  * parsed arrays to every executor, and stream the fact side through the
  * codegen'd predicate — zero shuffle of the big side.
  */
object RuleClassifier {

  /** Rules-dimension schema — 19 columns mirroring
    * `sy_yq_raw.sy_yq_lvl_rules_code` (kafka_s.py:292,296). */
  final case class Rule(
      id: Long,
      firstLevelCode: String, firstLevelName: String,
      secondLevelCode: String, secondLevelName: String,
      threeLevelCode: String, threeLevelName: String,
      fourLevelCode: String, fourLevelName: String,
      cfEventCode: String, eventCode: String, eventName: String,
      inRules: String, filterRules: String,
      emoScore: Int, impScore: Int,
      isChange: Int, isValid: Int, dataStatus: Int)

  /** Built-in fixture rules over the `documents` fixture vocabulary.
    * Deliberately exercises the semantic quirks: R4's filterRules contains
    * a literal `&` (NOT split — quirk Q2); R5's inRules carries interior
    * whitespace that survives the `&`-split (kafka_s.py:243-244). */
  val fixtureRules: Seq[Rule] = Seq(
    Rule(1L, "L1A", "一级A", "L2A", "二级A", "L3A", "三级A", "L4A", "四级A",
      "CF01", "E01", "流处理事件", "join&filter、stream", "slow", 1, 4, 0, 1, 1),
    Rule(2L, "L1A", "一级A", "L2B", "二级B", "L3B", "三级B", "L4B", "四级B",
      "CF02", "E02", "窗口排序事件", "window&sort", "", 0, 3, 0, 1, 1),
    Rule(3L, "L1B", "一级B", "L2C", "二级C", "L3C", "三级C", "", "",
      "CF03", "E03", "哈希扫描事件", "hash&scan&merge", "slow、error", -1, 5, 0, 1, 1),
    Rule(4L, "L1B", "一级B", "L2D", "二级D", "L3D", "三级D", "L4D", "四级D",
      "CF04", "E04", "引擎事件", "spark", "batch&query", 1, 2, 0, 1, 1),
    Rule(5L, "L1C", "一级C", "L2E", "二级E", "L3E", "三级E", "L4E", "四级E",
      "CF05", "E05", "键值事件", " group & data 、key&value", "customer", 0, 1, 0, 1, 1))

  /** Deterministically generated rule table at a realistic cardinality
    * (the reference's production table holds hundreds of rows; the
    * 5-row fixture exercises quirks, this exercises SCALE — the
    * broadcast cross-join cost is O(|facts| × Σ rule terms), all
    * map-side). Vocabulary = the documents fixture's frequent words so
    * match rates are realistic; shapes rotate through OR-of-AND,
    * 3-conjunct, 2-disjunct and singleton forms, every 5th rule with a
    * veto. */
  def generatedRules(n: Int): Seq[Rule] = {
    val vocab = Vector("join", "hash", "row", "batch", "scan", "column",
      "customer", "filter", "small", "slow", "merge", "order", "vector",
      "line", "table", "data", "agg", "value", "key", "stream", "window",
      "spark", "part", "group", "big", "sort", "query", "fast", "dup")
    (1 to n).map { i =>
      val a = vocab(i % vocab.size)
      val b = vocab((i * 7 + 3) % vocab.size)
      val c = vocab((i * 13 + 5) % vocab.size)
      val inR = (i % 4) match {
        case 0 => s"$a&$b、$c"
        case 1 => s"$a&$b&$c"
        case 2 => s"$a、$b"
        case _ => s"$a&$b"
      }
      val filt = if (i % 5 == 0) vocab((i * 11 + 2) % vocab.size) else ""
      Rule(i.toLong, s"L1-${i % 7}", s"一级${i % 7}", s"L2-${i % 11}",
        s"二级${i % 11}", s"L3-$i", s"三级$i", s"L4-$i", s"四级$i",
        f"CF$i%03d", f"E$i%03d", s"事件$i", inR, filt,
        (i % 3) - 1, i % 5 + 1, 0, 1, 1)
    }
  }

  /** Rules dim as a DataFrame with parsed rule arrays precomputed
    * (dim-side, once — not per fact row; SURVEY §2 O11). */
  def rulesDim(spark: SparkSession, rules: Seq[Rule] = fixtureRules): DataFrame = {
    import spark.implicits._
    rules.toDF()
      .withColumn("inArr", Rules.parseInRules(col("inRules")))
      .withColumn("filtArr", Rules.parseFilterRules(col("filterRules")))
  }

  /** facts × rules classification. `title` is the fact-side match column.
    * Emits one row per (fact, matching rule); fact columns first. */
  def classify(facts: DataFrame, rules: DataFrame, title: Column): DataFrame =
    facts.crossJoin(broadcast(rules))
      .where(Rules.ruleMatches(title, col("inArr"), col("filtArr")))
      .drop("inArr", "filtArr")
}
