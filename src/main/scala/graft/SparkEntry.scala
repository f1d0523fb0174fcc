package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Ids, Rules}
import graft.operators.RuleClassifier
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (reference
  * parity, `p*`), a Catalyst-surface analytic (`a*`), an LLM-pipeline
  * extension (`n*`), or a Structured-Streaming query (`s*`). Every entry
  * has a DuckDB-oracle twin in [[oracleSql]] unless marked rows-only.
  *
  * Determinism rules used throughout (Spark vs DuckDB hash compare):
  *  - float aggregations go through `CAST(expr AS DECIMAL(28,6))` so the
  *    sum is exact and identical in both engines (no float summation-order
  *    drift); raw double columns pass through untouched (bit-identical).
  *  - nanosecond timestamps (events.ts) are emitted as second-formatted
  *    strings (Spark truncates parquet ns → µs; DuckDB keeps ns).
  *  - result sets are fully keyed (no arbitrary-row picks, ties broken).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q("p05_rule_match")(spark, "/root/testdata/sf0.001")

  private def q(name: String): (SparkSession, String) => DataFrame =
    registry(name)._1

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, (f, _)) => k -> f }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, Some(sql))) => k -> sql }

  private type Q = (SparkSession, String) => DataFrame

  /** name -> (spark impl, optional DuckDB oracle). */
  private lazy val registry: Map[String, (Q, Option[String])] = Map(

    // ---------------------------------------------------------------- a*
    // Catalyst analytic surface over the star schema.

    "a01_tpch_q1" -> (((s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(28,6)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).cast("decimal(28,6)")).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        sum(CAST(l_quantity AS DECIMAL(28,6))) AS sum_qty,
        sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sum_base_price,
        sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS sum_disc_price,
        sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,6))) AS sum_charge,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))),

    "a02_join_agg" -> (((s: SparkSession, d: String) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }, Some("""
      SELECT c_mktsegment,
        sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS revenue,
        count(*) AS n_lines
      FROM customer, orders, lineitem
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      GROUP BY c_mktsegment"""))),

    // ---------------------------------------------------------------- p*
    // Reference-parity operators (SURVEY §2, kafka CDC pipeline).

    // O3: CDC insert filter — keep non-update, well-formed events
    // (kafka_s.py:170-174: drop docs with `$set`, i.e. partial updates).
    "p01_cdc_filter" -> (((s: SparkSession, d: String) => {
      Tables.events(s, d)
        .filter(!contains(col("props"), lit("$set")) && col("event_type") =!= "error")
        .select(col("event_id"), col("event_type"), col("user_id"), col("props"))
    }, Some("""
      SELECT event_id, event_type, user_id, props
      FROM events
      WHERE NOT contains(props, '$set') AND event_type <> 'error'"""))),

    // O4: projection + timestamp formatting (kafka_s.py:177-187, strftime :181).
    "p02_project_format" -> (((s: SparkSession, d: String) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("pub_time"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_str"))
    }, Some("""
      SELECT event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS pub_time,
        regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str
      FROM events"""))),

    // O5/O6: broadcast lookup join, null on miss (kafka_s.py:120-148;
    // left-join semantics, NOT the reference's stale-state quirk Q1).
    "p03_lookup_join" -> (((s: SparkSession, d: String) => {
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      c.join(broadcast(sup), c("c_nationkey") === sup("s_nationkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("s_name"))
    }, Some("""
      SELECT c_custkey, c_name, s_name
      FROM customer LEFT JOIN supplier ON c_nationkey = s_nationkey"""))),

    // O7/O8: dim join + IN-filter + pivot rows→columns via first/max-per-key
    // (kafka_s.py:105-118,298-310; code value = concat(key,'##',code) :304).
    "p04_pivot" -> (((s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F", "P"))
        .groupBy(col("o_custkey"))
        .agg(
          max(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("open_max"),
          max(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("fin_max"),
          max(when(col("o_orderstatus") === "P", concat(col("o_orderkey").cast("string"),
            lit("##"), col("o_orderstatus")))).as("pend_code"),
          count(lit(1)).as("n_orders"))
    }, Some("""
      SELECT o_custkey,
        max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS open_max,
        max(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS fin_max,
        max(CASE WHEN o_orderstatus = 'P' THEN CAST(o_orderkey AS VARCHAR) || '##' || o_orderstatus END) AS pend_code,
        count(*) AS n_orders
      FROM orders
      WHERE o_orderstatus IN ('O','F','P')
      GROUP BY o_custkey"""))),

    // O11/O12/O13: the centerpiece — rule parse + broadcast nested-loop
    // cross join + OR-of-AND contains predicate with veto, plus the
    // O16/O17 label maps. Oracle = hand-expanded booleans per fixture rule.
    "p05_rule_match" -> (((s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val rules = RuleClassifier.rulesDim(s)
      RuleClassifier.classify(docs, rules, col("text"))
        .select(
          col("doc_id"), col("id").as("rule_id"),
          col("eventCode"), col("eventName"),
          col("emoScore"), col("impScore"),
          Rules.emoLabel(col("emoScore")).as("emoLabel"),
          Rules.impLabel(col("impScore")).as("impLabel"))
    }, Some {
      // predicates mirror RuleClassifier.fixtureRules through the parse
      // semantics of kafka_s.py:243-245 (strip disjuncts, keep `&`-part
      // whitespace, never split filterRules on '&').
      val rules = Seq(
        ("1", "E01", "流处理事件", 1, 4, "正向", "重要",
          "((contains(text,'join') AND contains(text,'filter')) OR contains(text,'stream')) AND NOT contains(text,'slow')"),
        ("2", "E02", "窗口排序事件", 0, 3, "中性", "相对不重要",
          "contains(text,'window') AND contains(text,'sort')"),
        ("3", "E03", "哈希扫描事件", -1, 5, "负向", "非常重要",
          "contains(text,'hash') AND contains(text,'scan') AND contains(text,'merge') AND NOT (contains(text,'slow') OR contains(text,'error'))"),
        ("4", "E04", "引擎事件", 1, 2, "正向", "相对不重要",
          "contains(text,'spark') AND NOT contains(text,'batch&query')"),
        ("5", "E05", "键值事件", 0, 1, "中性", "相对不重要",
          "((contains(text,'group ') AND contains(text,' data')) OR (contains(text,'key') AND contains(text,'value'))) AND NOT contains(text,'customer')"))
      rules.map { case (id, ec, en, emo, imp, emoL, impL, pred) =>
        s"""SELECT doc_id, CAST($id AS BIGINT) AS rule_id, '$ec' AS eventCode,
           '$en' AS eventName, CAST($emo AS INT) AS emoScore, CAST($imp AS INT) AS impScore,
           '$emoL' AS emoLabel, '$impL' AS impLabel FROM documents WHERE $pred"""
      }.mkString("\n UNION ALL \n")
    })),

    // O14/O15: deterministic id — md5-based uuid-v3 bit layout (namespace-
    // free variant of kafka_s.py:460-468; RFC namespace form is golden-
    // tested in Uuid3Spec against CPython uuid.uuid3).
    "p07_deterministic_id" -> (((s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          Ids.deterministicId(concat(col("text"), lit("|"), col("source"))).as("det_id"))
    }, Some("""
      SELECT doc_id,
        substr(h,1,12) || '3' || substr(h,14,3)
          || substr('89ab89ab89ab89ab', instr('0123456789abcdef', substr(h,17,1)), 1)
          || substr(h,18,15) AS det_id
      FROM (SELECT doc_id, md5(text || '|' || source) AS h FROM documents)"""))),

    // O10: dim change-detection probe — count(*) WHERE ts >= last-check
    // (kafka_s.py:198-219).
    "p10_refresh_probe" -> (((s: SparkSession, d: String) => {
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(count(lit(1)).as("n_changed"))
    }, Some("""
      SELECT count(*) AS n_changed FROM events
      WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'"""))),

    // O28: top-k with full deterministic ordering.
    "p11_topn" -> (((s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))),

    // O27: running event counter → per-type counts.
    "p12_event_counts" -> (((s: SparkSession, d: String) => {
      Tables.events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }, Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"))))
}
