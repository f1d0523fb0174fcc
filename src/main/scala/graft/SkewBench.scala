package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Skew demonstration for the n-gram similarity join (VERDICT r7 #3:
  * "the skew story has never been demonstrated on a skewed fixture").
  *
  * Builds the canonical pathological corpus shape at 100 TB — a
  * boilerplate passage (license header, site chrome, template preamble)
  * appended to EVERY document, so each of its w-gram shingles has
  * document frequency n and contributes n·(n−1)/2 rows to the inverted-
  * index equi-join — and measures, on the real sf fixture:
  *
  *   1. the join fan-out (pre-aggregation joined rows) and wall time of
  *      the exact join on the CLEAN corpus (the benign-df baseline);
  *   2. the same on the SKEWED corpus — the quadratic blow-up;
  *   3. the skewed corpus with the `maxDf` hot-shingle cap — fan-out
  *      back to the baseline's order, at the cost of the documented
  *      lower-bound bias (SkewSpec pins the bias direction);
  *   4. the skewed corpus through the PPJoin prefix variant — EXACT
  *      result (no bias), fan-out between the two.
  *
  * Emits one JSON line; the measured numbers are committed in SKEW.md.
  * Usage: sbt 'runMain graft.SkewBench [sfDir] [nBoilerTokens] [maxDf]'
  */
object SkewBench {

  /** The skewed twin of the corpus: a fixed boilerplate suffix on every
    * doc. Deterministic (no rand) so reruns measure the same corpus. */
  def skewed(docs: DataFrame, nBoilerTokens: Int): DataFrame = {
    val boiler = (0 until nBoilerTokens).map(i => s"boilerplate$i").mkString(" ")
    docs.withColumn("text", concat(col("text"), lit(" " + boiler)))
  }

  import BenchUtil.timed

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val nBoiler = args.lift(1).map(_.toInt).getOrElse(24)
    val maxDf = args.lift(2).map(_.toInt).getOrElse(50)
    val spark: SparkSession = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val clean = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val skew = skewed(clean, nBoiler).localCheckpoint(true)
    val nDocs = clean.count()

    def run(name: String, docs: DataFrame, cap: Option[Int]): (Long, Long, Double) = {
      // ONE execution per config: the fan-out (pre-aggregation joined
      // rows) is read from the candidate join's numOutputRows metric of
      // the run being timed, instead of paying for the quadratic join
      // twice (jaccardJoinFanout remains the spec-facing exact count).
      // The candidate join is the only INNER join in the plan — the
      // maxDf cap adds a broadcast LEFT ANTI join whose posting-list
      // output can exceed a small capped candidate count, so select on
      // join type rather than max over all joins.
      // collect(), not count(): count() builds its OWN QueryExecution,
      // leaving df.queryExecution's metrics untouched — the inspected
      // plan must be the executed one. Pair output is tiny (O(dups)).
      val df = Dedup.jaccardPairs(docs, "doc_id", "text", maxDf = cap)
      val (pairs, sec) = timed(df.collect().length.toLong)
      val fanout = BenchUtil.metricMaxWhere(
        df.queryExecution.executedPlan, "numOutputRows")(n =>
        n.nodeName.contains("Join") && n.simpleString(Int.MaxValue).contains("Inner"))
      System.err.println(f"[skew] $name%-16s fanout=$fanout%12d pairs=$pairs%6d time=$sec%7.2fs")
      (fanout, pairs, sec)
    }
    def runPrefix(docs: DataFrame): (Long, Double) = {
      val (pairs, sec) = timed {
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text").count()
      }
      System.err.println(f"[skew] prefix_skewed   pairs=$pairs%6d time=$sec%7.2fs")
      (pairs, sec)
    }

    // ---- containment (n46) — the DIRECTED join under the same skew.
    // No length-ratio pruning exists, so hot-gram capping / the
    // source-side prefix bound are the only mitigations (VERDICT r8 #1).
    def runCont(name: String, docs: DataFrame, cap: Option[Int]): (Long, Long, Double) = {
      val df = Dedup.containmentPairs(docs, "doc_id", "text", maxDf = cap)
      val (pairs, sec) = timed(df.collect().length.toLong)
      val fanout = BenchUtil.metricMaxWhere(
        df.queryExecution.executedPlan, "numOutputRows")(n =>
        n.nodeName.contains("Join") && n.simpleString(Int.MaxValue).contains("Inner"))
      System.err.println(f"[skew] $name%-16s fanout=$fanout%12d pairs=$pairs%6d time=$sec%7.2fs")
      (fanout, pairs, sec)
    }
    def runContPrefix(docs: DataFrame): (Long, Double) = {
      val (pairs, sec) = timed {
        Dedup.containmentPairsPrefix(docs, "doc_id", "text").count()
      }
      System.err.println(f"[skew] cont_prefix_skew pairs=$pairs%6d time=$sec%7.2fs")
      (pairs, sec)
    }

    // ---- AQE skew-join: the RUNTIME backstop measured. The exact
    // join's hot shingle lands its entire df² fan-out in ONE reducer;
    // forcing OptimizeSkewedJoin (factor/threshold floored, force flag
    // for the post-join agg distribution) splits that partition so the
    // quadratic work spreads across cores — total work is unchanged
    // (only the index-side cap/prefix remove work), wall divides by
    // the split count. Reported: wall + how many skew splits engaged.
    def runSkewAqe(docs: DataFrame): (Long, Long, Double) = {
      val c = spark.conf
      val saved = Seq(
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> c.getOption(k))
      try {
        c.set("spark.sql.adaptive.skewJoin.enabled", "true")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        // the inverted index must SHUFFLE for skew-join to apply — a
        // broadcast of the index side would bypass the reducer split
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = Dedup.jaccardPairs(docs, "doc_id", "text")
        val (pairs, sec) = timed(df.collect().length.toLong)
        val planStr = df.queryExecution.executedPlan.toString
        val splits = "isSkewJoin=true|skew=true".r.findAllIn(planStr).size.toLong
        System.err.println(f"[skew] skew_aqe         splits=$splits%12d pairs=$pairs%6d time=$sec%7.2fs")
        (splits, pairs, sec)
      } finally saved.foreach {
        case (k, Some(v)) => c.set(k, v)
        case (k, None) => c.unset(k)
      }
    }

    val (cleanFan, cleanPairs, cleanSec) = run("clean_exact", clean, None)
    val (skewFan, skewPairs, skewSec) = run("skew_exact", skew, None)
    val (capFan, capPairs, capSec) = run("skew_capped", skew, Some(maxDf))
    val (prefPairs, prefSec) = runPrefix(skew)
    val (aqeSplits, aqePairs, aqeSec) = runSkewAqe(skew)
    val (cCleanFan, cCleanPairs, cCleanSec) = runCont("cont_clean", clean, None)
    val (cSkewFan, cSkewPairs, cSkewSec) = runCont("cont_skew", skew, None)
    val (cCapFan, cCapPairs, cCapSec) = runCont("cont_capped", skew, Some(maxDf))
    val (cPrefPairs, cPrefSec) = runContPrefix(skew)

    println(
      s"""{"bench":"skew","sf":"$sfDir","n_docs":$nDocs,"boiler_tokens":$nBoiler,"max_df":$maxDf,""" +
      s""""clean":{"fanout":$cleanFan,"pairs":$cleanPairs,"sec":$cleanSec},""" +
      s""""skew_exact":{"fanout":$skewFan,"pairs":$skewPairs,"sec":$skewSec},""" +
      s""""skew_capped":{"fanout":$capFan,"pairs":$capPairs,"sec":$capSec},""" +
      s""""skew_prefix":{"pairs":$prefPairs,"sec":$prefSec},""" +
      s""""skew_aqe":{"splits":$aqeSplits,"pairs":$aqePairs,"sec":$aqeSec},""" +
      s""""cont_clean":{"fanout":$cCleanFan,"pairs":$cCleanPairs,"sec":$cCleanSec},""" +
      s""""cont_skew":{"fanout":$cSkewFan,"pairs":$cSkewPairs,"sec":$cSkewSec},""" +
      s""""cont_capped":{"fanout":$cCapFan,"pairs":$cCapPairs,"sec":$cCapSec},""" +
      s""""cont_prefix":{"pairs":$cPrefPairs,"sec":$cPrefSec}}""")
    spark.stop()
  }
}
