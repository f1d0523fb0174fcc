package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BsonToJson, DotProduct, MinHashSig, ShingleSet, SimHash64, Uuid3, Winnow}

/** Spark-native extension point: registers the engine's custom Catalyst
  * expressions as SQL functions, so the full surface is usable from
  * `spark.sql(...)` and `selectExpr`, not only the Scala Column API.
  *
  * Wire up via config (works for spark-submit and Connect alike):
  *   spark.sql.extensions=graft.GraftExtensions
  * or programmatically: `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Registered functions:
  *   graft_uuid3(s)        — RFC-4122 v3 uuid over NAMESPACE_DNS, no dashes
  *   graft_det_id(s)       — namespace-free md5 id with v3 bits (oracle-expressible)
  *   graft_simhash64(arr)  — 64-bit SimHash hex of a token array
  *   graft_shingle_set(s)  — distinct 3-word shingle set
  *   graft_minhash_sig(a)  — 32-component MinHash signature of a shingle set
  *   graft_dot(a, b)       — double-array dot product (left fold)
  *   graft_bson_to_json(b) — BSON document binary → canonical JSON text
  *   graft_winnow(s)       — winnowing fingerprint selection (w=3, win=4)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Arity check up front — otherwise a wrong-arg-count call surfaces
    * as an IndexOutOfBoundsException from the builder. */
  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n,
      s"$name takes $n argument(s), got ${args.length}")
    args
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_uuid3"),
      info("graft_uuid3", "uuid3(NAMESPACE_DNS, str), dashes stripped"),
      (args: Seq[Expression]) => Uuid3(arity("graft_uuid3", 1)(args).head, Uuid3.NamespaceDns)))
    ext.injectFunction((FunctionIdentifier("graft_det_id"),
      info("graft_det_id", "md5-based deterministic id with uuid-v3 bits"),
      (args: Seq[Expression]) => Uuid3(arity("graft_det_id", 1)(args).head, Nil)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit SimHash hex digest of a token array"),
      (args: Seq[Expression]) => SimHash64(arity("graft_simhash64", 1)(args).head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set", "distinct 3-word shingle set of a text"),
      (args: Seq[Expression]) => ShingleSet(arity("graft_shingle_set", 1)(args).head, 3)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "32-component MinHash signature of a string array"),
      (args: Seq[Expression]) => MinHashSig(arity("graft_minhash_sig", 1)(args).head, 32)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two double arrays (left fold)"),
      (args: Seq[Expression]) => {
        val a = arity("graft_dot", 2)(args); DotProduct(a(0), a(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_bson_to_json"),
      info("graft_bson_to_json", "BSON document binary to canonical JSON text"),
      (args: Seq[Expression]) => BsonToJson(arity("graft_bson_to_json", 1)(args).head)))
    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "winnowing fingerprint selection (3-grams, window 4)"),
      (args: Seq[Expression]) => Winnow(arity("graft_winnow", 1)(args).head, 3, 4)))
    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "fused set-Jaccard of two string arrays"),
      (args: Seq[Expression]) => {
        val a = arity("graft_jaccard", 2)(args)
        graft.functions.SetJaccard(a(0), a(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats",
        "single-pass (n_tokens, len_sum, max_len, stop_hits) token stats"),
      (args: Seq[Expression]) =>
        graft.functions.TextStats(arity("graft_text_stats", 1)(args).head)))
    // optimizer rules: fuse size(array_intersect)/size(array_union)
    // into the one-pass SetJaccard kernel (FuseSetJaccard scaladoc),
    // and the whitespace token-count idiom into the TextStats kernel
    // (FuseTokenCount scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.FuseSetJaccard)
    ext.injectOptimizerRule(_ => graft.plans.FuseTokenCount)
  }
}
