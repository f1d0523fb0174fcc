package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GRAFT_PAIR_SAMPLE invariants (VERDICT r6 #2).
  *
  * The bounded-oracle sampling for the 8 O(n²) pair queries rests on two
  * facts that a one-line typo could silently break:
  *
  *  1. Spark's `md5Bucket100` and the DuckDB predicate emitted into the
  *     oracle SQL (`('0x' || substr(md5(CAST(id AS VARCHAR)),1,4))::INT
  *     % 100`) compute the SAME bucket for every id — else the two
  *     engines verify different sub-corpora and the compare is garbage
  *     that still looks green on disjoint-but-equal-cardinality inputs.
  *     Pinned against constants precomputed with CPython hashlib and
  *     cross-checked in DuckDB 1.x (both agree on the values below).
  *
  *  2. With the sample UNSET (the driver's sf0.01 gate, every spec, the
  *     bench), the emitted oracle SQL is byte-identical to the round-5
  *     (pre-sampling) text — the env-gated path must be a provable no-op
  *     when off. Pinned as md5 hashes of the 8 strings captured from the
  *     r5-equivalent unset path (the r5→r6 diff rewrites each FROM
  *     target to `$docsT`/`$embT`, which resolve to the bare table names
  *     when unset).
  */
class PairSampleSpec extends AnyFunSuite {

  // (id, bucket) goldens: python3 hashlib `int(md5(str(i))[:4],16)%100`,
  // value-identical in DuckDB `('0x'||substr(md5(i::VARCHAR),1,4))::INT%100`
  private val bucketGoldens = Seq(
    0L -> 97, 1L -> 78, 2L -> 30, 3L -> 19, 5L -> 86, 7L -> 28,
    10L -> 33, 42L -> 24, 99L -> 30, 100L -> 41, 123L -> 36, 999L -> 54,
    4999L -> 58, 12345L -> 4, 2000000000L -> 36)

  test("md5Bucket100 equals the DuckDB oracle predicate on precomputed ids") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = bucketGoldens.map(_._1).toDF("id")
      .select(col("id"), SparkEntry.md5Bucket100(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    bucketGoldens.foreach { case (id, want) =>
      assert(got(id) == want, s"bucket($id): got ${got(id)}, want $want")
    }
  }

  // md5 of the UNSAMPLED oracle SQL text per pair query, captured from
  // the r5-equivalent output (see scaladoc); any template edit that
  // changes the emitted bytes must consciously update these.
  private val oracleGoldens = Map(
    "n02_dedup_jaccard"      -> "836857cec7750d8d3847226a1f92fc89",
    "n03_dedup_minhash_lsh"  -> "b6c0841d84a3712e189e6baccfd42111",
    "n13_embed_neardup"      -> "b7f3f66b1bf691eb38f081347d0402a8",
    "n16_dedup_apply"        -> "745407477f888926a274eac19cab1a68",
    "n23_embed_neardup_grid" -> "b7f3f66b1bf691eb38f081347d0402a8",
    "n24_embed_neardup_lsh"  -> "a1d667f2c66e6a7e2f4703c6b08993da",
    "n25_dedup_components"   -> "71c403dcdc1c6038a85ebc5fb9f4a0f0",
    "n26_simhash_neardup"    -> "c58702d911bb827807ee30c6bd11c726")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sample unset: pair-query oracle SQL byte-identical to r5 goldens") {
    // the setting is frozen at SparkEntry init; under a sampled JVM this
    // test is vacuous, so skip loudly rather than pass wrongly
    assume(SparkEntry.pairSampleKeep.isEmpty,
      "GRAFT_PAIR_SAMPLE is set in this JVM - golden test only applies unset")
    oracleGoldens.foreach { case (name, want) =>
      val sql = SparkEntry.oracleSql(name)
      assert(md5hex(sql) == want,
        s"$name oracle SQL drifted from the r5 unsampled text:\n$sql")
    }
  }

  test("sampledSqlFrom emits the exact predicate for both env settings") {
    // calls the real emitter with an explicit keep, so this pins the
    // actually-emitted bytes regardless of this JVM's environment (full
    // cross-engine agreement is test 1 + the committed sampled sf0.1
    // artifact CORRECTNESS_SF01.json)
    assert(SparkEntry.sampledSqlFrom("documents", "doc_id", Some(20)) ==
      "(SELECT * FROM documents WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100) < 20) AS documents")
    assert(SparkEntry.sampledSqlFrom("embeddings", "vec_id", Some(7)) ==
      "(SELECT * FROM embeddings WHERE (('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))::INT % 100) < 7) AS embeddings")
    // unset path: the FROM target is the bare table name, no wrapper
    assert(SparkEntry.sampledSqlFrom("documents", "doc_id", None) == "documents")
  }
}
