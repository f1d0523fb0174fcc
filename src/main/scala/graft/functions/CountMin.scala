package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token-occurrence stream (Cormode &
  * Muthukrishnan, J. Algorithms 2005 — see /root/repo/PAPERS.md):
  * `depth` independent hash rows of `width` counters; a point estimate
  * is the MIN over rows of the token's bucket counter — always ≥ the
  * true count, over only by collision mass.
  *
  * The reference engine keeps no frequency state at all (its event
  * counter is an exact per-key MySQL upsert, kafka_s.py:614-630); this
  * is the bounded-memory extension a 100 TB token pipeline needs: the
  * sketch build is ONE groupBy whose key space is ≤ depth×width
  * regardless of input size, so map-side partial aggregation collapses
  * every partition to that constant bound before the only shuffle.
  * Nothing here is an approximation of the *hash compare*: the hash
  * rows are md5-derived (same bytes in any engine), so the sketch —
  * including its collision overestimates — is bit-reproducible, and the
  * DuckDB oracle rebuilds it exactly.
  *
  * Fleet sizing: production widths are 2^18–2^20 (a few MB — still
  * broadcastable); the n43 query deliberately runs width 32 on the
  * 31-token fixture vocabulary so collisions actually occur and the
  * est ≥ exact inequality is exercised rather than vacuous.
  */
object CountMin {

  /** Row-`i` bucket of token `t`: top-8 md5 hex chars of "i:t" as an
    * integer, mod `width` — the same arithmetic the n27 split / pair-
    * sample idioms use, proven bit-equal across Spark and DuckDB. */
  def bucket(i: Column, t: Column, width: Int): Column =
    conv(substring(md5(concat(i.cast("string"), lit(":"), t)), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch from an occurrence frame (one row per token
    * occurrence, column `tok`). The explode multiplies rows ×depth
    * BEFORE the aggregation, but partial agg bounds the shuffle at
    * depth×width rows per map task — constant at any scale. */
  def sketch(occ: DataFrame, depth: Int, width: Int, tok: String = "tok"): DataFrame =
    occ.select(explode(sequence(lit(0), lit(depth - 1))).as("i"), col(tok))
      .select(col("i"), bucket(col("i"), col(tok), width).as("b"))
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("c"))

  /** Point estimates for `cands` (distinct tokens, column `tok`): min
    * over the depth rows of the looked-up counters. The sketch side is
    * ≤ depth×width rows → broadcast; candidates never re-shuffle.
    * NOTE: the inner join assumes every candidate occurred in the
    * sketched stream (all its buckets populated) — true for n43, whose
    * candidates come from the stream itself. A candidate never sketched
    * can hit an absent (i,b) row and silently DROP instead of
    * estimating ≥ 0; probe-only workloads would left-join with a zero
    * fill. */
  def estimate(cands: DataFrame, sk: DataFrame, depth: Int, width: Int,
               tok: String = "tok"): DataFrame =
    cands
      .select(col(tok), explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .withColumn("b", bucket(col("i"), col(tok), width))
      .join(broadcast(sk), Seq("i", "b"))
      .groupBy(col(tok)).agg(min(col("c")).as("est"))
}
