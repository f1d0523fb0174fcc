package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership (Bloom, CACM 1970 — /root/repo/PAPERS.md):
  * an m-bit filter with k md5-derived hash functions, materialized as
  * the DISTINCT SET of set bit positions (≤ m rows) rather than a
  * packed bitset. Same mathematics — the position set IS the filter;
  * the packed representation is a storage detail the relational form
  * trades for a broadcastable join side and an engine-portable,
  * bit-reproducible build (the DuckDB oracle reconstructs the filter
  * exactly, false positives included).
  *
  * Scale contract: the filter is ≤ m rows however large the insert
  * stream is (build = one distinct over positions, collapsed map-side);
  * probes explode ×k but join the BROADCAST position set and never
  * shuffle the probe data on a new key. The reference has no membership
  * structure at all — its dedup is an exact per-key DB probe
  * (kafka_s.py:614-630); this is the bounded-memory form a 100 TB
  * decontamination pass needs when the benchmark shingle set itself is
  * too hot to equi-join (n31 is the exact twin; n44 trades its shingle
  * shuffle for a constant-size broadcast plus a deterministic FP rate).
  */
object Bloom {

  /** Hash-`j` bit position of `s` in an m-bit filter: top-8 md5 hex
    * chars of "j:s" mod m — the engine-portable hash idiom shared with
    * CountMin / the n27 split. */
  def bitPos(j: Column, s: Column, m: Int): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), s)), 1, 8), 16, 10)
      .cast("long") % m

  /** Build: distinct set positions of `items` (column `item`). */
  def build(items: DataFrame, k: Int, m: Int, item: String = "item"): DataFrame =
    items.select(explode(sequence(lit(0), lit(k - 1))).as("j"), col(item))
      .select(bitPos(col("j"), col(item), m).as("p"))
      .distinct()

  /** Probe (relational form): rows of `probe` whose `item` has ALL k
    * bit positions set (the Bloom may-contain test — no false
    * negatives; false positives at the documented rate). Keeps
    * `probe`'s columns AND its row multiplicity: the k exploded hash
    * rows regroup on a per-row id attached before the explode, so
    * duplicate probe rows each pass or fail independently (grouping on
    * the value columns alone would pool duplicates into one group of
    * n·k hits and silently drop them — ADVICE r8). Kept as the
    * join-shaped reference semantics; the hot path is
    * [[mayContainExpr]]. */
  def mayContain(probe: DataFrame, filterPos: DataFrame, k: Int, m: Int,
                 item: String = "item"): DataFrame = {
    val keep = probe.columns.map(col).toSeq
    probe
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("p", bitPos(col("j"), col(item), m))
      .join(broadcast(filterPos), "p")
      .groupBy(col("__rid") +: keep: _*)
      .agg(count(lit(1)).as("bloom_hits"))
      .where(col("bloom_hits") === k)
      .select(keep: _*)
  }

  /** Probe (packed-bitset form — the production shape): collect the
    * ≤m set positions into an m-bit literal of m/64 longs and return a
    * PREDICATE COLUMN — true iff all k hash bits are set. The collect
    * is bounded by the filter width m (a design constant, like the s10
    * sink's ≤16-bucket prune list — never data-sized), and the probe
    * side then pays pure codegen'd bit arithmetic: NO join, NO
    * explode×k row inflation, NO pre-group shuffle. `shiftright` goes
    * through call_function because the Scala wrapper only accepts a
    * literal shift, while the underlying expression takes a column.
    * BloomSpec pins expr ≡ join-form row-for-row. */
  def mayContainExpr(filterPos: DataFrame, k: Int, m: Int, item: Column): Column = {
    val words = Array.ofDim[Long]((m + 63) / 64)
    filterPos.collect().foreach { r =>
      val p = r.getLong(0).toInt
      words(p >> 6) |= 1L << (p & 63)
    }
    val w = typedlit(words.toSeq)
    (0 until k).map { j =>
      val p = bitPos(lit(j), item, m)
      call_function("shiftright",
        element_at(w, (p / 64).cast("int") + 1),
        (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
