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

  /** Probe: rows of `probe` whose `item` has ALL k bit positions set
    * (the Bloom may-contain test — no false negatives; false positives
    * at the documented rate). Keeps `probe`'s columns. */
  def mayContain(probe: DataFrame, filterPos: DataFrame, k: Int, m: Int,
                 item: String = "item"): DataFrame = {
    val keep = probe.columns.map(col).toSeq
    probe
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("p", bitPos(col("j"), col(item), m))
      .join(broadcast(filterPos), "p")
      .groupBy(keep: _*)
      .agg(count(lit(1)).as("bloom_hits"))
      .where(col("bloom_hits") === k)
      .drop("bloom_hits")
  }
}
