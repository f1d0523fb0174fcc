package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet fixture loaders (see /root/repo/TESTDATA.md).
  *
  * All queries take the scale-factor directory as a runtime parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench).
  * Reads go through `spark.read.parquet` so Catalyst gets vectorized scans,
  * predicate pushdown and column pruning for free.
  *
  * SESSION REQUIREMENT: oracle parity of every `date_format`-bearing query
  * assumes `spark.sql.session.timeZone=UTC` (the DuckDB oracle is TZ-naive).
  * GraftSession pins it; a caller-owned session in another zone would render
  * shifted wall-clock strings. It cannot be defensively forced here — the
  * conf always reports a value (the JVM default), so "explicitly set by the
  * user" is indistinguishable from "unset".
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) rejects outright. Read it as a raw long (legacy conf) and floor
    * to micros — integer `div`, not `/`, since ns-since-epoch exceeds
    * double's 2^53 mantissa.
    *
    * `nanosAsLong` is pinned at session construction by every entry
    * point this library owns (Verify / Bench / SparkTestSession), so a
    * table load never mutates shared session state mid-run (ADVICE
    * r01). The defensive set below remains ONLY for caller-owned
    * sessions that run `SparkEntry.queries` directly without our
    * builders; it is a no-op under our own sessions. Probe the
    * EFFECTIVE value, not presence: `getOption` on a registered conf
    * returns its default ("false") even when unset, so an
    * `isEmpty` guard would never fire (ADVICE r02). */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
