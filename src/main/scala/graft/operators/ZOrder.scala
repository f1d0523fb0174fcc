package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column generalization of
  * the p24 range-clustered write: interleave the bits of two bucketed
  * dimensions into one sort key, so a RANGE of z-values is a small
  * RECTANGLE in (dim1, dim2) space. Files written in z-order carry
  * tight per-file min/max footer stats on BOTH dimensions at once,
  * which a single-column sort cannot do (sorting by custkey leaves
  * every file spanning the full date range) — this is what makes
  * 2-predicate scans prunable at 100 TB, and it is exactly the layout
  * `OPTIMIZE ZORDER BY` produces in the lakehouse formats.
  *
  * The z-value is plain bit arithmetic (shift/mask/sum of disjoint
  * bit positions) — deterministic, engine-portable, and computed only
  * at WRITE time; readers never see it. ZOrderSpec measures the
  * locality property directly: average per-file span over each
  * dimension shrinks to a fraction of the global span.
  */
object ZOrder {

  /** 16-bit Morton code of two 8-bit bucket columns (values are
    * masked to 8 bits first — callers bucket into [0,256)). Bits land
    * in disjoint positions, so the OR is written as a sum, which both
    * engines and the optimizer treat as exact integer math. */
  def zvalue(a: Column, b: Column): Column = {
    val a8 = a.cast("int").bitwiseAND(lit(255))
    val b8 = b.cast("int").bitwiseAND(lit(255))
    (0 until 8).map { i =>
      shiftleft(shiftright(a8, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(b8, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` z-clustered on (`dim1` % 256, `dim2` % 256) into
    * `files` range partitions of the z key, z-sorted within each. */
  def writeClustered(df: DataFrame, dim1: Column, dim2: Column,
      dir: String, files: Int): Unit =
    df.withColumn("__z", zvalue(dim1, dim2))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
