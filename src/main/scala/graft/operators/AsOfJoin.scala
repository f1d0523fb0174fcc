package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (the temporal "latest right row at-or-before each left
  * row" operator Spark has no built-in for), via the union+window
  * trick:
  *
  *   1. tag both sides and union them (missing columns null-filled);
  *   2. one window per key ordered by (time, side, tiebreak) with
  *      `last(payload, ignoreNulls)` over unbounded-preceding;
  *   3. keep only left rows — each now carries the most recent right
  *      payload at-or-before its timestamp.
  *
  * Scale shape: ONE shuffle on the key (the window's partitioning) and
  * a per-partition sort — no range cross join, no per-left-row probe,
  * no candidate explosion on dense right sides. This is the plan a
  * backward range join should lower to at 100 TB; DuckDB's native
  * ASOF JOIN is the oracle twin.
  *
  * Ties: a right row at exactly the left row's timestamp IS eligible
  * (<= semantics) — the sort places side=0 (right) before side=1
  * (left) at equal times; `tiebreak` totally orders same-(key, time)
  * rows so the result is deterministic.
  */
object AsOfJoin {

  /** For each `left` row, attach `payloadCol` from the latest `right`
    * row with the same `key` and `time` <= the left row's `time`, as
    * column `asof_<payloadCol>` (null if no such row). Both sides must
    * carry (key, time, tiebreak); only `right` needs `payloadCol`. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      time: String, tiebreak: String, payloadCol: String): DataFrame = {
    require(!left.columns.exists(Set("_side", "_pay")),
      "asofBackward reserves working columns _side/_pay; rename them on the left side")
    require(!Seq(key, time, tiebreak).exists(Set("_side", "_pay")),
      "asofBackward reserves _side/_pay; rename the right side's key/time/tiebreak columns")
    require(!left.columns.contains(s"asof_$payloadCol"),
      s"left side already has output column asof_$payloadCol")
    val payT = right.schema(payloadCol).dataType
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(payT))
    val r = right
      .select(col(key), col(time), col(tiebreak), col(payloadCol).as("_pay"))
      .withColumn("_side", lit(0))

    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("_side").asc, col(tiebreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asof_$payloadCol", last(col("_pay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) :+ col(s"asof_$payloadCol"): _*)
  }
}
