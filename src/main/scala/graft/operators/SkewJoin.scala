package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual mitigation that
  * composes with (and predates) AQE's skew-join splitting.
  *
  * A shuffle join hash-partitions by the key, so one hot key lands its
  * entire row set on ONE task: the classic straggler at 100 TB (a few
  * celebrity users / boilerplate codes holding 1000× the median rows).
  * Salting decorrelates key and partition: the fact side appends
  * `_salt = pmod(hash(saltBy), buckets)` (deterministic — derived from
  * a high-cardinality fact column, never `rand()`, so retries and
  * replays place rows identically), the dim side is replicated once
  * per salt value, and the join key becomes (key, _salt) — the hot
  * key's rows now spread over `buckets` tasks. Cost: dim side ×buckets
  * (fine for dims; this is the anti-broadcast regime where the dim is
  * too big to broadcast but small enough to replicate a few ways).
  *
  * The result set is IDENTICAL to the unsalted join (salt matches by
  * construction: fact row's salt ∈ [0, buckets) and every dim key
  * carries all salts) — verified by the p16 oracle, which is the plain
  * SQL join. The SHUFFLE_HASH hint pins the shuffle topology the
  * technique targets (a broadcast would bypass the demonstration —
  * and at the scale salting matters, broadcast is off the table).
  */
object SkewJoin {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, saltBy: String,
      buckets: Int = 8): DataFrame = {
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedEquiJoin reserves the working column _salt; rename it on the input")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(saltBy)), lit(buckets)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(saltedDim.hint("shuffle_hash"),
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
