package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF: componentwise-min reduction of MinHash signatures — the
  * sketch-union aggregator.
  *
  * MinHash's defining property (tested in ShinglesSpec): the signature
  * of a UNION of sets is the componentwise min of the members'
  * signatures. Aggregating per group therefore yields the group-level
  * sketch in one pass — corpus/partition-level resemblance estimation
  * (e.g. "how similar are the en and de sub-corpora?") without ever
  * materializing the union. Classic Broder '97; the aggregate shape is
  * what makes it scale: map-side partial min-merge means the shuffle
  * carries one k-long vector per (group × partition), independent of
  * corpus size.
  */
object MinHashAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val K = 32

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] = {
    val n = math.min(acc.length, sig.length)
    var i = 0
    while (i < n) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Untyped-DataFrame form: `df.groupBy(g).agg(MinHashAgg.union(col("sig")))`. */
  def union(sig: Column): Column = udaf(this, ExpressionEncoder[Seq[Long]]()).apply(sig)

  /** Estimated Jaccard between two group sketches: fraction of equal
    * components (the standard MinHash estimator). */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) 0.0 else (0 until n).count(i => a(i) == b(i)).toDouble / n
  }
}
