package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One priority-sample entry: the md5-derived priority, the doc id it
  * belongs to, and the sampling weight (token count). */
final case class PriEntry(pri: Double, id: Long, w: Long)

/** Typed UDAF: bottom-K priority sample (Duffield, Lund & Thorup,
  * JACM '07) — the group's K entries with the smallest priorities,
  * priority = uniform-hash / weight, so inclusion probability grows
  * with weight and the sample supports unbiased subset-sum estimation.
  *
  * Like [[KmvAgg]] this sketch is MERGEABLE: every global bottom-K
  * entry is in its partition's bottom-K, so map-side partials are
  * lossless and the shuffle carries O(groups·K) entries at any input
  * size. The same merge makes it streaming state (s22): any
  * micro-batching folds to the identical final sample as one batch
  * aggregate, because merge is associative + commutative and [[norm]]
  * dedups exact replays.
  *
  * Priority arithmetic contract ([[priority]]): h is the first 13 hex
  * chars of md5(id) — 52 bits, so the DOUBLE cast is exact in every
  * engine — and the division is a single IEEE op. The textbook
  * exponential-race key (u^(1/w), i.e. pow/ln) is NOT cross-engine
  * bit-deterministic; h/w ranks the same sample without ever leaving
  * exactly-rounded arithmetic.
  */
object PriorityAgg extends Aggregator[Seq[PriEntry], Array[PriEntry], Seq[PriEntry]] {
  val K = 5

  private def lt(a: PriEntry, b: PriEntry): Boolean =
    a.pri < b.pri || (a.pri == b.pri && a.id < b.id)

  /** Sort by (pri, id), drop exact replays, keep the bottom K. */
  private def norm(xs: Array[PriEntry]): Array[PriEntry] = {
    val s = xs.distinct.sortWith(lt)
    if (s.length <= K) s else s.take(K)
  }

  override def zero: Array[PriEntry] = Array.empty

  override def reduce(acc: Array[PriEntry], in: Seq[PriEntry]): Array[PriEntry] =
    norm(acc ++ in)

  override def merge(a: Array[PriEntry], b: Array[PriEntry]): Array[PriEntry] =
    norm(a ++ b)

  override def finish(acc: Array[PriEntry]): Seq[PriEntry] = norm(acc).toSeq

  override def bufferEncoder: Encoder[Array[PriEntry]] =
    ExpressionEncoder[Array[PriEntry]]()
  override def outputEncoder: Encoder[Seq[PriEntry]] =
    ExpressionEncoder[Seq[PriEntry]]()

  /** THE priority arithmetic — single definition shared by n53, s22,
    * and the DuckDB twin (`('0x' || substr(md5(id::VARCHAR),1,13))
    * ::BIGINT::DOUBLE / w`). */
  def priority(id: Column, w: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("double") /
      w.cast("double")

  /** Row-level partial: a singleton sketch. */
  def partial(id: Column, w: Column): Column =
    array(struct(priority(id, w).as("pri"), id.as("id"), w.as("w")))

  /** Untyped-DataFrame form of the bottom-K union. */
  def union(partial: Column): Column =
    udaf(this, ExpressionEncoder[Seq[PriEntry]]()).apply(partial)
}
