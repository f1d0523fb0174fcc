package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-drain micro-batch accounting for the bench artifact.
  *
  * Judged bench runs have repeatedly shown multi-second spikes on
  * streaming queries with gc_ms=0 that vanish in isolation (r9
  * n40/s17, r12 s19/s14) — consistent with trigger scheduling/drain
  * wait, not compute, but the artifact alone couldn't prove it. This
  * registry records, for every stream drained during a query, the
  * engine's own `StreamingQueryProgress` durations so BENCH_DETAIL can
  * split a query's wall time into in-batch execution
  * (`triggerExecution`, of which `addBatch` is the data-plane part)
  * vs everything outside the batches (wall − trigger ≈ scheduling,
  * file-listing waits, drain latency). A judged-run spike whose extra
  * seconds sit OUTSIDE trigger_ms is a stall, from the artifact alone.
  *
  * Thread-safe: foreachBatch sinks and the memory sink drain on stream
  * execution threads; Bench reads between queries. */
object StreamMetrics {

  /** One drained stream: batch count and summed/max engine durations. */
  final case class StreamRun(batches: Int, addBatchMs: Long,
      triggerMs: Long, maxTriggerMs: Long)

  private val buf = scala.collection.mutable.ArrayBuffer.empty[StreamRun]

  def reset(): Unit = synchronized { buf.clear() }

  /** Summarize a terminated query's recentProgress (AvailableNow drains
    * stay far under the 100-entry retention default). */
  def record(q: StreamingQuery): Unit = {
    def dur(p: org.apache.spark.sql.streaming.StreamingQueryProgress,
        key: String): Long =
      Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)
    val ps = q.recentProgress.toSeq
    val trig = ps.map(dur(_, "triggerExecution"))
    val run = StreamRun(
      // only batches that moved rows count as batches; AvailableNow
      // may emit a final no-data progress entry (ADVICE r13: >= 0 was
      // vacuously true and counted that entry)
      ps.count(_.numInputRows > 0),
      ps.map(dur(_, "addBatch")).sum,
      trig.sum,
      if (trig.isEmpty) 0L else trig.max)
    synchronized { buf += run }
  }

  /** All streams drained since the last reset. */
  def snapshot(): Seq[StreamRun] = synchronized { buf.toSeq }
}
