package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** BPE training at a realistic merge count (VERDICT r8 #5: "3 unrolled
  * merges prove the shape; real tokenizers run thousands — show linear
  * scaling or document the bound").
  *
  * Drives the public `Bpe.vocab`/`initSymbols`/`step` loop exactly as
  * `learnMerges` does (same per-iteration localCheckpoint lineage cut)
  * and times EVERY iteration, so the committed artifact shows whether
  * per-iteration cost stays flat as the merge table grows — the
  * quantity that decides whether the checkpointed loop scales to
  * production merge counts. Emits one JSON line with the per-iteration
  * seconds; the measured numbers are committed in SKETCH.md.
  *
  * Usage: sbt 'runMain graft.BpeBench [sfDir] [iters]'
  */
object BpeBench {

  import BenchUtil.timed

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val iters = args.lift(1).map(_.toInt).getOrElse(40)
    val spark: SparkSession = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val (v, vocabSec) = timed {
      val v0 = Bpe.vocab(docs).coalesce(1).localCheckpoint()
      v0.count()
      v0
    }
    val (syms0, initSec) = timed {
      val s0 = graft.operators.Iterate.cut(Bpe.initSymbols(v))
      s0.count()
      s0
    }
    var syms = syms0
    val perIter = Array.newBuilder[Double]
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    while (i <= iters && !exhausted) {
      val gc0 = gcMs
      val (res, sec) = timed {
        Bpe.step(syms, v) match {
          case (Some(m), next) =>
            val cut = graft.operators.Iterate.cut(next)
            cut.count() // materialize INSIDE the timed window
            Some((m, cut))
          case (None, _) => None
        }
      }
      res match {
        case Some(((a, b, n), next)) =>
          merges += ((i, a, b, n))
          val nodes = next.queryExecution.optimizedPlan
            .collect { case p => p }.size
          syms = next
          perIter += sec
          System.err.println(f"[bpe] iter=$i%3d merge=($a|$b) n=$n%8d " +
            f"time=$sec%6.2fs plan_nodes=$nodes%3d gc_delta=${gcMs - gc0}%5dms")
        case None => exhausted = true
      }
      i += 1
    }
    val times = perIter.result()
    val learned = merges.result()
    val firstQ = times.take(times.length / 4).sum / math.max(1, times.length / 4)
    val lastQ = times.takeRight(times.length / 4).sum / math.max(1, times.length / 4)
    println(
      s"""{"bench":"bpe","sf":"$sfDir","iters":${times.length},""" +
      s""""vocab_sec":$vocabSec,"init_sec":$initSec,""" +
      s""""total_sec":${times.sum},"mean_sec":${times.sum / math.max(1, times.length)},""" +
      s""""first_quartile_mean":$firstQ,"last_quartile_mean":$lastQ,""" +
      s""""per_iter":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""last_merge":"${learned.lastOption.map(m => m._2 + "|" + m._3).getOrElse("")}"}""")
    spark.stop()
  }
}
