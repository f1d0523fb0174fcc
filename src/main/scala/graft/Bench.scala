package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // a warm sbt daemon JVM can span a fixture regeneration: drop every
    // source-probe cache so THIS run re-probes footers/epoch units
    graft.sources.Tables.clearCaches()
    // untimed warmup: touch every table once so parquet footer reads,
    // codegen and JIT don't land on whichever query happens to run
    // first; one broadcast join and one micro-batch query warm the
    // broadcast machinery and the streaming engine (state store,
    // checkpoint IO) the same way
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.functions.broadcast
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey")).count()
      graft.streaming.StreamQueries.eventCounts(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // min over iters = steady-state engine time: iteration 1 pays
    // per-query codegen compilation and JIT, which a long-running
    // cluster job pays once, not per query
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // optional comma-separated query filter for isolating a regression
    // (SPARK_GRAFT_BENCH_QUERIES=a07_rollup,a23_grouping_sets); unset =
    // the full surface, which is what the driver runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must not silently yield an empty (total=0) bench
    only.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_QUERIES names unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.filter { case (n, _) => f(n) })
    // Cumulative JVM GC time — the per-query delta goes into the detail
    // JSON so a full-run outlier (r3: a07 +3.7 s; r4: a23 +37.3 s, both
    // ~1 s in isolation) shows WHERE the time went instead of reading as
    // a plan regression.
    val gcBeans = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.toVector
    }
    def gcMs(): Long = gcBeans.map(b => math.max(b.getCollectionTime, 0L)).sum
    // Block-manager bytes held by persisted RDDs (localCheckpoints from
    // n25/n39/s10/Clustering are the known allocators).
    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    // Between timed runs, return the JVM to a clean slate: cached
    // relations, lingering localCheckpoint RDD blocks (they live until
    // RDD GC otherwise — accumulated across 196 runs they force
    // eviction/GC storms on whoever runs next), and sink temp dirs.
    // Runs OUTSIDE the timed window: it is harness hygiene, not query
    // cost — a cluster job's blocks die with its job, they don't haunt
    // the next 97 jobs in the same JVM.
    def cleanup(): Unit = {
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        TempDirs.purge()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] cleanup failed: ${e.getMessage}")
      }
    }
    // batch task accounting of the min-time iteration (BenchTaskMetrics
    // scaladoc): wall splits into executor compute vs scheduler/IO wait
    // from the artifact alone — the batch twin of the stream_ms split.
    BenchTaskMetrics.install(spark.sparkContext)
    // optional deterministic query-order shuffle (seeded), for the
    // one-off position-correlation experiment on judged-run spikes
    // (VERDICT r13 "What's wrong" #3): unset = registry order, the
    // order every prior history entry ran in.
    val shuffleSeed = sys.env.get("SPARK_GRAFT_BENCH_SHUFFLE").map(_.toLong)
    val ordered = shuffleSeed.fold(selected.toSeq)(seed =>
      new scala.util.Random(seed).shuffle(selected.toSeq))
    val failed = scala.collection.mutable.ListBuffer[String]()
    val gcByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    val blkByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    val taskByQuery = scala.collection.mutable.LinkedHashMap[
      String, BenchTaskMetrics.TaskTotals]()
    // streaming drain accounting of the MIN-time iteration (the one the
    // reported number comes from): per-query micro-batch counts and
    // engine durations, so a spike splits into in-batch execution vs
    // drain/scheduling wait from the artifact alone (StreamMetrics).
    val streamByQuery = scala.collection.mutable.LinkedHashMap[
      String, Seq[graft.streaming.StreamMetrics.StreamRun]]()
    val results = ordered.map { case (name, fn) =>
      // a failed attempt must never become the reported min — record
      // successes only; a query with zero successes reports -1 and is
      // listed in "failed" (silent shrinking totals would misread as a
      // speedup)
      var gcTotal = 0L
      var blkPeak = 0L
      val times = (1 to iters).flatMap { _ =>
        graft.streaming.StreamMetrics.reset()
        BenchTaskMetrics.reset()
        val g0 = gcMs()
        val t0 = System.nanoTime()
        // noop sink, not count(): count lets Catalyst prune every
        // unreferenced projection (a map-only query would be timed as
        // a row count); noop materializes the full output row
        val r = try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          gcTotal += gcMs() - g0
          blkPeak = math.max(blkPeak, storageBytes())
          // snapshot BEFORE cleanup so harness-hygiene jobs never count
          Some((dt, graft.streaming.StreamMetrics.snapshot(),
            BenchTaskMetrics.snapshot()))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
        cleanup()
        r
      }
      gcByQuery(name) = gcTotal
      blkByQuery(name) = blkPeak
      if (times.isEmpty) { failed += name; name -> -1.0 }
      else {
        val best = times.minBy(_._1)
        if (best._2.nonEmpty) streamByQuery(name) = best._2
        taskByQuery(name) = best._3
        name -> best._1
      }
    }
    // Per-query seconds rounded to ms: full detail goes to a file and to an
    // EARLY stdout line. The FINAL stdout line stays short (<200 bytes) —
    // the driver's tail capture truncated the ~3.3 KB single-line form in
    // r01/r02 mid-queries-dict, leaving the bench gate unevaluable.
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = ms(results.collect { case (_, v) if v >= 0 => v }.sum)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // escape ONLY at JSON interpolation — the raw path opens the file;
    // escaping the variable itself would write to a mangled filename
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val gcJson = gcByQuery.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val blkJson = blkByQuery.map { case (k, v) =>
      "\"" + k + "\":" + (math.rint(v / 1048576.0 * 10) / 10) }
      .mkString("{", ",", "}")
    // only queries that drained ≥1 stream appear; `streams` counts the
    // drains in the min-time iteration (s10's replay = 2), trigger_ms
    // sums the engine's own triggerExecution — wall − trigger_ms/1000
    // is time spent OUTSIDE micro-batches (scheduling/drain wait)
    val streamJson = streamByQuery.map { case (k, runs) =>
      "\"" + k + "\":{\"streams\":" + runs.size +
        ",\"batches\":" + runs.map(_.batches).sum +
        ",\"addbatch_ms\":" + runs.map(_.addBatchMs).sum +
        ",\"trigger_ms\":" + runs.map(_.triggerMs).sum +
        ",\"max_trigger_ms\":" + runs.map(_.maxTriggerMs).max + "}"
    }.mkString("{", ",", "}")
    // batch attribution of the min-time iteration: task_ms = executor
    // compute (≤ cores × wall), sched_ms = task time outside compute —
    // a wall spike with historical task_ms is a stall, from the
    // artifact alone (the StreamMetrics idea extended to batch)
    val taskJson = taskByQuery.map { case (k, t) =>
      "\"" + k + "\":{\"tasks\":" + t.tasks +
        ",\"task_ms\":" + t.taskMs +
        ",\"gc_task_ms\":" + t.gcMs +
        ",\"sched_ms\":" + t.schedMs + "}"
    }.mkString("{", ",", "}")
    val shuffleJson = shuffleSeed.fold("")(s => s""","shuffle_seed":$s""")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    // Ambient-spike auto-classification: a judged run lands in an
    // uncontrolled co-tenant box, and its per-query spikes previously
    // had to be attributed BY HAND against history. Compare this run's
    // wall + task_ms to the rolling MIN across prior history entries
    // with the SAME settings — sf AND pair_sample AND iters; a
    // pair-sampled (or differently-iterated) run measures a different
    // workload and must not poison the min (ADVICE r17; entries
    // predating the pair_sample stamp are EXCLUDED — their setting is
    // unverifiable and a stamped generation exists). Wall > 3× the
    // rolling min with
    // task_ms still in band (≤1.5×) means the executors were starved
    // between tasks — "scheduler-ambient"; task_ms inflated too means
    // the stall hit inside task execution (co-tenant CPU steal) —
    // "in-task-stall". A scheduler-ambient spike that ALSO fired in
    // the most recent matching run is reproducing, which weather
    // shouldn't: it demotes to "ambient-unconfirmed" (suspect — e.g. a
    // plan change adding jobs/drain waits that wall sees but task_ms
    // doesn't) until a later run lands back near the min (ADVICE r17).
    // Advisory instrument either way; a genuine compute regression
    // shows up as task_ms inflation that reproduces across runs, which
    // the rolling min never absorbs. The window is the LAST 30 matching
    // entries, not all history: an unbounded min pins forever to walls
    // from superseded implementations (n21's round-1 stub left a
    // 0.115 s min that flagged every post-reimplementation ~0.9 s run
    // for 80+ entries), so the min must reflect the current code era —
    // 30 entries ≈ three rounds of runs, still spanning any turbulent
    // stretch. Only flagged queries appear; first run at a setting ⇒
    // empty.
    val pairSample = SparkEntry.pairSampleKeep
    val histWindow = 30
    val ambientJson = try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val histFile = new java.io.File(
        detailPath.stripSuffix(".json") + "_HISTORY.jsonl")
      // chronological matching entries: per-entry (query→wall, query→task_ms)
      val entries = scala.collection.mutable.ArrayBuffer[
        (Map[String, Double], Map[String, Long])]()
      if (histFile.exists()) {
        val src = scala.io.Source.fromFile(histFile)
        try src.getLines().foreach { line =>
          val j = JsonMethods.parse(line)
          def num(v: JValue): Option[Double] = v match {
            case JDouble(d) => Some(d)
            case JInt(i) => Some(i.toDouble)
            case JLong(l) => Some(l.toDouble)
            case JDecimal(d) => Some(d.toDouble)
            case _ => None
          }
          val sfOk = (j \ "sf") match {
            case JString(s) => s == sfDir
            case _ => false
          }
          // stamped entries only: pair_sample ABSENT means the entry
          // predates the stamp, and its actual setting is unverifiable
          // — one stamped generation exists (r17+), so pre-stamp
          // entries are excluded rather than assumed full-input
          // (ADVICE r17; JNull = stamped, explicitly unset)
          val pairOk = (j \ "pair_sample") match {
            case JNothing => false
            case JNull => pairSample.isEmpty
            case v => num(v).map(_.toInt) == pairSample
          }
          val itersOk = num(j \ "iters").map(_.toInt).contains(iters)
          if (sfOk && pairOk && itersOk) {
            val walls = (j \ "queries") match {
              case JObject(fs) => fs.flatMap { case (k, v) =>
                num(v).filter(_ >= 0).map(k -> _)
              }.toMap
              case _ => Map.empty[String, Double]
            }
            val tasks = (j \ "task") match {
              case JObject(fs) => fs.flatMap { case (k, v) =>
                num(v \ "task_ms").map(d => k -> d.toLong)
              }.toMap
              case _ => Map.empty[String, Long]
            }
            entries += ((walls, tasks))
          }
        } finally src.close()
      }
      val window = entries.takeRight(histWindow)
      val minWall = window.flatMap(_._1).groupMapReduce(_._1)(_._2)(math.min)
      val minTask = window.flatMap(_._2).groupMapReduce(_._1)(_._2)(math.min)
      val lastWall = window.flatMap(_._1).toMap // chronological: last wins
      results.flatMap { case (name, wall) =>
        minWall.get(name).collect {
          case mw if wall >= 0 && mw > 0 && wall > 3 * mw =>
            val tag = (taskByQuery.get(name).map(_.taskMs),
                minTask.get(name)) match {
              case (Some(ct), Some(mt)) if mt > 0 && ct <= 1.5 * mt =>
                if (lastWall.get(name).exists(_ > 3 * mw))
                  "ambient-unconfirmed"
                else "scheduler-ambient"
              case (Some(ct), Some(mt)) if mt > 0 => "in-task-stall"
              case _ => "ambient-unattributed"
            }
            "\"" + name + "\":\"" + tag + "\""
        }
      }.mkString("{", ",", "}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ambient classification failed: ${e.getMessage}")
      "{}"
    }
    val pairSampleJson = pairSample.fold("null")(_.toString)
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"gc_ms":$gcJson,"blk_mb":$blkJson,"stream":$streamJson,"task":$taskJson,"ambient":$ambientJson$shuffleJson,"sf":"${esc(sfDir)}","iters":$iters,"pair_sample":$pairSampleJson,"failed":$failedJson}"""
    try {
      val w = new java.io.PrintWriter(detailPath); try w.println(detail) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // append-only history next to the overwritten latest-run file: per-run
    // detail survives across rounds, so a total-time drift can be localized
    // to queries after the fact (r6 lost r5's detail to the overwrite)
    try {
      val histPath = detailPath.stripSuffix(".json") + "_HISTORY.jsonl"
      val fw = new java.io.FileWriter(histPath, true)
      try fw.write(detail + "\n") finally fw.close()
    } catch { case e: Throwable => System.err.println(s"[bench] history append failed: ${e.getMessage}") }
    // prefixed so a parser keying on a JSON line can only match the
    // short final line; full per-query JSON stays greppable + in file
    println(s"BENCH_QUERIES $detail")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"${esc(sfDir)}","iters":$iters,"nqueries":${results.size},"failed":$failedJson,"detail":"${esc(detailPath)}"}""")
    spark.stop()
  }
}
