package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two determinism contracts the a34/n60 oracles rely on.
  *
  * a34_sessionize: tie rows (equal ts) are RANGE-frame peers, so both
  * land in the same session no matter which physical order the engine
  * scans them in — the reason the query needs no tiebreaker column.
  *
  * n60_dsir_weight: a doc made of target-distribution tokens must
  * outscore a doc of never-in-target tokens (the importance-resampling
  * ordering the ppm quantization must preserve), and identical token
  * multisets must score identically regardless of lang label.
  */
class SessionizeDsirSpec extends AnyFunSuite {

  /** Same md5-bucket arithmetic as SparkEntry.md5Bucket100 / n60 (%64). */
  private def bucket64(tok: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString // first 4 hex chars
    Integer.parseInt(hex, 16) % 64
  }

  test("a34: equal-ts events at a session boundary share the session") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = TempDirs.create("a34-fixture")
    // ts written as plain long nanos on an era-realistic 2023 base —
    // Tables.events infers the epoch UNIT from magnitude (a 1970-era
    // nanos value is indistinguishable from 2023-era millis), so
    // synthetic fixtures must live in a real era like the driver's do
    val base = 1700000000L // 2023-11-14 22:13:20 UTC, in seconds
    def ns(sec: Long): Long = (base + sec) * 1000000000L
    Seq(
      (1L, ns(0), 1L, "view", 0.0, "{}"),
      (2L, ns(2000), 1L, "view", 0.0, "{}"), // tie: 2000 s gap > 1800
      (3L, ns(2000), 1L, "click", 0.0, "{}"), // tie peer — same session
      (4L, ns(2500), 1L, "view", 0.0, "{}"),
      (5L, ns(100), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("a34_sessionize")(spark, dir)
      .select("user_id", "sess", "n_events", "start_s", "dur_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set(
      (1L, 1L, 1L, base + 0L, 0L), // lone first event
      (1L, 2L, 3L, base + 2000L, 500L), // both tie rows + the 2500 s follower
      (2L, 1L, 1L, base + 100L, 0L)))
  }

  test("n60: target-token docs outscore never-in-target docs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // two tokens guaranteed to hash to DIFFERENT 64-buckets, so the
    // non-target token's bucket has zero target mass
    val cands = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val t1 = cands.head
    val t2 = cands.tail.find(c => bucket64(c) != bucket64(t1)).get
    val dir = TempDirs.create("n60-fixture")
    val mk = (id: Long, tok: String, lang: String) =>
      (id, s"$tok $tok $tok", lang, "web", 11L)
    Seq(
      mk(1L, t1, "en"), // defines the target distribution
      mk(2L, t2, "de"), // never-in-target bucket
      mk(3L, t1, "de") // same tokens as doc 1, different label
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("n60_dsir_weight")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows(1L)._1 === 3L) // n_toks
    // identical token multiset ⇒ identical score, lang label irrelevant
    assert(rows(1L)._2 === rows(3L)._2)
    // target-distribution tokens strictly outscore the zero-target bucket
    assert(rows(1L)._2 > rows(2L)._2)
  }
}
