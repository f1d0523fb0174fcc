package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sharding

/** Contract for the two-phase shard-position assignment (VERDICT r8
  * #2): the output must equal the window-based single-task-sort
  * reference EXACTLY, while the executed plan contains no Window at
  * all — the shape whose max per-task sort is corpus/numPartitions,
  * never corpus/nShards. */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  /** The semantics n62's oracle pins, as the naive window plan. */
  private def reference(n: Int, nShards: Int, tag: String) = {
    val ek = md5(concat(col("doc_id").cast("string"), lit(":" + tag)))
    val win = Window.partitionBy(col("shard"))
      .orderBy(col("ek").asc, col("doc_id").asc)
    docs(n)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % nShards).as("shard"),
        ek.as("ek"))
      .withColumn("pos", row_number().over(win).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("two-phase positions equal the window reference") {
    val got = rows(Sharding.shardPositions(docs(500), "doc_id"))
    val want = rows(reference(500, 8, "ep1"))
    assert(got == want,
      s"drift: missing=${want -- got} extra=${got -- want}")
  }

  test("positions are dense 1..shardSize within every shard") {
    val out = Sharding.shardPositions(docs(333), "doc_id")
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .collect()
    perShard.foreach { r =>
      val (sh, n, lo, hi, d) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 1L, s"shard $sh min pos $lo != 1")
      assert(hi == n, s"shard $sh max pos $hi != count $n")
      assert(d == n, s"shard $sh has duplicate positions")
    }
    assert(perShard.map(_.getLong(1)).sum == 333L)
  }

  test("deterministic across runs and shard-count parameterized") {
    val a = rows(Sharding.shardPositions(docs(200), "doc_id", nShards = 5))
    val b = rows(Sharding.shardPositions(docs(200), "doc_id", nShards = 5))
    assert(a == b)
    val want = rows(reference(200, 5, "ep1"))
    assert(a == want)
  }

  test("epoch re-key changes order but never shard membership") {
    val e1 = Sharding.shardPositions(docs(300), "doc_id", epochTag = "ep1")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val e2 = Sharding.shardPositions(docs(300), "doc_id", epochTag = "ep2")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(e1.keySet == e2.keySet)
    e1.foreach { case (id, (sh, _)) => assert(e2(id)._1 == sh) }
    // and the within-shard order actually changed somewhere
    assert(e1.exists { case (id, (_, p)) => e2(id)._2 != p })
  }

  test("plan contract: no Window operator anywhere (no per-shard global sort)") {
    val p = Sharding.shardPositions(docs(100), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p) // offsets ride a broadcast
  }
}
