package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** FuseTokenCount contract: the token-count idiom rewrites to the
  * TextStats kernel from both the Column API and raw SQL, values are
  * unchanged (incl. nulls and empties), and the guard leaves
  * non-matching splits alone. */
class TokenFuseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf = {
    // file-backed: a LocalRelation would constant-fold before the
    // rewritten expression could be observed in the plan
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  test("Column-API tokenCountWs rewrites to the kernel, values unchanged") {
    val q = docsDf.select($"doc_id", Text.tokenCountWs($"text").as("n"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_text_stats"),
      q.queryExecution.optimizedPlan.toString)
    // equality against the un-fusable explode form (can't silently fuse)
    val viaExplode = docsDf
      .select($"doc_id", explode(Text.tokens($"text")).as("t"))
      .groupBy("doc_id").count()
    val fused = q.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaExplode.collect().foreach { r =>
      assert(fused(r.getLong(0)) == r.getLong(1).toInt, s"doc ${r.getLong(0)}")
    }
  }

  test("raw SQL idiom rewrites too (no code change for SQL users)") {
    docsDf.createOrReplaceTempView("tf_docs")
    val q = spark.sql(
      "SELECT size(array_remove(split(text, ' '), '')) AS n FROM tf_docs")
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_text_stats"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.agg(sum($"n")).head().getLong(0) > 0)
  }

  test("null text stays null; non-space split patterns do NOT fuse") {
    val dir = TempDirs.create("graft-tokenfuse")
    Seq(Some("a b  c"), None).toDF("text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val fused = df.select(Text.tokenCountWs($"text").as("n")).collect()
    assert(fused(0).getInt(0) == 3 || fused(1).getInt(0) == 3)
    assert(fused.exists(_.isNullAt(0)), "null row must stay null")
    val other = df.select(size(array_remove(split($"text", ","), "")).as("n"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_text_stats"))
  }
}
