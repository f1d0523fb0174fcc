package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: latest at-or-before, ties eligible, miss →
  * null, per-key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("backward as-of: latest <=, tie included, no-prior => null, keys isolated") {
    val left = Seq(
      (100L, 1L, 50L),  // before any right row for key 1 -> null
      (101L, 1L, 100L), // exactly at right ts 100 -> that row (tie eligible)
      (102L, 1L, 150L), // between 100 and 200 -> 100's payload
      (103L, 1L, 250L), // after 200 -> 200's payload
      (104L, 2L, 999L)  // key 2 has no right rows -> null
    ).toDF("event_id", "user_id", "us")
    val right = Seq(
      (900L, 1L, 100L),
      (901L, 1L, 200L)
    ).toDF("event_id", "user_id", "us")

    val got = AsOfJoin.asofBackward(left, right,
        key = "user_id", time = "us", tiebreak = "event_id", payloadCol = "event_id")
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(got(100L).isEmpty)
    assert(got(101L).contains(900L))
    assert(got(102L).contains(900L))
    assert(got(103L).contains(901L))
    assert(got(104L).isEmpty)
  }
}
