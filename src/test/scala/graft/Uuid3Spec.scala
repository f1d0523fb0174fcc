package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Ids, Uuid3}

/** Byte-exactness of the uuid3 expression against CPython goldens:
  * `uuid.uuid3(uuid.NAMESPACE_DNS, s).hex` (kafka_s.py:460-468). */
class Uuid3Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val goldens = Seq(
    "hello" -> "0bacede440143f9db720173f68a1c933",
    "abc|xyz" -> "73b88915b3cc35fc8e80bc3581d3ba7e",
    "新三板公告标题|http://u|2019-01-01 00:00:00" ->
      "bc4d18985dff35d9b8bed0f2c05823e9")

  test("uuid3(NAMESPACE_DNS, s) matches CPython, direct eval") {
    goldens.foreach { case (in, want) =>
      assert(Uuid3.hexNoDash(Uuid3.NamespaceDns.toArray,
        in.getBytes("UTF-8")) == want)
    }
  }

  test("uuid3 through the DataFrame/codegen path") {
    import spark.implicits._
    val got = goldens.map(_._1).toDF("s")
      .select(Ids.uuid3(col("s")).as("u")).collect().map(_.getString(0)).toSeq
    assert(got == goldens.map(_._2))
  }

  test("namespace-free variant = md5 with v3 version/variant bits") {
    // hashlib golden for 'the fast key|src0'
    assert(Uuid3.hexNoDash(Array.emptyByteArray,
      "the fast key|src0".getBytes("UTF-8")) == "337c95c12c453dc788a51d6d925a5e1b")
  }

  test("null input => null output") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("hello")).toDF("s")
      .select(Ids.uuid3(col("s")).as("u")).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) == goldens.head._2)
  }
}
