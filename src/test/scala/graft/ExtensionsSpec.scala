package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ids

/** The SQL-function surface registered by GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("graft_dot evaluates the left-fold dot product from SQL") {
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("graft_uuid3 from SQL == Ids.uuid3 from the Column API") {
    import spark.implicits._
    val viaSql = spark.sql("SELECT graft_uuid3('announcement-42') AS u")
      .collect()(0).getString(0)
    val viaApi = Seq("announcement-42").toDF("s")
      .select(Ids.uuid3(col("s"))).collect()(0).getString(0)
    assert(viaSql == viaApi)
  }

  test("graft_shingle_set and graft_minhash_sig compose in selectExpr") {
    import spark.implicits._
    val row = Seq("a b c d e").toDF("text")
      .selectExpr("graft_minhash_sig(graft_shingle_set(text)) AS sig")
      .as[Seq[Long]].collect()(0)
    assert(row.length == 32)
  }

  test("graft_bson_to_json and graft_winnow are SQL-reachable") {
    import spark.implicits._
    // {"hello":"world"} per the bsonspec.org front-page example
    val json = spark.sql(
      "SELECT graft_bson_to_json(X'160000000268656C6C6F0006000000776F726C640000') AS j")
      .as[String].collect()(0)
    assert(json == """{"hello":"world"}""")
    val sel = spark.sql("SELECT graft_winnow('a b c d e f g') AS s")
      .as[Seq[String]].collect()(0)
    assert(sel.nonEmpty && sel.forall(_.length == 32))
  }

  test("bad input types fail at analysis time (ExpectsInputTypes)") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
