package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Kafka

/** Kafka envelope normalization (O2-O4 + quirk Q7): CDC insert filter,
  * per-topic field mapping, strftime-vs-raw time handling — tested on
  * literal JSON envelopes (the broker itself needs the connector jar,
  * absent here; normalize is the whole deserialization semantics). */
class KafkaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("NEEQ topic: insert kept + formatted time; $set update and o-less doc dropped") {
    val values = Seq(
      """{"o": {"st_name": "甲公司", "st_code": "830001", "title": "债券临时报告",
            "publish_date": "2024-01-02T03:04:05.000Z", "url": "http://x/1"}}""",
      """{"o": {"st_name": "乙公司", "st_code": "830002", "title": "t",
            "publish_date": "2024-01-02T03:04:05.000Z", "url": "u", "$set": "price"}}""",
      """{"o": {"st_name": "丁公司", "st_code": "830003", "title": "t2",
            "publish_date": "2024-01-02T03:04:05.000Z", "url": "u2",
            "$set": {"title": "updated"}}}""",
      """{"op": "n"}"""
    ).toDF("value")
    val got = Kafka.normalize(Kafka.Neeq)(values).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[String]("cmpShortName") == "甲公司")
    assert(r.getAs[String]("cmpCode") == "830001")
    assert(r.getAs[String]("title") == "债券临时报告")
    assert(r.getAs[String]("pubTime") == "2024-01-02 03:04:05") // strftime (kafka_s.py:181)
    assert(r.getAs[String]("srcUrl") == "http://x/1")
    assert(r.getAs[String]("srcType") == "新三板公告")
  }

  test("A-share topic: different field names, etl_time passed RAW (kafka_a.py:183)") {
    val values = Seq(
      """{"o": {"stock_name": "丙公司", "stock_code": "600001", "title": "年报",
            "etl_time": "2024-03-04 05:06:07", "url": "http://x/2"}}"""
    ).toDF("value")
    val r = Kafka.normalize(Kafka.AShare)(values).collect()(0)
    assert(r.getAs[String]("cmpShortName") == "丙公司")
    assert(r.getAs[String]("pubTime") == "2024-03-04 05:06:07") // no reformat
    assert(r.getAs[String]("srcType") == "A股公告")
  }
}
