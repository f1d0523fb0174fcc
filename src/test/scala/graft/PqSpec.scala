package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq
import graft.sources.Tables

/** Product-quantization invariants independent of the DuckDB oracle:
  * per-subspace encoding really is the lowest-index cosine argmax
  * against the refined codebooks, every output ADC score re-derives
  * exactly from (codes, lookup table), the probe itself attains the
  * maximum possible ADC score (it maximizes every LUT term by
  * construction), and any micro-batched ingest drains to the identical
  * code table as the batch encode. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def collectCodebooks(c1: Seq[org.apache.spark.sql.DataFrame])
      : Seq[Map[Int, Seq[Double]]] = {
    import spark.implicits._
    c1.map(_.as[(Int, Seq[Double])].collect().toMap)
  }

  test("codes match a driver-side per-subspace argmax (ties to lowest centroid)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val (c1, codesDf) = Pq.train(emb)
    val books = collectCodebooks(c1)
    val codes = codesDf.as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    val subs = Pq.prepare(emb)
      .select(col("vec_id"), col("qe0"), col("qe1"), col("qe2"), col("qe3"))
      .as[(Long, Seq[Double], Seq[Double], Seq[Double], Seq[Double])].collect()
    assert(subs.nonEmpty && codes.size == subs.length)
    subs.foreach { case (id, q0, q1, q2, q3) =>
      val qs = Seq(q0, q1, q2, q3)
      (0 until Pq.M).foreach { m =>
        val scores = (0 until Pq.K).map(j =>
          books(m).get(j).map(c => cos(qs(m), c))
            .getOrElse(Double.NegativeInfinity))
        val expected = scores.indexOf(scores.max) // first max = lowest index
        assert(codes(id)(m) == expected,
          s"vec $id subspace $m: got ${codes(id)(m)}, want $expected")
      }
    }
  }

  test("ADC output: exactly TopK ranks per probe, scores re-derive from codes + LUT, " +
      "and the probe itself attains the per-probe maximum") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val prepared = Pq.prepare(emb)
    val (c1, codesDf) = Pq.train(emb)
    val lut = Pq.probeLut(Pq.corpusProbes(prepared), c1)
      .collect().map { r =>
        r.getLong(0) -> (for (m <- 0 until Pq.M; j <- 0 until Pq.K)
          yield (m, j) -> r.getDouble(1 + m * Pq.K + j)).toMap
      }.toMap
    val codes = codesDf.as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    def adcPpm(p: Long, cs: Seq[Int]): Long = {
      var acc = 0.0
      (0 until Pq.M).foreach(m => acc += lut(p)((m, cs(m))))
      math.floor(acc * 1000000.0).toLong
    }
    val full = Pq.adcTopK(codesDf, Pq.probeLut(Pq.corpusProbes(prepared), c1))
      .select(col("probe_id"), col("rk"), col("vec_id"),
        col("code0"), col("code1"), col("code2"), col("code3"),
        col("adc_ppm"))
      .as[(Long, Int, Long, Int, Int, Int, Int, Long)].collect()
    val byProbe = full.groupBy(_._1)
    assert(byProbe.keySet == lut.keySet)
    byProbe.foreach { case (p, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to Pq.TopK), s"probe $p ranks")
    }
    full.foreach { case (p, _, vid, a, b, c, d, ppm) =>
      assert(ppm == adcPpm(p, Seq(a, b, c, d)),
        s"probe $p vec $vid: adc_ppm $ppm != re-derived ${adcPpm(p, Seq(a, b, c, d))}")
    }
    // the probe maximizes every LUT term through its own argmax codes,
    // so rank 1 must carry ADC(p -> p)
    full.groupBy(_._1).foreach { case (p, rows) =>
      val rank1 = rows.find(_._2 == 1).get._8
      assert(rank1 == adcPpm(p, codes(p)), s"probe $p rank-1 score")
    }
  }

  test("micro-batched ingest encodes to the identical code table as batch " +
      "(stateless append, order-independent)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = TempDirs.create("pq-stream")
    // two files -> two micro-batches under maxFilesPerTrigger=1
    emb.where(col("vec_id") % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    emb.where(col("vec_id") % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    // model lineage already checkpointed by Pq.recomputeAll
    val (model, batchCodes) = Pq.train(emb)
    val streamed = graft.streaming.StreamQueries.runToTable(spark,
      Pq.assignAll(Pq.prepare(
        spark.readStream.schema(spark.read.parquet(dir).schema)
          .option("maxFilesPerTrigger", 1).parquet(dir)), model)
        .select(col("vec_id"), col("code0"), col("code1"),
          col("code2"), col("code3")),
      "append")
    val got = streamed.as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    val want = batchCodes.as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(got.length > 0 && got.toSeq == want.toSeq)
  }
}
