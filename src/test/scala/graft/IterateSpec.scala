package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Iterate

/** Iterate.cut contract (the BPE.md pathology pin): plain
  * localCheckpoint carries the source plan's estimated Statistics onto
  * the LogicalRDD, so a self-join loop compounds sizeInBytes as a
  * power tower; Iterate.cut severs the carried estimate while keeping
  * rows and blocks. The spec asserts the measurable invariant — the
  * optimized plan's sizeInBytes estimate stays BOUNDED across rounds
  * under cut, and the data is unchanged. */
class IterateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def round(df: DataFrame): DataFrame = {
    val a = df.as("a")
    val b = df.as("b")
    a.join(b, col("a.k") === col("b.k"))
      .select(col("a.k").as("k"), (col("a.v") + col("b.v")).as("v"))
  }

  private def statsOf(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  test("carried stats compound under plain localCheckpoint; Iterate.cut " +
      "keeps them bounded and rows identical") {
    val base = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("k", "v")
      .repartition(2)

    var viaCheckpoint = base.localCheckpoint(true)
    var viaCut = Iterate.cut(base, coalesceTo = None)
    val cpStats = Seq.newBuilder[BigInt]
    val cutStats = Seq.newBuilder[BigInt]
    (1 to 5).foreach { _ =>
      viaCheckpoint = round(viaCheckpoint).localCheckpoint(true)
      viaCut = Iterate.cut(round(viaCut), coalesceTo = None)
      cpStats += statsOf(viaCheckpoint)
      cutStats += statsOf(viaCut)
    }
    val cp = cpStats.result()
    val cut = cutStats.result()
    // the checkpoint path's estimate must visibly compound round over
    // round (that growth is the measured driver-stall mechanism)...
    assert(cp.last > cp.head * 1000,
      s"expected compounding carried stats, got $cp")
    // ...while the cut path's estimate stays flat across rounds
    assert(cut.distinct.size == 1, s"cut stats not constant: $cut")
    assert(cut.last < cp.last, s"cut did not sever the estimate: $cut vs $cp")
    // and the DATA is identical on both paths
    val a = viaCheckpoint.orderBy("k", "v").collect().toSeq
    val b = viaCut.orderBy("k", "v").collect().toSeq
    assert(a == b)
  }
}
