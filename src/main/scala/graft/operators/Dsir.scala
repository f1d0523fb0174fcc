package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** DSIR importance weighting (Xie et al. '23, "Data Selection for
  * Language Models via Importance Resampling") in integer-exact form:
  * hashed 64-bucket token features, Laplace-smoothed target (the
  * English slice) vs raw-corpus distributions, probabilities quantized
  * to integer ppb BEFORE scoring so no float log/div crosses an engine
  * boundary. Shared by n60 (batch scoring) and s27 (the model served
  * over a stream). */
object Dsir {

  val Buckets = 64

  /** Hashed feature bucket of a token column/lambda variable. */
  def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int") % Buckets

  /** Train the 64-row bucket→ratio_ppm model from a documents frame —
    * the corpus-sized work (one explode + three bucket aggregates);
    * the result is model-sized and broadcasts/collects freely. */
  def ratioModel(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), col("lang"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("b", bucket(col("tok")))
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tok.where(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tot = tok.agg(count(lit(1)).as("crt"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ctt"))
    raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        expr(s"(ct + 1) * 1000000000 div (ctt + $Buckets)").as("pt_ppb"),
        expr(s"(cr + 1) * 1000000000 div (crt + $Buckets)").as("pr_ppb"))
      .select(col("b"),
        expr("pt_ppb * 1000000 div greatest(pr_ppb, 1)").as("ratio_ppm"))
  }

  /** The trained model as a LITERAL map column (≤64 entries — the
    * model-serving broadcast idiom, like the s14 centroid table and
    * the n44 packed bitset): lets a stream score each document with a
    * pure per-row HOF expression, no join, no explode, no state. */
  def ratioMapLiteral(model: DataFrame): Column = {
    val rows = model.collect()
    map(rows.toSeq.flatMap(r =>
      Seq(lit(r.getInt(0)), lit(r.getLong(1)))): _*)
  }
}
