package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine — a single scan, no shuffle, fully
  * codegen'd (zip_with + left-fold aggregate; no UDF). The scale path is
  * LSH bucketing (SimilarityLsh) which prunes candidates before the
  * exact re-score.
  *
  * Numeric determinism: float→double casts and float-product doubles are
  * exact; the dot/norm folds are left-to-right, so any engine computing
  * the same fold order produces bit-identical doubles (the DuckDB oracle
  * unrolls the same fold).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact dyadic query vector (multiples of 0.125 — binary-exact in
    * both engines and in its SQL decimal literal form). */
  val queryVec: Seq[Double] = (0 until 64).map(i => ((i % 7) - 3) * 0.125)

  def queryVecLit: Column = array(queryVec.map(lit): _*)

  /** Brute-force cosine vs the fixture query vector. */
  def bruteForceCosine(embeddings: DataFrame): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    embeddings.select(col("vec_id"), cosine(emb, queryVecLit).as("cos"))
  }

  /** All vectors above a cosine threshold (set-deterministic). */
  def aboveThreshold(embeddings: DataFrame, t: Double): DataFrame =
    bruteForceCosine(embeddings).where(col("cos") > t)

  /** Exact top-k with deterministic tiebreak. */
  def topK(embeddings: DataFrame, k: Int): DataFrame =
    bruteForceCosine(embeddings)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
}
