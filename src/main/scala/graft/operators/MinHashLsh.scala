package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** MinHash + LSH near-duplicate detection (Broder '97 resemblance
  * sketches; banding per Leskovec/Rajaraman/Ullman MMDS ch.3).
  *
  * Scale shape: signatures are computed in one scan (k seeded hashes per
  * shingle set, map-side only); banding explodes each doc into b rows;
  * candidate generation is an equi-join on (band, key) — the only
  * shuffle, partitioned by band key, no global cross join. Candidates
  * are then verified with exact Jaccard, so precision is 1.0 and recall
  * is the LSH S-curve: P(detect) = 1-(1-j^r)^b (≈1 for j≥0.9 at
  * r=2,b=8).
  *
  * Hash = md5("<seed>|<shingle>") with the lexicographic min as the
  * sketch component — engine-portable and deterministic; at production
  * scale swap in xxhash64 (same structure, cheaper per byte).
  */
object MinHashLsh {

  /** k-component MinHash signature of a shingle-set column. */
  def signature(shingleSet: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleSet, sh => md5(concat(lit(s"$i|"), sh))))): _*)

  /** Near-dup pairs: LSH candidates (any equal band) verified with exact
    * Jaccard >= threshold. Output: a_id, b_id, jaccard. */
  def nearDupPairs(docs: DataFrame, id: String, text: String,
      k: Int = 16, r: Int = 2, threshold: Double = 0.55): DataFrame = {
    require(k % r == 0, "k must be a multiple of band width r")
    val b = k / r
    val withSig = docs
      .select(col(id), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0) // empty sets would band-collide globally
      .withColumn("sig", signature(col("sset"), k))

    val banded = withSig.select(
      col(id), col("sset"),
      explode(array((0 until b).map(bi => struct(
        lit(bi).as("band"),
        concat_ws("|", slice(col("sig"), bi * r + 1, r)).as("key"))): _*)).as("bk"))
      .select(col(id), col("sset"), col("bk.band"), col("bk.key"))

    val a = banded.as("a")
    val bb = banded.as("b")
    val candidates = a.join(bb,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("a_id"), col(s"b.$id").as("b_id"),
        col("a.sset").as("a_set"), col("b.sset").as("b_set"))
      .dropDuplicates("a_id", "b_id")

    val jac = size(array_intersect(col("a_set"), col("b_set"))).cast("double") /
      size(array_union(col("a_set"), col("b_set")))
    candidates
      .select(col("a_id"), col("b_id"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
