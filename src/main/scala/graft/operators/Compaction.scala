package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance pass every long-lived
  * 100 TB table needs: streaming sinks and fine-grained partition
  * writes accumulate files far below the scan-efficient size (each one
  * costs a task launch, a footer read, and metadata-store pressure);
  * compaction rewrites them into ~target-size files.
  *
  * `coalesce`, not `repartition`: reducing file count needs no row
  * redistribution, so the rewrite is a zero-shuffle read→write whose
  * cost is one pass over the data. The trade: coalesced output files
  * inherit input skew (they are unions of input splits, not balanced
  * shards). When balanced sizes or clustering matter more than the
  * shuffle, the range-clustered write (p24, `repartitionByRange` +
  * `sortWithinPartitions`) is the same pass with both added.
  *
  * File count derives from MEASURED bytes (data files on disk), not
  * row counts — compression ratio varies per column/page, so sizing
  * from rows would systematically over- or under-shoot.
  */
object Compaction {

  /** Bytes in the directory tree's parquet data files (excludes
    * _SUCCESS and other markers). Recursive walk, so a PARTITIONED
    * table (data files under key=value subdirectories) measures its
    * real size — a flat listing would see 0 bytes and silently size
    * every compaction to one file (ADVICE r8). */
  def dataBytes(dir: String): Long = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    finally s.close()
  }

  /** Number of parquet data files in the directory tree (recursive,
    * same contract as [[dataBytes]]). */
  def dataFileCount(dir: String): Int = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .count(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    finally s.close()
  }

  /** Compact `srcDir` into `destDir` at ~`targetBytes` per output
    * file; returns the target file count. */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      targetBytes: Long): Int = {
    val n = math.max(1L,
      (dataBytes(srcDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcDir).coalesce(n)
      .write.mode("overwrite").parquet(destDir)
    n
  }
}
