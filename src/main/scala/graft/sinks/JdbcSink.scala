package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The reference's MySQL sink path (O23/O24: `mysql_yi/mysql_pool.py:
  * 114-156` pooled inserts; O25: unique-key duplicate swallow,
  * kafka_s.py:614-630) as real `batch.write.jdbc` code.
  *
  * The sandbox has no database or JDBC driver jar, so the harness
  * queries exercise the IDENTICAL foreachBatch shape against parquet
  * (`StreamQueries.sinkDedupToDir` / `upsertReplay` — both
  * oracle-verified, including idempotency under forced replay); this
  * object is the production wiring those stand-ins model. `JdbcSpec`
  * smoke-tests that the writer actually reaches Spark's JDBC layer
  * (driver resolution) rather than silently no-opping.
  *
  * Exactly-once: Structured Streaming checkpoints batch ids, so a
  * failed batch is REPLAYED — the writer must be idempotent. With a
  * PRIMARY/UNIQUE KEY on the sink table and [[keyedAppendWriter]]
  * deduping in-batch, the replayed rows hit the key constraint and the
  * DB swallows them (`INSERT IGNORE` semantics — what the reference
  * does with its try/except insert), yielding effective exactly-once.
  */
object JdbcSink {

  /** Connection + batching options (per-topic table config is data,
    * like `Kafka.TopicConfig`). */
  final case class Config(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "com.mysql.cj.jdbc.Driver",
      batchSize: Int = 500,
      isolationLevel: String = "READ_COMMITTED")

  /** foreachBatch writer: append the micro-batch to the table. One JDBC
    * connection per partition, `batchSize`-row prepared-statement
    * batches — the vectorized equivalent of the reference's row-at-a-
    * time pooled inserts. */
  def appendWriter(cfg: Config): (DataFrame, Long) => Unit = (batch, _) =>
    batch.write.mode(SaveMode.Append).format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("batchsize", cfg.batchSize.toString)
      .option("isolationLevel", cfg.isolationLevel)
      .save()

  /** O25 shape: dedup the batch on the sink's unique key first (cheap,
    * in-flight), let the DB's key constraint swallow cross-batch and
    * replayed duplicates. */
  def keyedAppendWriter(cfg: Config, key: String): (DataFrame, Long) => Unit = {
    val append = appendWriter(cfg)
    (batch, id) => append(batch.dropDuplicates(key), id)
  }
}
