package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale note: at 100 TB each of these would be a partitioned parquet/iceberg
  * location; `spark.read.parquet(dir)` already scales — Catalyst prunes
  * partitions and pushes filters/projections into the scan, so every query in
  * this library states *what* it reads and lets the scan node minimize IO.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy long mode) and floor-divide to
    * microseconds — the exact truncation DuckDB applies when it reads the
    * same column, so event-time queries hash-match the oracle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** S6 missing-store guard (article_querry.py:5-11: a missing
    * raw_articles.csv yields an EMPTY frame, not a crash — queries over a
    * store that hasn't been written yet return no rows). Schema-pinned so
    * downstream selects/filters still resolve. */
  def tableOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** `documents` with PERSISTED lowercased columns (`text_lc`, `source_lc`),
    * materialized once per source dir — the ingest-time mitigation for the
    * reference's hottest query path (case-insensitive contains,
    * article_querry.py:13-27). A filter on `lower(text)` can never reach
    * the scan (the function call hides the attribute); a plain `contains`
    * on a stored column translates to IsNotNull + StringContains in
    * `PushedFilters`, so row groups can be skipped and the predicate runs
    * inside the scan. At 100 TB this is a generated column written by the
    * ingest job — one-time cost, paid back by every subsequent query.
    * (PlanShapeSpec pins the pushed-filter plan shape.)
    *
    * Single-writer per JVM (synchronized); cross-JVM safe via
    * stage-then-atomic-rename, and an existing materialization is reused.
    */
  def preparedDocuments(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Paths.get(sys.props("java.io.tmpdir"), "graft-prepared")
    val out = base.resolve(dir.replaceAll("[^a-zA-Z0-9.]", "_"))
    this.synchronized {
      if (!Files.exists(out.resolve("_SUCCESS"))) {
        val stage = Paths.get(out.toString + ".stage")
        documents(spark, dir)
          .withColumn("text_lc", lower(col("text")))
          .withColumn("source_lc", lower(col("source")))
          .write.mode("overwrite").parquet(stage.toString)
        if (Files.exists(out))
          Files.walk(out).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
        Files.move(stage, out, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    spark.read.parquet(out.toString)
  }
}
