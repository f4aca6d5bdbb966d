package graft

import graft.operators.EventWindows
import graft.streaming.StreamingTwin
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkSuite {

  // shared staging for the stateless document-transform twins: the file
  // stream source wants a directory; the schema mirrors documents.parquet
  private lazy val docSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
  }
  private def stagedDocsDir(prefix: String): String = {
    val stage = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      stage.resolve("documents.parquet"))
    stage.toString
  }

  test("streaming tumbling aggregation equals the batch query") {
    val stream = StreamingTwin.runTumblingDemo(spark, sfDir)
    val batch = EventWindows.tumbling(Tables.events(spark, sfDir))
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("streaming sliding-window aggregation equals the batch query") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files.createTempDirectory("graft_sliding_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val raw = StreamingTwin.fixTs(spark.readStream
      .schema(StreamingTwin.eventReadSchema(spark, sfDir))
      .parquet(stage.toString))
    val q = EventWindows.slidingAgg(raw.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sliding_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("sliding_stream")
    val batch = EventWindows.sliding(Tables.events(spark, sfDir))
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("streaming chunking equals the batch query (stateless corpus transform)") {
    import org.apache.spark.sql.streaming.Trigger
    val streamed = graft.operators.Corpus.chunkTokens(
      spark.readStream.schema(docSchema).parquet(stagedDocsDir("graft_stream_docs")))
    val q = streamed.writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("chunk_stream")
    val batch = graft.operators.Corpus.chunkTokens(Tables.documents(spark, sfDir))
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("streaming quality gate equals the batch query") {
    import org.apache.spark.sql.streaming.Trigger
    val q = graft.operators.Corpus.qualityGate(
        spark.readStream.schema(docSchema).parquet(stagedDocsDir("graft_stream_gate")))
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("gate_stream")
    val batch = graft.operators.Corpus.qualityGate(Tables.documents(spark, sfDir))
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("stream-stream interval join equals the batch join") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val raw = StreamingTwin.eventStream(spark, sfDir)
    val views = raw.filter(col("event_type") === "view").withWatermark("ts", "10 minutes")
    val clicks = raw.filter(col("event_type") === "click").withWatermark("ts", "10 minutes")
    val q = StreamingTwin.clickViewJoin(views, clicks)
      .writeStream.outputMode("append").format("memory")
      .queryName("interval_join_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("interval_join_stream")
    val ev = Tables.events(spark, sfDir)
    val batch = StreamingTwin.clickViewJoin(
      ev.filter(col("event_type") === "view"), ev.filter(col("event_type") === "click"))
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("dropDuplicatesWithinWatermark collapses a replayed source to distinct ids") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    // Stage the events file TWICE — every event arrives as its own exact
    // duplicate (same id, same event time), the replay/at-least-once
    // ingestion shape this operator exists for.
    val stage = java.nio.file.Files.createTempDirectory("graft_dupe_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), stage.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), stage.resolve("b.parquet"))
    val raw = StreamingTwin.fixTs(spark.readStream
      .schema(StreamingTwin.eventReadSchema(spark, sfDir))
      .parquet(stage.toString))
    val q = StreamingTwin.dedupWithinWatermarkStream(raw)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_wm_stream")
    val distinctIds = Tables.events(spark, sfDir).select("event_id").distinct().count()
    assert(got.count() == distinctIds)
    assert(got.select("event_id").distinct().count() == distinctIds)
  }

  test("foreachBatch upsert sink converges to the batch merge across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def articles(rows: Seq[(String, String, String, Int, Int)]) =
      rows.toDF("source", "title", "abstract", "source_rank", "ingest_idx")
        .select($"source", $"title", $"abstract", lit("u").as("url"),
          typedLit(Seq.empty[String]).as("authors"),
          typedLit(Seq.empty[Seq[String]]).as("institutions"),
          typedLit(Seq.empty[String]).as("keywords"),
          lit("t").as("term"), lit("2030").as("year"),
          $"source_rank", $"ingest_idx")
    val b1 = articles(Seq(("S1", "A", "first", 0, 0), ("S1", "B", "b", 0, 1)))
    val b2 = articles(Seq(("S2", "A", "replayed dup", 0, 0), ("S2", "C", "c", 0, 1)))
    // Stage as two single-file batches with ordered mtimes so the file
    // source delivers b1 then b2 as separate micro-batches.
    val stage = java.nio.file.Files.createTempDirectory("graft_upsert_src")
    def copyOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      val dst = stage.resolve(name)
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 120000
    copyOne(b1, "batch1.parquet", t0)
    copyOne(b2, "batch2.parquet", t0 + 60000)
    val store = java.nio.file.Files.createTempDirectory("graft_upsert_store").toString + "/articles"
    val src = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    StreamingTwin.upsertSink(spark, src, store)
    val got = spark.read.parquet(store).select("title", "source", "abstract")
      .as[(String, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set("A", "B", "C"))
    // Existing wins: the replayed duplicate of A in the LATER micro-batch
    // must not overwrite the stored row from the first.
    assert(got("A") == (("S1", "first")))
    assert(got("C")._1 == "S2")
  }
}
