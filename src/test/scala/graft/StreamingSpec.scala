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
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("graft_sliding_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(StructType(StreamingTwin.eventSchema.fields.map(f =>
        if (f.name == "ts") StructField("ts", LongType) else f)))
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
