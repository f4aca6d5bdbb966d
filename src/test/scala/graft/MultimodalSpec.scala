package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("mapPartitions decode equals the expression-based twin (q80)") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sfDir))
    val decoded = Multimodal.decodeBatch(media.as[Multimodal.MediaRecord])
      .select("media_id", "n_bytes", "width", "height", "format")
    val twin = SparkEntry.queries("q80_multimodal_meta")(spark, sfDir)
      .select("media_id", "n_bytes", "width", "height", "format")
    assert(decoded.exceptAll(twin).count() == 0)
    assert(twin.exceptAll(decoded).count() == 0)
  }

  test("decode and expression twin agree on NON-ASCII payloads") {
    // r1 advice: the twin uses ascii(first char of UTF-8 decode); decodeOne
    // must match on payloads whose text starts with a non-ASCII character.
    val docs = Seq(
      (1L, "héllo world"), (2L, "日本語のテキスト"), (3L, "ascii start"), (4L, ""))
      .toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs)
    val decoded = Multimodal.decodeBatch(media.as[Multimodal.MediaRecord])
      .select($"media_id", $"height").as[(Long, Int)].collect().toMap
    val twin = media.selectExpr("media_id",
      "CASE WHEN length(payload) > 0 THEN ascii(substring(cast(payload AS STRING), 1, 1)) ELSE 0 END AS h")
      .as[(Long, Int)].collect().toMap
    assert(decoded == twin)
    assert(decoded(2L) == "日".codePointAt(0)) // genuinely non-ASCII, not byte 0xE6
  }

  test("frame sampling respects the stride") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sfDir))
    val frames = Multimodal.frameSample(media, 4)
      .select("frame_idx").as[Int].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 4 == 0))
  }
}
