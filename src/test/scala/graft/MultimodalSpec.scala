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

  test("frame sampling respects the stride") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sfDir))
    val frames = Multimodal.frameSample(media, 4)
      .select("frame_idx").as[Int].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 4 == 0))
  }
}
