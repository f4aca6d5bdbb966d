package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("K3 PNG sink: q77's weight table renders to a real PNG that round-trips dims and exact luma") {
    import graft.operators.MediaCodec
    val rows = SparkEntry.queries("q77_wordcloud_weights")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val out = java.nio.file.Files.createTempDirectory("graft_png_sink")
      .resolve("wordcloud.png").toString
    Sinks.writeWeightStripPng(rows, out)
    val meta = MediaCodec.parseImage(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)))
    assert(meta.format == "png" && meta.width == 256 && meta.height == rows.length * 8)
    // the documented rendering contract, recomputed closed-form
    val maxW = rows.map(_._2).max.toDouble
    val expected = rows.zipWithIndex.map { case ((_, wt), i) =>
      val fill = math.round(256 * wt / maxW).toInt
      8L * (fill.toLong * (224 - (i * 13) % 160) + (256L - fill) * 16L)
    }.sum
    assert(meta.graySum == expected, "PNG luma must equal the rendering contract exactly")
  }

  test("writeOrdered: disjoint sorted key ranges across files, no single-writer funnel") {
    val out = java.nio.file.Files.createTempDirectory("graft_ordered").toString
    val df = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    Sinks.writeOrdered(df, Seq(col("doc_id")), out, numFiles = Some(4))
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length > 1, "range layout must produce multiple files")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select("doc_id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"file $f not internally sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "file key ranges must be disjoint")
      case _ =>
    }
    // Round trip is lossless.
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("writeHivePartitioned: partition pruning at read, per-file row cap respected") {
    val out = java.nio.file.Files.createTempDirectory("graft_hivepart").toString
    Sinks.writeHivePartitioned(
      Tables.documents(spark, sfDir), Seq("lang"), out, maxRecordsPerFile = 50L)
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().as[String].collect()
    assert(langs.length > 1)
    val one = langs.min
    val scan = spark.read.parquet(out).filter(col("lang") === one)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan.take(600))
    val files = scan.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains(s"lang=$one")))
    // The row cap bounds every physical file.
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count().as[(String, Long)].collect()
    assert(perFile.forall(_._2 <= 50L), perFile.maxBy(_._2).toString)
  }
}
