package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC source/sink parity (§2.1 extension): Spark ships the ORC
  * datasource natively, and a 100 TB lake standardized on ORC should get
  * the same layout + pruning story as the parquet landings. Proven here:
  * exact round-trips for both corpus shapes (flat strings AND the
  * array<float> embedding column), the writeOrderedOrc disjoint-range
  * layout contract, and filter pushdown reaching the ORC scan.
  */
class OrcRoundTripSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("documents and embeddings round-trip through ORC exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").orc(s"$out/docs")
    val docsBack = spark.read.orc(s"$out/docs")
    assert(docsBack.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    assert(docs.exceptAll(docsBack).count() == 0)
    assert(docsBack.exceptAll(docs).count() == 0)
    // the typed column shape: array<float> must survive exactly
    val emb = Tables.embeddings(spark, sfDir)
    emb.write.mode("overwrite").orc(s"$out/emb")
    val embBack = spark.read.orc(s"$out/emb")
    assert(embBack.schema.map(f => (f.name, f.dataType)) ==
      emb.schema.map(f => (f.name, f.dataType)))
    assert(emb.exceptAll(embBack).count() == 0)
    assert(embBack.exceptAll(emb).count() == 0)
  }

  test("writeOrderedOrc lands disjoint sorted key ranges and the scan prunes by pushed filters") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc_ord")
      .resolve("docs").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    graft.sources.Sinks.writeOrderedOrc(docs, Seq(col("doc_id")), out, Some(4))
    val back = spark.read.orc(out)
    assert(back.count() == docs.count())
    // files hold mutually disjoint doc_id ranges (the writeOrdered
    // contract, format-independent)
    val ranges = back.select(input_file_name().as("f"), $"doc_id")
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(v => (v.map(_._2).min, v.map(_._2).max))
      .values.toSeq.sortBy(_._1)
    assert(ranges.size > 1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlapping file ranges $hi >= $lo")
      case _ => ()
    }
    // predicate pushdown reaches the ORC scan — the property that makes
    // the format a peer of parquet at scale, not just a serializer
    val plan = back.filter($"doc_id" === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      plan.take(600))
  }
}
