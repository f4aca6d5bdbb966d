package graft

import graft.operators.Ingest
import graft.sources.Articles
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** K1 CSV sink parity: the reference persists the article table as CSV,
  * which stringifies list columns (SURVEY.md §1.1). Our canonical CSV form
  * projects arrays to joined strings explicitly (no pandas repr-strings),
  * writes with header, and re-reads with a pinned schema — no inference.
  */
class CsvRoundTripSpec extends AnyFunSuite with SparkSuite {

  test("article table CSV round-trip preserves the projected string form") {
    val merged = Ingest.flattenInstitutions(
      Ingest.mergeExistingWins(
        Articles.existingStore(spark),
        Ingest.dedupByTitle(Ingest.unionSources(spark, Articles.allSources, Seq("t")))))
    val csvForm = merged.select(
      col("title"), col("source"), col("year"),
      array_join(col("authors"), "; ").as("authors"),
      col("insts"))
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    csvForm.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("title", StringType), StructField("source", StringType),
      StructField("year", StringType), StructField("authors", StringType),
      StructField("insts", StringType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    // CSV writes "" for empty strings as null on read — normalize both sides
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.map(c => coalesce(col(c), lit("")).as(c)): _*)
    assert(norm(csvForm).exceptAll(norm(back)).count() == 0)
    assert(norm(back).exceptAll(norm(csvForm)).count() == 0)
    assert(back.count() == 8)
  }
}
