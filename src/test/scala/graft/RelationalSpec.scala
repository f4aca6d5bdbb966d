package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("containsCI matches pandas na=False semantics: null never matches") {
    val df = Seq(("a", Option("Hello World")), ("b", None), ("c", Option("other")))
      .toDF("id", "txt")
    val got = df.filter(Relational.containsCI($"txt", "WORLD")).select("id")
      .as[String].collect().toSeq
    assert(got == Seq("a"))
  }

  test("dedupKeepFirst keeps the exact row dictated by the priority order") {
    val df = Seq(
      ("t1", 2, "late"), ("t1", 1, "early"),
      ("t2", 5, "only"), (null, 1, "n1"), (null, 0, "n0"))
      .toDF("title", "pri", "tag")
    val got = Relational.dedupKeepFirst(df, Seq("title"), Seq($"pri"))
      .select("tag").as[String].collect().toSet
    // nulls form one dedup group (pandas NaN-equal semantics)
    assert(got == Set("early", "only", "n0"))
  }

  test("dedupKeepFirst is idempotent") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "v")
    val once = Relational.dedupKeepFirst(df, Seq("k"), Seq($"v"))
    val twice = Relational.dedupKeepFirst(once, Seq("k"), Seq($"v"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("flagship query returns rows and only matching rows") {
    val got = Relational.flagship(spark, sfDir)
    assert(got.count() > 0)
    assert(got.filter(!lower($"text").contains("join")).count() == 0)
  }

  test("monthlyCounts (q49) emits cnt=0 rows for months with no data") {
    val gap = Seq("1995-01-10", "1995-01-20", "1995-03-05").toDF("d")
      .select(to_date(col("d")).as("o_orderdate"))
    val got = operators.Relational2.monthlyCounts(gap, "o_orderdate", "1995-01-01", "1995-03-01")
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("1995-01-01"), 2L),
      (java.sql.Date.valueOf("1995-02-01"), 0L),
      (java.sql.Date.valueOf("1995-03-01"), 1L)))
  }

  test("tableOrEmpty: missing store queries as an empty schema-pinned frame (S6)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("title", StringType), StructField("year", StringType)))
    val df = Tables.tableOrEmpty(spark, "/tmp/graft-definitely-missing.parquet", schema)
    // downstream operations still resolve and return no rows, like the
    // reference's empty-DataFrame fallback (article_querry.py:5-11)
    assert(df.filter(Relational.containsCI(col("title"), "x")).count() == 0)
    assert(df.schema == schema)
    // and an existing path reads normally through the same call
    val real = Tables.tableOrEmpty(spark, s"$sfDir/documents.parquet",
      Tables.documents(spark, sfDir).schema)
    assert(real.count() > 0)
  }
}
