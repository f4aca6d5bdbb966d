package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q41 minhash: identical token sets always share every band") {
    // jaccard=1 docs must collide in ALL bands — LSH can never miss them.
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("doc_id", "text")
      .select($"doc_id", expr("array_distinct(filter(split(lower(text), ' '), x -> x <> ''))").as("w"))
      .select($"doc_id", expr(
        "transform(sequence(0, 3), i -> array_min(transform(w, u -> md5(concat(cast(i AS STRING), ':', u)))))").as("sigs"))
    val Array(a, b) = df.orderBy("doc_id").collect()
    assert(a.getSeq[String](1) == b.getSeq[String](1))
  }

  test("merge existing-wins never updates an existing row") {
    val existing = Seq(("t1", "old")).toDF("title", "v")
      .withColumn("source_rank", lit(-1)).withColumn("ingest_idx", lit(0))
    val batch = Seq(("t1", "new"), ("t2", "fresh")).toDF("title", "v")
      .withColumn("source_rank", lit(0))
      .withColumn("ingest_idx", monotonically_increasing_id().cast("int"))
    val merged = operators.Ingest.mergeExistingWins(existing, batch)
    val m = merged.select("title", "v").as[(String, String)].collect().toMap
    assert(m == Map("t1" -> "old", "t2" -> "fresh"))
  }

  test("simhash of identical texts is identical; of disjoint texts differs") {
    val sim = Seq((1L, "one two three"), (2L, "one two three"), (3L, "xx yy zz qq"))
      .toDF("doc_id", "text")
      .select($"doc_id", expr("filter(split(lower(text), ' '), x -> x <> '')").as("w"))
      .select($"doc_id", expr(
        """aggregate(sequence(1, 16), 0L, (acc, j) -> acc +
          |CASE WHEN aggregate(w, 0, (a2, u) ->
          |a2 + CASE WHEN ascii(substring(md5(u), j, 1)) % 2 = 1 THEN 1 ELSE -1 END) > 0
          |THEN shiftleft(1L, j - 1) ELSE 0L END)""".stripMargin.replace("\n", " ")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sim(1L) == sim(2L))
    assert(sim(1L) != sim(3L))
  }
}
