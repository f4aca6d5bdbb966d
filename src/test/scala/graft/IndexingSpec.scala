package graft

import graft.operators.Indexing.{globalIndex, globalPrefixSum}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("idx is the contiguous 0..n-1 ordinal of the key order, under skew") {
    // Heavily clustered keys (90% in one narrow range) — the range
    // exchange still has to produce the exact global ordinal.
    val keys = (1L to 900L).map(_ % 7L * 1000000L + 1L) ++ (901L to 1000L).map(_ * 17L)
    val df = keys.zipWithIndex.map { case (k, i) => (k * 100000L + i, s"v$i") }.toDF("k", "v")
    val got = globalIndex(df, Seq(col("k"))).select("k", "idx").as[(Long, Long)].collect()
    val expected = got.map(_._1).sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toMap
    assert(got.length == 1000)
    assert(got.forall { case (k, i) => expected(k) == i })
  }

  test("matches the naive single-partition window exactly") {
    val df = Tables.documents(spark, sfDir).select("doc_id")
    val fast = globalIndex(df, Seq(col("doc_id"))).select("doc_id", "idx")
      .as[(Long, Long)].collect().sortBy(_._1)
    val naive = df.withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("doc_id")).cast("long") - 1L)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(fast.sameElements(naive))
  }

  test("empty input yields empty output with the idx column") {
    val out = globalIndex(Seq.empty[(Long, String)].toDF("k", "v"), Seq(col("k")))
    assert(out.columns.contains("idx") && out.isEmpty)
  }

  test("globalPrefixSum matches the naive running-sum window, NULLs count as 0") {
    val df = Seq((5L, Some(3L)), (1L, Some(10L)), (3L, None), (2L, Some(7L)), (4L, Some(1L)))
      .toDF("k", "v")
    val got = globalPrefixSum(df, Seq(col("k")), col("v"))
      .select("k", "run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 17L), (3L, 17L), (4L, 18L), (5L, 21L)))
  }

  test("globalPrefixSum: empty input, and run-column collision is rejected") {
    val out = globalPrefixSum(Seq.empty[(Long, Long)].toDF("k", "v"), Seq(col("k")), col("v"))
    assert(out.columns.contains("run") && out.isEmpty)
    val bad = Seq((1L, 2L)).toDF("k", "RUN") // case-insensitive, like Spark resolution
    assertThrows[IllegalArgumentException] {
      globalPrefixSum(bad, Seq(col("k")), col("k"))
    }
  }
}
