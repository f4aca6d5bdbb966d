package graft

import graft.operators.Indexing.globalIndex
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
}
