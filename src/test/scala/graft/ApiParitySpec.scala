package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** API-surface parity checks: the dedicated APIs produce the same results
  * as the expression formulations the oracle queries use.
  */
class ApiParitySpec extends AnyFunSuite with SparkSuite {

  test("RelationalGroupedDataset.pivot equals the conditional-agg form (q17)") {
    val viaPivot = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(when(lit(true), col("o_totalprice")).otherwise(0)), 2))
      .na.fill(0.0)
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
    val viaCase = SparkEntry.queries("q17_conditional_agg")(spark, sfDir)
    assert(viaPivot.exceptAll(viaCase).count() == 0)
    assert(viaCase.exceptAll(viaPivot).count() == 0)
  }

  test("approx_count_distinct is within 5% of exact") {
    val r = Tables.lineitem(spark, sfDir)
      .agg(
        countDistinct("l_partkey").as("exact"),
        approx_count_distinct("l_partkey").as("approx"))
      .collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("vec_dot is callable from SQL after registration") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("vec_dot rejects non-float arrays at analysis time instead of returning garbage") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("from_json typed struct agrees with get_json_object") {
    import org.apache.spark.sql.types._
    val parsed = Tables.events(spark, sfDir)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_struct"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"))
    assert(parsed.filter(!(col("k_struct") <=> col("k_path"))).count() == 0)
  }

  test("seeded sample is reproducible and in bounds") {
    val li = Tables.lineitem(spark, sfDir)
    val a = li.sample(0.1, seed = 7).count()
    val b = li.sample(0.1, seed = 7).count()
    assert(a == b)
    val n = li.count()
    assert(a > n / 20 && a < n / 5)
  }
}
