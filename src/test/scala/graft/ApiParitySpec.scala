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

  test("spark.sql over registered temp views equals the DataFrame formulations (q01/q15)") {
    // SQL-string API parity: a SQL user gets the same engine — register
    // the tables as views and run ANSI formulations of two oracled
    // queries; results must match the declared DataFrame bodies exactly.
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    val sql01 = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price
        |FROM lineitem_v
        |WHERE l_shipdate <= to_timestamp('2000-12-01 00:00:00')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df01 = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_disc_price")
    assert(sql01.exceptAll(df01).count() == 0)
    assert(df01.exceptAll(sql01).count() == 0)

    val sql15 = spark.sql(
      """SELECT o_custkey, count(*) AS n_orders,
        |round(sum(o_totalprice), 2) AS total
        |FROM orders_v GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin)
    val df15 = SparkEntry.queries("q15_having")(spark, sfDir)
    assert(sql15.exceptAll(df15).count() == 0)
    assert(df15.exceptAll(sql15).count() == 0)
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
