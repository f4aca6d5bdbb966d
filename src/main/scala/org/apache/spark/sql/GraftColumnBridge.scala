package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Expression ↔ Column converters, needed
  * to expose custom Catalyst expressions (graft.functions.FloatVecDot)
  * through the public Column API. Lives in org.apache.spark.sql solely for
  * access; contains no logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register graft's custom expressions in the session's SQL function
    * registry so `spark.sql("... vec_dot(a, b) ...")` works. */
  def registerGraftFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => graft.functions.FloatVecDot(exprs(0), exprs(1)),
      "scala_udf")
}
