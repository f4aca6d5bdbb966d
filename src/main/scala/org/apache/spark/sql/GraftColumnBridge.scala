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

  /** Unpersist the block-manager copies behind a localCheckpoint'ed
    * Dataset (its analyzed plan is a LogicalRDD over the checkpointed
    * RDD). Dataset.unpersist only covers cache()-registered plans, so
    * iterative algorithms that checkpoint per round (Components) need
    * this to release superseded rounds deterministically instead of
    * waiting for the ContextCleaner. No-op for non-checkpointed frames. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Register graft's custom expressions in the session's SQL function
    * registry so `spark.sql("... vec_dot(a, b) ...")` works. */
  def registerGraftFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => graft.functions.FloatVecDot(exprs(0), exprs(1)),
      "scala_udf")
}
