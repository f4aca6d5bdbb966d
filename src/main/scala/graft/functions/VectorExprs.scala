package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression: dot product of two array<float> columns as a
  * sequential left-to-right double fold — bit-identical to the
  * `aggregate(zip_with(...))` higher-order formulation it replaces (so the
  * DuckDB oracle is unaffected) but whole-stage-codegen'd: a tight primitive
  * loop instead of one interpreted lambda frame per element (~50× on the
  * pairwise-cosine benchmarks).
  *
  * Preference order per the design notes: built-ins first, custom
  * Expression only where built-ins can't keep the hot path in codegen —
  * this is that case (SURVEY.md §7.3).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Without this, array<double>/array<int> inputs would be silently
  // reinterpreted by ArrayData.getFloat and return garbage.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API: dot(a, b) over array<float>. Spark 4 Columns wrap
    * ColumnNodes; the Expression bridge goes through GraftColumnBridge. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm via the same fold (dot(v, v) then sqrt). */
  def vecNorm(v: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(v, v))
  }
}
