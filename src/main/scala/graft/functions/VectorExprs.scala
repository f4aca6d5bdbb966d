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

/** Integer sibling of [[FloatVecDot]]: Σ a(i)·b(i) over two array<bigint>
  * columns in exact int64 arithmetic — value-identical to the
  * `aggregate(zip_with(...))` HOF twin (integer sums are associative, so
  * "bit-identical" is trivial here), but codegen'd. Exists for q270's
  * decontamination screen, where the code-dot runs once per
  * (train, eval) pair inside the broadcast join and the interpreted HOF
  * frame per element is the hot path at 100 TB (the FloatVecDot
  * argument, applied to the int8-code table). Overflow-safe for its
  * caller by construction: |codes| ≤ 127, so |Σ| ≤ 64·127² ≪ 2^63.
  *
  * Unlike FloatVecDot (which keeps the generic min-length truncation
  * convention for ad-hoc cosines), this expression THROWS on a length
  * mismatch: its one caller is a soundness bound, and a silently
  * truncated dot loses positive terms — exactly the failure a
  * decontamination screen must never hide. decontamSides guarantees
  * equal lengths (both sides quantize the same fixed-width column). */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"long_vec_dot requires two array<bigint> arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"long_vec_dot: length mismatch $n vs ${y.numElements()} — a truncated " +
          "dot silently loses positive terms, which would weaken q270's " +
          "screen upper bound (a missed-contamination failure mode)")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
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
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "long_vec_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane cosine sketch as a codegen'd expression: bit p of the
  * result = sign of Σ_d m[p][d]·v[d], where m[p][d] = ±1 is encoded as bit
  * d of `masks(p)` (set = +1). The fold adds ±v[d] in ascending d order —
  * bit-identical to the interpreted `aggregate(sequence(...))` HOF twin in
  * Similarity.sketchSpark (asserted equal in SimilaritySpec), so the
  * DuckDB oracle is unaffected; unlike the HOF it stays inside
  * whole-stage codegen, which matters because sketching is a full-corpus
  * scan at 100 TB (every q44 dedup / q53 index build touches every row).
  * Dimensions beyond the vector length are treated as 0 (the HOF twin
  * would null out instead — the corpus is fixed-width so neither path is
  * exercised). */
case class HyperplaneSketch(child: Expression, masks: Seq[Long], dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_sketch requires array<float>, got ${t.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    var acc = 0L
    var p = 0
    while (p < masks.length) {
      val mask = masks(p)
      var s = 0.0
      var d = 0
      while (d < n) {
        val e = v.getFloat(d).toDouble
        s += (if (((mask >>> d) & 1L) == 1L) e else -e)
        d += 1
      }
      if (s > 0) acc |= (1L << p)
      p += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val masksRef = ctx.addReferenceObj("masks", masks.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val e = ctx.freshName("e")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |long $acc = 0L;
         |for (int $p = 0; $p < ${masks.length}; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $e = (double) $a.getFloat($d);
         |    $s += ((($masksRef[$p] >>> $d) & 1L) == 1L) ? $e : -$e;
         |  }
         |  if ($s > 0) $acc |= (1L << $p);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object VectorExprs {
  /** Column API: dot(a, b) over array<float>. Spark 4 Columns wrap
    * ColumnNodes; the Expression bridge goes through GraftColumnBridge. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: exact int64 dot over array<bigint> (q270's screen). */
  def longVecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongVecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm via the same fold (dot(v, v) then sqrt). */
  def vecNorm(v: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(v, v))
  }

  /** Column API: hyperplane sketch with the sign matrix packed as one
    * 64-bit mask per plane (bit d set = +1). */
  def vecSketch(v: Column, masks: Seq[Long], dims: Int): Column =
    GraftColumnBridge.column(
      HyperplaneSketch(GraftColumnBridge.expression(v), masks, dims))
}
