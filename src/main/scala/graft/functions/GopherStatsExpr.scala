package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher within-document repetition battery (top-{2,3,4}-gram
  * character mass + duplicate-{2,3}-gram coverage chars) as ONE codegen
  * pass over the token array — the [[InternTokens]]/[[ShingleFps]]
  * treatment applied to q263's five explode→aggregate pipelines (r16).
  *
  * Every battery signal is a WITHIN-DOCUMENT statistic, so the
  * distributed form's five (doc_id, gram)-keyed aggregates (~19
  * exchanges across the five sub-pipelines and their joins) compute
  * nothing a per-row pass cannot: this expression folds all five
  * signals in one traversal per document and returns
  * struct(top2c, top3c, top4c, dup2c, dup3c) — exactly the five LONG
  * inputs repetitionBattery's fraction/threshold arithmetic consumes.
  *
  * VALUE CONTRACT vs the aggregate twin (Corpus12Spec asserts ≡ on the
  * corpus and on an adversarial tie fixture):
  *  - grams are the same space-joined token windows (Corpus.ngramSpark);
  *  - topNc = cnt(best) · chars(best) where best = max by
  *    (cnt, chars, gram) with chars = numChars(gram) − (n−1) and the
  *    gram tie-break in BINARY UTF8 order — precisely Spark's
  *    max(struct(cnt, chars, gram)) semantics (UTF8String.compareTo is
  *    the unsigned byte comparison struct-max uses);
  *  - dupNc = Σ numChars(token) over the POSITION-SET UNION of all
  *    occurrences of within-doc duplicated n-grams (overlaps counted
  *    once) — the interval-union convention of dupCoverageChars;
  *  - a document with fewer than n tokens contributes 0 for that width
  *    (the aggregate twin's absent-row → coalesce(…, 0) path).
  *
  * Null tokens FAIL LOUD (the ShingleFps discipline): the aggregate
  * twin's null-gram plumbing and any silent skip here would diverge;
  * every in-repo caller feeds `filter(split(…))` output, which cannot
  * contain null elements. A NULL token-array column is handled by the
  * caller (repetitionBattery wraps with when(isNull, zero-struct) —
  * the twin's t-row-present/agg-rows-absent behavior). */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top2c", LongType, nullable = false),
    StructField("top3c", LongType, nullable = false),
    StructField("top4c", LongType, nullable = false),
    StructField("dup2c", LongType, nullable = false),
    StructField("dup3c", LongType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gopher_stats requires array<string>, got ${t.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  /** Entry point for generated code. */
  def compute(w: ArrayData): InternalRow = {
    val m = w.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      if (w.isNullAt(i))
        throw new IllegalStateException(
          s"gopher_stats: null token at position $i — the aggregate/oracle " +
            "twin diverges on null tokens; filter null elements upstream")
      toks(i) = w.getUTF8String(i)
      i += 1
    }
    val res = new Array[Long](5)
    val sp = GopherStats.Space
    var n = 2
    while (n <= 4) {
      if (m >= n) {
        val nGrams = m - n + 1
        val grams = new Array[UTF8String](nGrams)
        val cnt = new java.util.HashMap[UTF8String, Array[Long]](nGrams * 2)
        var p = 0
        while (p < nGrams) {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = toks(p + j)
            if (j < n - 1) parts(2 * j + 1) = sp
            j += 1
          }
          val g = UTF8String.concat(parts: _*)
          grams(p) = g
          val c = cnt.get(g)
          if (c == null) cnt.put(g, Array(1L)) else c(0) += 1L
          p += 1
        }
        // top n-gram by (cnt, chars, gram-binary) — struct-max semantics
        var bc = 0L
        var bchars = 0L
        var bg: UTF8String = null
        val it = cnt.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val g = e.getKey
          val c = e.getValue()(0)
          val chars = g.numChars().toLong - (n - 1)
          if (bg == null || c > bc || (c == bc &&
              (chars > bchars || (chars == bchars && g.compareTo(bg) > 0)))) {
            bc = c; bchars = chars; bg = g
          }
        }
        res(n - 2) = bc * bchars
        if (n <= 3) {
          // duplicate coverage: union of positions covered by any
          // occurrence of a gram with within-doc count >= 2
          val covered = new Array[Boolean](m)
          var q = 0
          while (q < nGrams) {
            if (cnt.get(grams(q))(0) >= 2L) {
              var j = 0
              while (j < n) { covered(q + j) = true; j += 1 }
            }
            q += 1
          }
          var s = 0L
          var t = 0
          while (t < m) {
            if (covered(t)) s += toks(t).numChars().toLong
            t += 1
          }
          res(n + 1) = s // dup2c at 3, dup3c at 4
        }
      }
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](res(0), res(1), res(2), res(3), res(4)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gst", this, classOf[GopherStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  private[functions] val Space: UTF8String = UTF8String.fromString(" ")

  def gopherStats(w: Column): Column =
    GraftColumnBridge.column(GopherStats(GraftColumnBridge.expression(w)))
}
