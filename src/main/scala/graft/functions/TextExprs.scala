package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * Multi-source text ingest mixes composed and decomposed encodings of
  * the SAME visible text (macOS filenames and some crawls ship NFD;
  * most web text is NFC), which silently breaks every byte-keyed
  * operator downstream — exact dedup (q40), fingerprints (q35/q97),
  * token equality. Canonical normalization at ingest is the fix, and it
  * has to run as a full-corpus scan expression, so it follows the
  * FloatVecDot precedent: a native Expression with doGenCode — one
  * static call inside whole-stage codegen, no interpreted lambda frame
  * and no row-level UDF (the codebase bans those).
  *
  * Semantics are exactly `java.text.Normalizer.normalize(s, NFC)` —
  * the same Unicode-standard NFC that DuckDB's utf8proc-backed
  * `nfc_normalize` implements, which is what makes q159 oracle-checkable
  * byte-for-byte across engines.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string, got ${t.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any): Any =
    TextExprs.nfcJava(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.nfcJava($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExprs {

  /** Static seam shared by eval and generated code. Fast path: NFC
    * normalization of an already-normalized string allocates nothing
    * but the isNormalized scan — the overwhelmingly common case on
    * clean corpora. */
  def nfcJava(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: canonical (NFC) normalization of a string column. */
  def nfcNorm(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
