package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k salted-md5 minhash signatures of a token set, as one codegen'd pass —
  * semantically identical to the HOF form it replaces (Dedup.sigsHofExpr):
  *
  *   transform(sequence(0, k-1), i ->
  *     array_min(transform(w, u -> md5(concat(cast(i AS STRING), ':', u)))))
  *
  * so the DuckDB oracles of q41/q45/q55 are untouched (DedupSpec asserts
  * expression ≡ HOF on the corpus). Why it's faster on the q45 hot path
  * (signatures are a full-corpus scan — the single heaviest benchmark
  * stage): the HOF allocates k intermediate hex-string arrays per row and
  * interprets 2k lambda frames per token; this computes each digest once
  * into a reused 16-byte buffer, tracks the per-salt minimum by UNSIGNED
  * BYTE comparison (lowercase hex encoding is order-preserving per byte,
  * so byte-order min == hex-string min), and hex-encodes only the k
  * winners. MessageDigest instances are thread-local; salt prefixes are
  * pre-encoded once per query.
  *
  * Null semantics mirror the HOF: a null element in `w` hashes to null
  * and is skipped by the min; an empty (or all-null) token set yields
  * null signature elements; a NULL token-set column is handled by the
  * Column wrapper in the companion (k nulls, matching transform's
  * null-in-array behavior).
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires array<string>, got ${t.simpleString(10)}")
    }
  }

  @transient private lazy val saltPrefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes("UTF-8"))

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  /** Also the entry point for generated code (one virtual call per row —
    * the surrounding operator stays inside whole-stage codegen). */
  def compute(w: ArrayData): ArrayData = {
    val md = MinHashSigs.digests.get()
    val n = w.numElements()
    val mins = new Array[Array[Byte]](k)
    var j = 0
    while (j < n) {
      if (!w.isNullAt(j)) {
        val tok = w.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(saltPrefixes(i))
          md.update(tok)
          val d = md.digest() // 16 bytes
          if (mins(i) == null || MinHashSigs.unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      if (mins(i) != null) out(i) = UTF8String.fromString(MinHashSigs.hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val c = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      c(i * 2) = hexDigits((d(i) >> 4) & 0xf)
      c(i * 2 + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(c)
  }

  /** Column API. The HOF twin maps a NULL token set to an array of k
    * nulls (transform propagates null INTO the array), while the bare
    * expression is null-intolerant like any UnaryExpression — the
    * `when` wrapper restores exact parity for null inputs. */
  def minhashSigs(w: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{array_repeat, lit, when}
    when(w.isNull, array_repeat(lit(null).cast("string"), k))
      .otherwise(GraftColumnBridge.column(
        MinHashSigs(GraftColumnBridge.expression(w), k)))
  }
}
