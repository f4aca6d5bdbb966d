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
    // r14 allocation engineering (alloc telemetry showed the LSH family
    // is the bench set's dominant allocator — q137/q143 ~21 of 32 GiB):
    // digest into a reused thread-local scratch instead of letting
    // digest() allocate a fresh 16-byte array per (token × salt) — 6
    // allocations/token drop to one copy per new per-salt MINIMUM
    // (expected O(k·ln n) copies per doc, not O(k·n) allocations).
    val buf = MinHashSigs.scratch.get()
    var j = 0
    while (j < n) {
      if (!w.isNullAt(j)) {
        val tok = w.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(saltPrefixes(i))
          md.update(tok)
          md.digest(buf, 0, 16) // writes in place — no per-call allocation
          if (mins(i) == null) mins(i) = buf.clone()
          else if (MinHashSigs.unsignedLess(buf, mins(i)))
            System.arraycopy(buf, 0, mins(i), 0, 16)
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
  private[functions] val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Reused 16-byte digest scratch, one per task thread (see compute). */
  private[functions] val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
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

/** Sorted distinct 60-bit md5-prefix fingerprints of a token set in ONE
  * codegen pass — the allocation-engineered twin of the HOF interning
  * chain the LSH verify used through r13
  * (`array_sort(array_distinct(transform(w, u ->
  * CAST(conv(substring(md5(u), 1, 15), 16, 10) AS BIGINT))))` —
  * Dedup.internExpr under a sort):
  *
  *  - the first 15 hex chars of an md5 ARE the digest's first 7.5
  *    bytes, i.e. (bytes[0..7] as a big-endian u64) >>> 4 — computed
  *    straight off the digest buffer, so the 32-char hex string, the
  *    15-char substring slice, and the conv() parse (~3 short-lived
  *    objects PER TOKEN per verify side) never exist;
  *  - sort + dedup run in place on one primitive long[]; the row's only
  *    allocations are that array and its UnsafeArrayData wrapper.
  *
  * r14 alloc telemetry motivated this: the LSH family (q137/q143) was
  * the bench set's dominant allocator at ~11 GiB/query. DedupSpec
  * asserts value-equality with the HOF twin on the corpus.
  *
  * Contract: null elements are skipped (callers feed array_distinct'd
  * non-null token sets); signed-long ordering — safe because a 60-bit
  * value never sets the sign bit. Output containsNull = false.
  */
case class InternTokens(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "intern_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"intern_tokens requires array<string>, got ${t.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  /** Entry point for generated code (one virtual call per row — the
    * surrounding operator stays inside whole-stage codegen). */
  def compute(w: ArrayData): ArrayData = {
    val md = MinHashSigs.digests.get()
    val buf = MinHashSigs.scratch.get()
    val n = w.numElements()
    val out = new Array[Long](n)
    var m = 0
    var j = 0
    while (j < n) {
      if (!w.isNullAt(j)) {
        md.reset()
        md.update(w.getUTF8String(j).getBytes)
        md.digest(buf, 0, 16)
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (buf(b) & 0xffL); b += 1 }
        out(m) = v >>> 4 // == conv(substring(md5_hex, 1, 15), 16, 10)
        m += 1
      }
      j += 1
    }
    java.util.Arrays.sort(out, 0, m)
    var r = 0
    var k = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(k) = out(r); k += 1 }
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (k == n) out else java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intern", this, classOf[InternTokens].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): InternTokens =
    copy(child = newChild)
}

object InternTokens {
  def internTokens(w: Column): Column =
    GraftColumnBridge.column(InternTokens(GraftColumnBridge.expression(w)))
}

/** |A ∩ B| of two SORTED distinct long arrays by a two-pointer merge
  * walk — zero allocation per row, replacing
  * `size(array_intersect(wa, wb))` on the LSH verify's per-pair hot
  * path (array_intersect builds an OpenHashSet AND the materialized
  * intersection array per candidate pair — the verify only ever needs
  * the COUNT; r14 alloc telemetry). Value-identical on the
  * [[InternTokens]] contract inputs (sorted, distinct, no nulls) —
  * DedupSpec asserts ≡ size(array_intersect) on the corpus pairs.
  *
  * PRECONDITION (enforced at the type boundary): both inputs must be
  * `array<bigint>` with containsNull = false, and elements must be
  * sorted ascending and distinct — i.e. the output shape of
  * [[InternTokens]] / [[ShingleFps]]. Unsorted input silently
  * undercounts and a null element would read undefined data, so the
  * type check REJECTS nullable-element arrays rather than trusting the
  * caller; the sortedness half of the contract is not machine-checkable
  * per row and is stated here and in the TypeCheck failure message.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> with " +
          s"non-null elements, sorted ascending and distinct (the " +
          s"intern_tokens/shingle_fps output contract), got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sic", this, classOf[SortedLongIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedLongIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Distinct n-shingle 60-bit fingerprints of a token array in ONE
  * codegen pass — the [[InternTokens]] treatment applied to the shingle
  * family (Corpus.shingleFpSpark's HOF chain:
  * `transform(array_distinct(<n-gram concat>), s -> conv(substring(
  * md5(s), 1, 15), 16, 10))`). The HOF materializes every shingle
  * STRING (an n-token concat), its md5 hex string, a substring slice,
  * and a conv parse — ~4 short-lived objects per shingle occurrence;
  * this streams each window's token bytes through the thread-local
  * digest (separator included) and keeps only the long.
  *
  * Value contract vs the HOF: the same fingerprint per shingle (the
  * digest input is byte-identical: tok_i ++ " " ++ … ++ tok_{i+n-1}),
  * deduped per document — BY FINGERPRINT here vs by string there, equal
  * on any corpus free of within-doc shingle collisions (q261 audits;
  * same discipline as every interned family) — and SORTED rather than
  * first-occurrence order. Every consumer explodes the array into
  * joins/aggregates, so element order is immaterial; the spec twin
  * compares both sides sorted. Null tokens: a window containing a null
  * element is skipped (the HOF's concat nulls the whole shingle and
  * array_distinct keeps one null that fp60 then maps to null — which
  * explode consumers drop via join/count-on-nonnull semantics). Null
  * tokens: compute FAILS LOUD — the HOF twin's null plumbing (concat →
  * null shingle → array_distinct keeps one null → fp60 → null element)
  * and a silent skip here diverge on a doc whose every window holds a
  * null token (0 rows vs 1 null row after explode), so rather than
  * trusting the non-null-corpus assumption forever, a null token
  * raises with the offending position; every in-repo caller feeds
  * `filter(split(...), x -> x <> '')` output, which cannot contain
  * null elements (DedupSpec pins the failure).
  */
case class ShingleFps(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fps"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"shingle_fps requires array<string>, got ${t.simpleString(10)}")
    }
  }

  @transient private lazy val sep: Array[Byte] = " ".getBytes("UTF-8")

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  /** Entry point for generated code. */
  def compute(w: ArrayData): ArrayData = {
    val num = w.numElements()
    if (num < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val md = MinHashSigs.digests.get()
    val buf = MinHashSigs.scratch.get()
    // token bytes extracted once per row (one small array per token —
    // the HOF allocated that AND the concat AND the hex machinery)
    val toks = new Array[Array[Byte]](num)
    var i = 0
    while (i < num) {
      if (w.isNullAt(i))
        throw new IllegalStateException(
          s"shingle_fps: null token at position $i — the HOF/oracle twin " +
            "diverges on null tokens (null shingle row vs skipped window); " +
            "filter null elements upstream")
      toks(i) = w.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](num - n + 1)
    var m = 0
    i = 0
    while (i <= num - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(sep)
        md.update(toks(i + j))
        j += 1
      }
      md.digest(buf, 0, 16)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (buf(b) & 0xffL); b += 1 }
      out(m) = v >>> 4
      m += 1
      i += 1
    }
    java.util.Arrays.sort(out, 0, m)
    var r = 0
    var k = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(k) = out(r); k += 1 }
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shfp", this, classOf[ShingleFps].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleFps =
    copy(child = newChild)
}

object ShingleFps {
  def shingleFps(w: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleFps(GraftColumnBridge.expression(w), n))
}
