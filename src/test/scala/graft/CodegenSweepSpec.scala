package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded generative sweeps for the codegen expression family that
  * DedupSpec's r14 sweep did not cover: FloatVecDot, LongVecDot,
  * HyperplaneSketch, and MinHashSigs (the latter under random NULL
  * injection, which the corpus twin never exercises). Same discipline
  * as the interning sweep: 200 deterministic pseudo-random shapes
  * including the adversarial edges (empty, single-element, unequal
  * lengths, null elements, null columns), each checked against an
  * independently-computed reference — a Scala re-fold in the SAME
  * accumulation order where the contract is bit-identity, the HOF twin
  * in-Spark where the contract is expression≡HOF.
  */
class CodegenSweepSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("vec_dot: 200-case seeded sweep equals the sequential double fold, incl. empty/unequal") {
    val rnd = new scala.util.Random(151)
    def randVec(max: Int): Seq[Float] =
      Seq.fill(rnd.nextInt(max + 1))((rnd.nextInt(2001) - 1000) / 97.0f)
    val rows = (0 until 200).map { i =>
      // lengths drawn independently — unequal pairs exercise the
      // documented min-length truncation convention
      (i.toLong, randVec(8), randVec(8))
    }
    val got = rows.toDF("id", "a", "b")
      .select($"id", graft.functions.VectorExprs.vecDot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      // the contract is BIT-identity to a left-to-right double fold over
      // the min length — replay exactly that fold
      val n = math.min(a.length, b.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(acc), s"vec_dot case $id")
    }
  }

  test("long_vec_dot: 200-case seeded sweep is the exact int64 dot; mismatch throws") {
    val rnd = new scala.util.Random(152)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(9)
      // the caller's int8-code range (|v| ≤ 127), incl. n = 0
      def v() = Seq.fill(n)((rnd.nextInt(255) - 127).toLong)
      (i.toLong, v(), v())
    }
    val got = rows.toDF("id", "a", "b")
      .select($"id", graft.functions.VectorExprs.longVecDot($"a", $"b").as("d"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == a.zip(b).map { case (x, y) => x * y }.sum,
        s"long_vec_dot case $id")
    }
    // unequal lengths must FAIL LOUD (a truncated dot would weaken the
    // q270 decontamination screen's upper bound)
    val e = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L)))
        .toDF("a", "b")
        .select(graft.functions.VectorExprs.longVecDot($"a", $"b"))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("length mismatch"))))
  }

  test("vec_sketch: 200-case seeded sweep equals the ascending-d sign fold") {
    val rnd = new scala.util.Random(153)
    val dims = 8
    val masks = Seq.fill(16)(rnd.nextLong())
    val rows = (0 until 200).map { i =>
      // lengths 0..10: shorter (missing dims read as 0) AND longer
      // (extra dims ignored) than `dims`
      (i.toLong, Seq.fill(rnd.nextInt(11))((rnd.nextInt(2001) - 1000) / 113.0f))
    }
    val got = rows.toDF("id", "v")
      .select($"id", graft.functions.VectorExprs.vecSketch($"v", masks, dims).as("s"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, v) =>
      val n = math.min(dims, v.length)
      var acc = 0L
      masks.zipWithIndex.foreach { case (mask, p) =>
        var s = 0.0
        var d = 0
        while (d < n) {
          val e = v(d).toDouble
          s += (if (((mask >>> d) & 1L) == 1L) e else -e)
          d += 1
        }
        if (s > 0) acc |= (1L << p)
      }
      assert(got(id) == acc, s"vec_sketch case $id")
    }
  }

  test("minhash_sigs: 200-case seeded sweep with null injection equals the HOF twin") {
    val rnd = new scala.util.Random(154)
    def randToks(): Seq[String] = Seq.fill(rnd.nextInt(10)) {
      // ~15% null elements; duplicates likely (30-token vocabulary)
      if (rnd.nextInt(100) < 15) null else s"t${rnd.nextInt(30)}"
    }
    // Option rows: ~5% NULL token-set columns (the Column-wrapper path)
    val rows = (0 until 200).map { i =>
      (i.toLong, if (rnd.nextInt(100) < 5) None else Some(randToks()))
    }
    val both = rows.toDF("id", "w")
      .select($"id",
        graft.functions.MinHashSigs.minhashSigs($"w", 6).as("fast"),
        expr(operators.Dedup.sigsHofExpr).as("hof"))
    assert(both.count() == 200)
    assert(both.filter(!($"fast" <=> $"hof")).count() == 0)
    // the sweep actually exercised the edges it claims to
    assert(rows.exists(_._2.isEmpty), "no null token-set column drawn")
    assert(rows.exists(_._2.exists(_.contains(null))), "no null element drawn")
    assert(rows.exists(_._2.exists(_.isEmpty)), "no empty token set drawn")
  }

  test("shingle_fps fails loud on a null token instead of silently diverging from the HOF") {
    val e = intercept[Exception] {
      Seq(1L).toDF("id")
        .select(expr("array('a', 'b', CAST(NULL AS STRING), 'd', 'e', 'f')").as("w"))
        .select(graft.functions.ShingleFps.shingleFps($"w", 5))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("null token"))))
  }
}
