package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q259 — chunk-granularity dedup: a local
  * brute-force replay of the corpus-wide keep-first rule over q93's
  * chunking, plus the defining conservation identities — and for q260 —
  * the token-interning collision audit: a local replay of the per-doc
  * and vocabulary fingerprint arithmetic, plus a narrow-width synthetic
  * fixture proving the audit fires when fingerprints do collide — and
  * for q261, the same two checks for the shingle/8-gram widths — and
  * for q267, a brute-force replay of the boilerplate/dup/kept classify
  * ladder plus its q259 conservation bridge.
  */
class Corpus11Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def chunks(text: String): Seq[(Long, String, Long)] = {
    val w = toks(text)
    if (w.isEmpty) Seq.empty
    else (0 to (w.length - 1) / 15).map { i =>
      val c = w.slice(i * 15, i * 15 + 20)
      (i.toLong, c.mkString(" "), c.length.toLong)
    }
  }

  test("q259 chunk dedup: brute-force keep-first replay and conservation identities") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

    // local replay: first (doc_id, chunk_idx) occurrence of each chunk wins
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, text) <- docs; (ci, c, _) <- chunks(text))
      if (!firstOwner.contains(c)) firstOwner(c) = (id, ci)
    val expected = docs.filter(d => toks(d._2).nonEmpty).map { case (id, text) =>
      val ch = chunks(text)
      val kept = ch.filter { case (ci, c, _) => firstOwner(c) == (id, ci) }
      (id, ch.size.toLong, kept.size.toLong,
        ch.map(_._3).sum, kept.map(_._3).sum,
        round(kept.map(_._3).sum.toDouble / ch.map(_._3).sum, 4))
    }.map(r => r._1 -> r).toMap

    val out = SparkEntry.queries("q259_chunk_dedup")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == expected.size)
    out.foreach { case r @ (id, _, _, _, _, _) => assert(r == expected(id), s"doc $id") }

    // conservation: total kept chunks across the corpus = number of
    // distinct chunk strings; every doc's retention is in (0, 1]
    assert(out.map(_._3).sum == firstOwner.size)
    assert(out.forall { case (_, nc, nk, tt, kt, rf) =>
      nk >= 0 && nk <= nc && kt <= tt && rf >= 0.0 && rf <= 1.0
    })
  }

  test("q267 boilerplate scrub: brute-force replay of the classify ladder") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // local ground truth: df (distinct docs) and first owner per chunk
    val dfOf = scala.collection.mutable.Map.empty[String, Set[Long]]
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, text) <- docs; (ci, c, _) <- chunks(text)) {
      dfOf(c) = dfOf.getOrElse(c, Set.empty) + id
      if (!firstOwner.contains(c)) firstOwner(c) = (id, ci)
    }
    val expected = docs.filter(d => toks(d._2).nonEmpty).map { case (id, text) =>
      val ch = chunks(text)
      def status(ci: Long, c: String): String =
        if (dfOf(c).size >= 3) "boiler"
        else if (firstOwner(c) == (id, ci)) "kept" else "dup"
      val st = ch.map { case (ci, c, nt) => (status(ci, c), nt) }
      val keptT = st.collect { case ("kept", nt) => nt }.sum
      (id, ch.size.toLong,
        st.count(_._1 == "boiler").toLong, st.count(_._1 == "dup").toLong,
        st.count(_._1 == "kept").toLong, st.map(_._2).sum, keptT,
        round(keptT.toDouble / st.map(_._2).sum, 4))
    }.map(r => r._1 -> r).toMap
    val out = SparkEntry.queries("q267_boilerplate_scrub")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == expected.size)
    out.foreach { case r @ (id, _, _, _, _, _, _, _) =>
      assert(r == expected(id), s"doc $id")
    }
    // the ladder discriminates: both fates occur, and boiler removes
    // MORE aggressively than q259 (its winners drop too)
    assert(out.map(_._3).sum > 0 && out.map(_._4).sum > 0)
    val q259kept = SparkEntry.queries("q259_chunk_dedup")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_kept")).as[Long].collect().head
    assert(out.map(_._5).sum ==
      q259kept - dfOf.valuesIterator.count(_.size >= 3))
  }

  /** First 15 md5 hex digits of `u` as a 60-bit long — the local twin of
    * Dedup.internExpr / q260's fold. */
  private def fp60(u: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("q260 fingerprint audit: local replay of the collision arithmetic") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokSets = docs.map { case (_, text) => toks(text).toSeq }
    val affected = tokSets.count { w =>
      w.distinct.size != w.map(fp60).distinct.size
    }
    val vocab = tokSets.flatten.distinct
    val expected = (docs.length.toLong, affected.toLong,
      vocab.size.toLong, vocab.map(fp60).distinct.size.toLong)

    val Array(out) = SparkEntry.queries("q260_fingerprint_audit")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert((out._1, out._2, out._3, out._4) == expected)
    assert(out._5 == expected._3 - expected._4)
    // the interning contract on the gate corpus: zero collisions — this
    // is the premise that makes Dedup's interned Jaccard verify exact
    assert(out._5 == 0L && out._2 == 0L)
  }

  private def ngrams(w: Seq[String], n: Int): Seq[String] =
    if (w.length < n) Seq.empty
    else w.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq

  test("q261 n-gram fingerprint audit: local replay of the collision arithmetic") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokSeqs = docs.map { case (_, text) => toks(text).toSeq }
    def half(n: Int): (Long, Long, Long) = {
      val per = tokSeqs.map(w => ngrams(w, n).distinct)
      val affected = per.count(g => g.size != g.map(fp60).distinct.size)
      val vocab = per.flatten.distinct
      (affected.toLong, vocab.size.toLong, vocab.map(fp60).distinct.size.toLong)
    }
    val (aff5, v5, f5) = half(5)
    val (aff8, v8, f8) = half(8)

    val Array(out) = SparkEntry.queries("q261_ngram_fp_audit")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out == ((docs.length.toLong, aff5, aff8,
      v5, f5, v5 - f5, v8, f8, v8 - f8)))
    // the premise that makes the r9 shingle/8-gram interning exact on
    // the gate corpus: zero collisions at either width
    assert(out._6 == 0L && out._9 == 0L && out._2 == 0L && out._3 == 0L)
  }

  test("q261 audit fires on forced collisions (4-bit fingerprint fixture)") {
    // 40 six-token docs → 2 distinct 5-shingles each (80 distinct
    // shingle strings through a 16-bucket fingerprint: vocabulary
    // collisions by pigeonhole) and ZERO 8-grams (too short — the
    // per-doc arithmetic must pass through empties, not fail); plus one
    // 22-token doc whose 18 distinct shingles can't fit 16 buckets, so
    // a WITHIN-doc collision (n_docs_affected_sh5 ≥ 1) is guaranteed,
    // and whose 15 8-grams populate the g8 half.
    val fixture = ((0 until 40).map { i =>
      (i.toLong, s"a$i b$i c$i d$i e$i f$i")
    } :+ (100L, (0 until 22).map(j => s"g$j").mkString(" ")))
      .toDF("doc_id", "text")
    val Array(r) = operators.Corpus11.ngramFingerprintAudit(fixture, hexWidth = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r._1 == 41L)
    assert(r._2 >= 1L)                  // doc 100: 18 shingles, 16 buckets
    assert(r._4 == 98L)                 // 40 × 2 + 18 distinct shingles
    assert(r._5 <= 16L && r._6 == r._4 - r._5 && r._6 >= 82L)
    assert(r._7 == 15L && r._8 <= 15L && r._9 == r._7 - r._8)
    assert(r._3 <= 1L)                  // only doc 100 even has 8-grams
  }

  test("q260 audit fires on forced collisions (4-bit fingerprint fixture)") {
    // 40 distinct tokens through a 1-hex-digit (16-bucket) fingerprint:
    // pigeonhole guarantees vocabulary collisions, and doc 1 (all 40
    // tokens) must see ns > nf. Proves the arithmetic DETECTS collisions
    // — a genuine 60-bit md5-prefix collision is not constructible.
    val vocabToks = (0 until 40).map(i => s"tok$i")
    val fixture = Seq(
      (1L, vocabToks.mkString(" ")),
      (2L, "tok0 tok1"),
      (3L, "solo")).toDF("doc_id", "text")
    val Array(r) = operators.Corpus11.fingerprintAudit(fixture, hexWidth = 1)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r._1 == 3L)
    assert(r._2 >= 1L)           // doc 1 is affected
    assert(r._3 == 41L)          // 40 toks + "solo"
    assert(r._4 <= 16L)          // 4-bit space
    assert(r._5 == r._3 - r._4 && r._5 >= 25L)
  }

  test("assertInterningExact: passes on the corpus, throws on forced collisions") {
    // the SCALE.md operational contract, enforceable in-pipeline: the
    // guard is silent at the production width on the gate corpus...
    operators.Dedup.assertInterningExact(Tables.documents(spark, sfDir))
    // ...and throws with the fall-back instruction when fingerprints
    // collide (4-bit width forces it by pigeonhole)
    val fixture = Seq((1L, (0 until 40).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      operators.Dedup.assertInterningExact(fixture, hexWidth = 1)
    }
    assert(ex.getMessage.contains("UNSAFE") &&
      ex.getMessage.contains("exact string"))
  }
}
