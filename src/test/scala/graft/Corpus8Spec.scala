package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q198-q200 — local replays plus the semantic
  * invariants: tamper-evidence for the Merkle tree, probability-mass
  * bookkeeping for the Benford audit, and the |ACF| ≤ 1 bound.
  */
class Corpus8Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q198 Merkle manifest: local tree replay; tampering one doc flips exactly its path") {
    val out = SparkEntry.queries("q198_merkle_manifest")(spark, sfDir)
      .as[(String, Long, Long, String)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect().sortBy(_._1)

    def tree(leaf: Map[Long, String]): (Map[Long, String], Map[Long, String], String) = {
      val pages = leaf.toSeq.groupBy(_._1 / 64).view
        .mapValues(rs => md5hex(rs.sortBy(_._1).map(_._2).mkString)).toMap
      val shards = pages.toSeq.groupBy(_._1 % 8).view
        .mapValues(rs => md5hex(rs.sortBy(_._1).map(_._2).mkString)).toMap
      val root = md5hex(shards.toSeq.sortBy(_._1).map(_._2).mkString)
      (pages, shards, root)
    }
    val leaves = docs.map { case (id, t) => id -> md5hex(t) }.toMap
    val (pages, shards, root) = tree(leaves)

    val expected =
      (pages.toSeq.map { case (p, dg) =>
        ("page", p, docs.count(_._1 / 64 == p).toLong, dg) } ++
       shards.toSeq.map { case (sh, dg) =>
        ("shard", sh, docs.count(_._1 / 64 % 8 == sh).toLong, dg) } ++
       Seq(("root", -1L, docs.length.toLong, root)))
        .sortBy(r => (r._1, r._2))
    assert(out.toSeq == expected)

    // Tamper-evidence: flipping one leaf changes its page, its shard,
    // and the root — and NOTHING else.
    val victim = docs.head._1
    val (p2, s2, r2) = tree(leaves.updated(victim, md5hex("tampered")))
    assert(r2 != root)
    assert(p2.filter { case (k, v) => pages(k) != v }.keySet == Set(victim / 64))
    assert(s2.filter { case (k, v) => shards(k) != v }.keySet == Set(victim / 64 % 8))
  }

  test("q199 Benford audit: digit counts replay; probabilities and counts conserve") {
    val out = SparkEntry.queries("q199_benford_audit")(spark, sfDir)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    val prices = Tables.orders(spark, sfDir).select($"o_totalprice".as[Double]).collect()
    val obs = prices.map(p => p.toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length == 9 && out.map(_._1).toSeq == (1 to 9))
    out.foreach { r => assert(r._2 == obs.getOrElse(r._1, 0L) && r._3 == prices.length.toLong) }
    // every order lands in exactly one digit bucket
    assert(out.map(_._2).sum == prices.length.toLong)
    // pinned probabilities: expected counts sum back to ~n
    assert(math.abs(out.map(_._4).sum - prices.length) < 0.1)
    // chisq_part is the published (obs − np)²/np for each digit
    out.foreach { r =>
      val np = r._3 * benfordP(r._1)
      assert(r._6 == round((r._2 - np) * (r._2 - np) / np, 4))
    }
  }

  private def benfordP(d: Int): Double = Seq(0.301029995663981, 0.176091259055681,
    0.124938736608300, 0.096910013008056, 0.079181246047625, 0.066946789630613,
    0.057991946977687, 0.051152522447381, 0.045757490560675)(d - 1)

  test("q200 ACF: exact integer replay; |acf| bounded by 1") {
    val out = SparkEntry.queries("q200_volume_acf")(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val daily = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String])
      .collect().groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.size.toLong
    val t = daily.sum
    val dev = daily.map(c => n * c - t)
    val dd = dev.map(d => d * d).sum
    val expected = (1 to 7).map { k =>
      val nm = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
      (k.toLong, (dev.size - k).toLong, round(nm.toDouble / dd, 6))
    }
    assert(out.toSeq == expected.toSeq)
    assert(out.forall(r => math.abs(r._3) <= 1.0))
  }
}
