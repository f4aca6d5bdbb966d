package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the q153-q155 summary/lifecycle closers — what
  * the DuckDB oracle can't see: the KMV estimator replayed from raw
  * hashes and its shard-merge identity, the Bloom filter's no-false-
  * negative guarantee and width economics, and the CDC diff replayed
  * from the edit script.
  */
class Corpus4Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The engine's 60-bit hex fold + 1 (Corpus4.uhSpark), locally. */
  private def uhash(uid: Long): Long =
    java.lang.Long.parseLong(md5hex(s"u#$uid").take(15), 16) + 1

  private val K = operators.Corpus4.KMV_K
  private val TWO60 = 1152921504606846976L

  test("q153 KMV: estimator replayed from raw hashes, err within 25% in the n>k regime, sketches merge across shards") {
    // sf0.01: 150 distinct users > k=64, so the estimator actually runs
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q153_kmv_distinct_sketch")(spark, dir)
      .select("scope", "est_ndv", "exact_ndv", "err_ratio")
      .as[(String, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 10)
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    def kmvEst(users: Set[Long]): Double = {
      val hs = users.map(uhash).toSeq.sorted
      if (hs.size < K) hs.size.toDouble
      else (K - 1).toDouble * TWO60.toDouble / hs(K - 1)
    }
    val all = ev.map(_._1).toSet
    val a = ev.filter(_._3 > 150).map(_._1).toSet
    val b = ev.filter(_._2 == "error").map(_._1).toSet
    for ((scope, users) <- Seq("all" -> all, "A_value_gt150" -> a,
        "B_error" -> b, "AuB" -> (a ++ b))) {
      val r = out(scope)
      assert(r._3 == users.size, s"$scope exact ndv")
      assert(math.abs(r._2 - kmvEst(users)) <= 0.051, s"$scope est replay")
      assert(r._4 > 0.75 && r._4 < 1.25, s"$scope err ratio ${r._4}")
    }
    // intersection row: J over the union's top-k, replayed
    val union = (a ++ b).map(uhash).toSeq.sorted.take(K)
    val ah = a.map(uhash); val bh = b.map(uhash)
    val j = union.count(h => ah(h) && bh(h)).toDouble / union.size
    val intRow = out("AnB_est")
    assert(intRow._3 == (a & b).size, "exact intersection")
    assert(math.abs(intRow._2 - math.round(j * kmvEst(a ++ b) * 10) / 10.0) <= 0.051,
      "intersection est replay")
    // mergeability: k-min of unioned per-shard k-mins ≡ the global sketch
    val shards = ev.map(_._1).distinct.groupBy(_ % 4).values
      .map(_.map(uhash).toSeq.distinct.sorted.take(K))
    val merged = shards.flatten.toSeq.distinct.sorted.take(K)
    assert(merged == all.map(uhash).toSeq.sorted.take(K), "shard-merge identity")
  }

  private def tsetFp(text: String): String =
    md5hex(text.toLowerCase.split(" ").filter(_.nonEmpty).distinct.sorted.mkString(","))

  test("q154 bloom: zero false negatives at both widths, every exact_hit verdict true to the data, wide width at most as noisy") {
    val out = SparkEntry.queries("q154_bloom_decontaminate")(spark, sfDir)
      .select("width", "doc_id", "exact_hit")
      .as[(Int, Long, Boolean)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> tsetFp(t) }
    val evalFps = docs.filter(_._1 % 10 == 1).map(_._2).toSet
    val train = docs.filter(_._1 % 10 != 1)
    val trueHits = train.filter(d => evalFps(d._2)).map(_._1).toSet
    assert(trueHits.nonEmpty, "fixture has no true collisions — test is vacuous")
    for (w <- Seq(operators.Corpus4.BLOOM_NARROW, operators.Corpus4.BLOOM_WIDE)) {
      val flagged = out.filter(_._1 == w)
      // Bloom guarantee: a true collision can NEVER be missed
      assert(trueHits.subsetOf(flagged.map(_._2).toSet), s"width $w false negative")
      // exact_hit column is truthful both ways
      flagged.foreach { case (_, id, eh) =>
        assert(eh == trueHits(id), s"width $w doc $id exact_hit wrong")
      }
    }
    val fp = (w: Int) => out.count(r => r._1 == w && !r._3)
    assert(fp(operators.Corpus4.BLOOM_WIDE) <= fp(operators.Corpus4.BLOOM_NARROW),
      "wide bloom noisier than narrow")
  }

  test("q155 CDC diff: exact replay of the edit script") {
    val out = SparkEntry.queries("q155_snapshot_diff")(spark, sfDir)
      .select("doc_id", "change", "old_fp", "new_fp")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val v1 = docs.map { case (id, t) => id -> md5hex(t) }.toMap
    val v2 = (docs.filter(_._1 % 7 != 0).map { case (id, t) =>
        id -> md5hex(if (id % 11 == 0) t + " v2" else t)
      } ++ docs.filter(_._1 % 13 == 0).map { case (id, t) =>
        (id + 1000000L) -> md5hex(t)
      }).toMap
    val expected =
      v2.keySet.diff(v1.keySet).map(id => (id, "added", None, Some(v2(id)))) ++
      v1.keySet.diff(v2.keySet).map(id => (id, "removed", Some(v1(id)), None)) ++
      v1.keySet.intersect(v2.keySet).filter(id => v1(id) != v2(id))
        .map(id => (id, "changed", Some(v1(id)), Some(v2(id))))
    assert(out == expected)
    // the script really produced all three kinds
    assert(Set("added", "removed", "changed").subsetOf(out.map(_._2)))
  }
}
