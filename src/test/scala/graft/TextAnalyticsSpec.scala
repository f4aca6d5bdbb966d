package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalyticsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("normalize (C1) strips punctuation, lowers, trims — and is idempotent") {
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(lower(regexp_replace(c, "[^a-zA-Z0-9 ]", "")))
    val df = Seq("  Héllo, World! 42 ", "already clean").toDF("t")
      .select(norm($"t").as("n1"))
      .select($"n1", norm($"n1").as("n2"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1)) // idempotent
    }
    assert(df.select("n1").as[String].collect()(0) == "hllo world 42")
  }

  test("unigram counts match a hand-counted fixture") {
    val docs = Seq((1L, "spark join spark"), (2L, "join the spark"))
      .toDF("doc_id", "text")
    val got = docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x <> '')")).as("term"))
      .filter(!$"term".isInCollection(operators.TextAnalytics.Stopwords))
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("spark" -> 3L, "join" -> 2L))
  }

  test("bigram expression handles degenerate token counts") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val bigrams = docs
      .select(expr("filter(split(lower(text), ' '), x -> x <> '')").as("w"))
      .select(explode(expr(
        "CASE WHEN size(w) >= 2 THEN zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1), (x, y) -> concat(x, ' ', y)) ELSE slice(w, 1, 0) END")).as("bg"))
      .as[String].collect().toSet
    assert(bigrams == Set("a b", "b c"))
  }

  test("lang-id heuristic is >=0.9 accurate on the multi-language fixture (q79)") {
    val rows = SparkEntry.queries("q79_lang_id_fixture")(spark, sfDir)
      .select("lang", "predicted").as[(String, String)].collect()
    val acc = rows.count { case (l, p) => l == p }.toDouble / rows.length
    assert(rows.length == operators.TextAnalytics.langIdFixture.size)
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("q59 BM25: positive scores, only matching docs, tf saturation holds") {
    val got = SparkEntry.queries("q59_bm25")(spark, sfDir)
      .select("doc_id", "bm25").as[(Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._2 > 0))
    // Every scored doc really contains a query term; no matching doc is lost.
    val matching = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("filter(split(lower(text), ' '), x -> x <> '')").as("w"))
      .filter(expr("size(array_intersect(w, array('scan', 'join', 'filter'))) > 0"))
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == matching)
    // Saturation: tf's contribution is bounded by (k1+1)·idf, so no
    // single-term score can exceed 3 terms × 2.2 × max idf (ln(N+1)).
    val n = Tables.documents(spark, sfDir).count()
    assert(got.forall(_._2 <= 3 * 2.2 * math.log(n + 1.0)))
  }

  test("q138 nDCG@10 matches a local recomputation from q59's own ranking") {
    val Array((dcg, idcg, ndcg)) = SparkEntry.queries("q138_retrieval_ndcg")(spark, sfDir)
      .as[(Double, Double, Double)].collect()
    // Relevance = graded term presence, recomputed locally per doc.
    val terms = Set("scan", "join", "filter")
    val rel = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("array_distinct(filter(split(lower(text), ' '), x -> x <> ''))").as("w"))
      .as[(Long, Seq[String])].collect()
      .map { case (d, w) => d -> terms.count(w.contains).toLong }.toMap
    // The ranking under judgment is q59's published BM25 order, top-10.
    val top10 = SparkEntry.queries("q59_bm25")(spark, sfDir)
      .select("doc_id", "bm25").as[(Long, Double)].collect()
      .sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
    def fold(rels: Seq[Long]): Double =
      math.rint(rels.zipWithIndex.map { case (r, i) =>
        r / (math.log(i + 2.0) / math.log(2.0))
      }.sum * 1e6) / 1e6
    val d = fold(top10.toIndexedSeq.map(rel))
    val i = fold(rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(10).map(_._2))
    assert(dcg == d, s"dcg $dcg vs local $d")
    assert(idcg == i, s"idcg $idcg vs local $i")
    assert(ndcg == math.rint(d / i * 1e6) / 1e6 && ndcg > 0 && ndcg <= 1.0)
  }

  test("q177 phrase occurrences equal a local sliding-window scan") {
    val out = SparkEntry.queries("q177_phrase_search")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val phrases = Seq("slow hash batch", "customer part join", "window fast query")
    val expected = (for {
      p <- phrases
      pt = p.split(' ').toSeq
      (id, text) <- docs
      w = text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      starts = w.indices.dropRight(pt.length - 1).filter(i => w.slice(i, i + pt.length) == pt)
      if starts.nonEmpty
    } yield (p, id) -> (starts.size.toLong, starts.min.toLong)).toMap
    assert(out == expected)
    assert(expected.nonEmpty, "phrases should occur in the corpus")
  }
}
