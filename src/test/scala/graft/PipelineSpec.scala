package graft

import graft.operators.{Ingest, KeywordTree}
import graft.sources.Articles
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("ingest pipeline end state matches the reference semantics exactly") {
    val got = Ingest.pipeline(spark)
      .select("title", "source").as[(String, String)].collect().toSeq
    // 7 distinct batch titles (incl. the null group) + 2 store titles - 1 overlap
    assert(got.size == 8)
    val m = got.filter(_._1 != null).toMap
    // existing wins over the incoming IEEE/GS duplicate
    assert(m("Ransomware in Hospitals") == "Existing")
    // earlier source rank wins the intra-batch dup
    assert(m("Phishing Countermeasures") == "GoogleScholar")
    assert(m("EHR Data Integrity") == "SemanticScholar")
    // null titles dedup as one group; IEEE (rank 0) wins
    assert(got.filter(_._1 == null).map(_._2) == Seq("IEEE"))
    // store-only rows survive
    assert(m.contains("Zero-day Markets"))
  }

  test("delta anti-join reports only genuinely new titles") {
    val batch = Ingest.dedupByTitle(
      Ingest.unionSources(spark, Articles.allSources, Seq("t")))
    val existing = Articles.existingStore(spark)
    val merged = Ingest.mergeExistingWins(existing, batch)
    val delta = Ingest.deltaNew(merged, existing)
      .select("title").as[String].collect().toSet
    assert(!delta.contains("Ransomware in Hospitals")) // pre-existing
    assert(!delta.contains("Zero-day Markets"))        // store only
    assert(delta.contains("Adversarial ML in Radiology"))
  }

  test("pubmed two-phase scan fetches exactly the esearch ids; decoys dropped") {
    val ids = Articles.FixturePubmed.esearchIds(spark).as[String].collect().toSet
    assert(ids == Set("p1", "p2"))
    val details = Articles.FixturePubmed.efetchDetails(spark)
    // the detail phase KNOWS about p3, but fetch must never ingest it
    assert(details.select("pmid").as[String].collect().toSet == Set("p1", "p2", "p3"))
    val fetched = Articles.FixturePubmed.fetch(spark, Seq())
      .select("url").as[String].collect().toSet
    assert(fetched == Set("http://p1", "http://p2"))
    // negative case: the anti-join of details vs ids is exactly the decoy
    val dropped = details.join(Articles.FixturePubmed.esearchIds(spark), Seq("pmid"), "left_anti")
      .select("pmid").as[String].collect().toSeq
    assert(dropped == Seq("p3"))
  }

  test("from_xml parses repeated Atom author elements into an array") {
    import org.apache.spark.sql.functions.{col, expr, from_xml, lit}
    val xml = "<entry><id>u</id><title>T</title><summary>S</summary>" +
      "<published>2024-02-03T00:00:00Z</published>" +
      "<author><name>A One</name></author><author><name>B Two</name></author></entry>"
    val r = Seq(xml).toDF("xml")
      .select(from_xml(col("xml"), lit(Articles.FixtureArxiv.atomSchema)).as("e"))
      .select(expr("transform(e.author, a -> a.name)").as("authors"),
        expr("substring(e.published, 1, 4)").as("year"))
      .as[(Seq[String], String)].head()
    assert(r._1 == Seq("A One", "B Two"))
    assert(r._2 == "2024")
  }

  test("keyword tree respects depth, fanout, and the visited set") {
    val docs = Tables.documents(spark, sfDir)
    val edges = KeywordTree.expand(docs, Seq("join"), depth = 2, fanout = 3)
      .select("parent", "child", "depth").as[(String, String, Long)].collect()
    assert(edges.map(_._3).max <= 2)
    // fanout bound per (parent, depth)
    edges.groupBy(e => (e._1, e._3)).foreach { case (_, g) => assert(g.length <= 3) }
    // a level-1 child never reappears as a level-2 child (visited pruning)
    val l1 = edges.filter(_._3 == 1L).map(_._2).toSet
    val l2 = edges.filter(_._3 == 2L).map(_._2).toSet
    assert(l1.intersect(l2).isEmpty)
    assert(!l2.contains("join"))
  }

  test("keyword tree subset-word pruning: a multi-word seed never yields its own words") {
    val docs = Seq(
      (0L, "hash join merge sort hash join scan"),
      (1L, "hash join filter scan")).toDF("doc_id", "text")
    val edges = KeywordTree.expand(docs, Seq("hash join"), depth = 1, fanout = 5)
      .select("child").as[String].collect().toSet
    // 'hash' and 'join' are words of the parent term — pruned (C5,
    // scrappy.py:483); genuinely new directions survive.
    assert(!edges.contains("hash") && !edges.contains("join"))
    assert(edges.contains("scan"))
  }

  test("classifier separates its own training data") {
    val model = ml.TextClassifier.train(spark)
    val preds = ml.TextClassifier.predict(spark, model, ml.TextClassifier.trainingData.map(_._1))
      .as[(String, String)].collect().toMap
    val truth = ml.TextClassifier.trainingData.toMap
    val acc = truth.count { case (t, l) => preds(t) == l }.toDouble / truth.size
    assert(acc >= 0.9, s"training accuracy $acc")
  }
}
