package graft

import graft.operators.{Ingest, KeywordTree}
import org.scalatest.funsuite.AnyFunSuite

/** Golden outputs (SURVEY.md §5.4): the composite pipelines on a frozen
  * literal corpus, pinned row-for-row. Any semantic drift in tokenization,
  * novelty filtering, ranking, or visited pruning breaks these.
  */
class GoldenSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark join scan filter join"),
    (1L, "join scan hash join spark"),
    (2L, "filter scan filter merge sort"),
    (3L, "merge sort spark filter"),
    (4L, "hash join merge scan")).toDF("doc_id", "text")

  test("golden: keyword tree on the frozen corpus") {
    val got = KeywordTree.expand(corpus, Seq("join"), depth = 2, fanout = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    // Hand-verified: level 1 from docs 0/1/4 (scan 3; hash ties spark at 2,
    // 'hash' wins alphabetically); level 2 excludes visited {join,hash,scan}.
    val golden = Seq(
      ("join", "scan", 1L, 3L), ("join", "hash", 1L, 2L),
      ("hash", "merge", 2L, 1L), ("hash", "spark", 2L, 1L),
      ("scan", "filter", 2L, 3L), ("scan", "merge", 2L, 2L))
    assert(got == golden)
  }

  test("golden: nested topic_tree.json artifact matches the committed file") {
    // The reference's observable --build-tree output (scrappy.py:539-540):
    // recursively nested dict, leaves {}, rendered as json.dump(indent=2).
    val edges = KeywordTree.expand(corpus, Seq("join"), depth = 2, fanout = 2)
    val got = KeywordTree.toNestedJson(edges, Seq("join"))
    val golden = new String(
      getClass.getResourceAsStream("/golden/topic_tree.json").readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).stripTrailing()
    assert(got == golden, s"\n--- got ---\n$got\n--- golden ---\n$golden")
  }

  test("golden: suggest terms on the frozen corpus") {
    val got = Ingest.suggestTerms(corpus, Seq("spark"), topN = 3, examples = 1)
      .as[(String, Long, Long, String)].collect().toSeq
    // Hand-verified: join 5, filter/scan tie at 4 ('filter' first); 'spark'
    // excluded as an existing term; first containing doc is the example.
    val golden = Seq(
      ("join", 5L, 0L, "spark join scan filter join"),
      ("filter", 4L, 0L, "spark join scan filter join"),
      ("scan", 4L, 0L, "spark join scan filter join"))
    assert(got == golden)
  }
}
