package graft

import graft.operators.Components.connectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def labels(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    connectedComponents(pairs.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("two components, min id wins, orientation/duplicates/self-loops ignored") {
    val m = labels(Seq((2L, 1L), (2L, 3L), (3L, 2L), (3L, 3L), (10L, 20L), (10L, 20L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 20L -> 10L))
  }

  test("long chain converges (the adversarial diameter case for label propagation)") {
    // A 200-node path has diameter 199: one-hop min propagation would need
    // ~200 rounds; large-star/small-star must land well under maxIter=50.
    val m = labels((1L until 200L).map(i => (i, i + 1)))
    assert(m.size == 200 && m.values.forall(_ == 1L))
  }

  test("star with a high-degree hub keeps one component") {
    val m = labels((2L to 500L).map(i => (1000L, i)) :+ (1000L, 5L))
    assert(m.values.toSet == Set(2L) && m.size == 500)
  }

  test("q167 equals a local 3-round sync replay and never crosses a component") {
    val edges = operators.Corpus5.shingleEdges(Tables.documents(spark, sfDir))
      .as[(Long, Long)].collect()
    assume(edges.nonEmpty)
    val out = SparkEntry.queries("q167_label_propagation")(spark, sfDir)
      .select("doc_id", "community").as[(Long, Long)].collect().toMap

    // Local synchronous replay: 3 rounds of min over self + neighbors.
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3)
      lbl = lbl.map { case (v, l) => v -> (adj(v).map(lbl) :+ l).min }
    assert(out == lbl)

    // Labels refine INSIDE the converged closure: every 3-round
    // community sits within one true connected component, bounded
    // below by its root.
    val comp = connectedComponents(
      Tables.documents(spark, sfDir).sparkSession
        .createDataset(edges.toSeq).toDF("va", "vb"))
      .select("id", "comp").as[(Long, Long)].collect().toMap
    out.foreach { case (v, l) =>
      assert(comp(l) == comp(v), s"label $l of $v crossed components")
      assert(l >= comp(v), s"label $l below component root ${comp(v)}")
    }
  }

  test("q171 k-core peel matches a local iterative replay") {
    val edges = operators.Corpus5.shingleEdges(Tables.documents(spark, sfDir))
      .as[(Long, Long)].collect()
    assume(edges.nonEmpty)
    val out = SparkEntry.queries("q171_kcore_peel")(spark, sfDir)
      .select("doc_id", "deg", "deg0").as[(Long, Long, Long)].collect()

    val sym = (edges ++ edges.map(_.swap)).distinct
    val deg0 = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var cur = sym
    for (_ <- 1 to 3) {
      val deg = cur.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      cur = cur.filter { case (u, v) => keep(u) && keep(v) }
    }
    val expected = cur.groupBy(_._1).view
      .mapValues(_.size.toLong).toSeq
      .map { case (u, d) => (u, d, deg0(u)) }
      .sortBy(_._1)
    assert(out.toSeq == expected)
  }

  test("q55 clusters are consistent with q41 pairs (every pair same comp, comps connect)") {
    val pairs = operators.Dedup.lshVerifiedPairs(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect()
    assume(pairs.nonEmpty)
    val comp = operators.Components.defs.head.fn(spark, sfDir)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    // Soundness: both endpoints of every verified pair share a component.
    assert(pairs.forall { case (a, b) => comp(a) == comp(b) })
    // Rootedness: each component id is the minimum member id and a member.
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c)
    }
  }
}
