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
