package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M5 clustering behavior the DuckDB oracle can't see: the LloydKMeans
  * unroll's distributed-determinism claim (assignments independent of
  * input partitioning — the property that makes q52/q72 hash-checkable
  * on a cluster, not just on local[n]), the learned-quantizer recall
  * advantage q52's header claims, and the MLlib KMeans capability
  * surface kept alongside the oracled path.
  */
class MlSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("LloydKMeans assignment is partitioning-independent and covers every vector") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = ml.LloydKMeans.assign(emb, k = 8, lloydIters = 2)
      .as[(Long, Int)].collect().toMap
    val repart = ml.LloydKMeans.assign(emb.repartition(7), k = 8, lloydIters = 2)
      .as[(Long, Int)].collect().toMap
    assert(base == repart, "assignment depends on input partitioning")
    assert(base.size == emb.count())
    val sizes = base.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.forall(c => c >= 0 && c < 8))
    assert(sizes.size >= 2, s"degenerate clustering: $sizes")
  }

  test("q52 learned coarse quantizer beats q51's random labels on recall vs exact top-10") {
    def tops(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir)
        .select($"qid".as[Long], $"vec_id".as[Long]).collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = tops("q50_knn_bruteforce")
    val learned = tops("q52_knn_ivf_kmeans")
    val random = tops("q51_knn_ivf")
    val rl = exact.keys.toSeq.map(q => (exact(q) & learned(q)).size / 10.0)
    val rr = exact.keys.toSeq.map(q => (exact(q) & random(q)).size / 10.0)
    // measured r5 at sf0.01: learned 0.7-1.0 per query, random 0.3
    rl.foreach(r => assert(r >= 0.6, s"learned recall $r below floor; all=$rl"))
    assert(rl.sum / rl.size > rr.sum / rr.size,
      s"learned ($rl) should beat random ($rr)")
  }

  test("MLlib KMeans capability path keeps the M5 contract (doc -> topic over k clusters)") {
    val assigned = ml.Topics.cluster(Tables.embeddings(spark, sfDir), k = 8)
    val n = assigned.count()
    assert(n == Tables.embeddings(spark, sfDir).count())
    val ids = assigned.select(countDistinct("topic_id")).as[Long].head()
    assert(ids >= 2 && ids <= 8)
  }
}
