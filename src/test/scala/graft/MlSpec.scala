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

  test("q169 frozen-codebook delta assignment: full coverage, partitioning-independent, argmin-optimal") {
    val out = SparkEntry.queries("q169_ivf_delta")(spark, sfDir)
      .select($"label".as[Long], $"n_base".as[Long], $"n_delta".as[Long]).collect()
    val emb = Tables.embeddings(spark, sfDir)
    val total = emb.count()
    assert(out.map(r => r._2 + r._3).sum == total, "every vector lands in exactly one label")
    assert(out.map(_._3).sum == emb.filter($"vec_id" % 10 === 0).count())

    // Frozen assignment is argmin against the published centroids.
    val (_, centsRow) = ml.LloydKMeans.fit(emb.filter($"vec_id" % 10 =!= 0), 8, 2)
    val cents = centsRow.select($"cc".as[Seq[Seq[Double]]]).head()
    val deltas = ml.LloydKMeans.assignFrozen(emb.filter($"vec_id" % 10 === 0), centsRow)
      .as[(Long, Int)].collect().toMap
    val vecs = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect()
    vecs.foreach { case (id, v) =>
      val d = cents.map(c => v.zip(c).map { case (x, cx) => (x.toDouble - cx) * (x.toDouble - cx) }.sum)
      assert(deltas(id) == d.indexOf(d.min), s"vec $id not argmin-assigned")
    }

    // Repartitioning the delta batch changes nothing.
    val rep = ml.LloydKMeans.assignFrozen(
      emb.filter($"vec_id" % 10 === 0).repartition(5), centsRow)
      .as[(Long, Int)].collect().toMap
    assert(rep == deltas)
  }

  test("q170 SemDeDup: dup edges valid, kept set is an independent set under the cos threshold") {
    val out = SparkEntry.queries("q170_semdedup")(spark, sfDir)
      .select($"vec_id".as[Long], $"cluster".as[Long], $"crank".as[Long],
        $"dup_of".as[Long], $"kept".as[Boolean]).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect().toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.zip(vb).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
      def n(v: Seq[Float]) = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      BigDecimal(dot / (n(va) * n(vb))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.exists(!_._5) && out.exists(_._5), "both verdicts should occur")
    // every dup edge: same cluster, better-ranked partner, cos >= τ
    out.filter(!_._5).foreach { case (id, cl, rk, dof, _) =>
      val p = byId(dof)
      assert(p._2 == cl && p._3 < rk, s"$id dup_of $dof rank/cluster wrong")
      assert(cos(id, dof) >= 0.3, s"$id-$dof cos ${cos(id, dof)} below τ")
    }
    // the greedy contract makes the kept set τ-independent per cluster
    out.filter(_._5).groupBy(_._2).foreach { case (_, ms) =>
      for (Array(a, b) <- ms.map(_._1).combinations(2).map(_.toArray))
        assert(cos(a, b) < 0.3, s"kept pair $a,$b at cos ${cos(a, b)}")
    }
  }

  test("q74 GD unroll: ≥0.9 train accuracy, margins off the threshold, agrees with spark.ml") {
    val model = ml.GdClassifier.fit()
    val acc = ml.TextClassifier.trainingData.count { case (text, label) =>
      (ml.GdClassifier.margin(model, text) > 0) == (label == "threat")
    }.toDouble / ml.TextClassifier.trainingData.size
    assert(acc >= 0.9, s"GD train accuracy $acc below the M1 bar")
    // hash robustness: no q74 query margin sits at the decision threshold,
    // so engine-level float summation order cannot flip a label
    ml.MlQueries.Q74Queries.foreach { q =>
      assert(math.abs(ml.GdClassifier.margin(model, q)) > 0.05,
        s"margin for '$q' too close to 0: ${ml.GdClassifier.margin(model, q)}")
    }
    // the distributed predict equals the driver-side margins
    val got = ml.GdClassifier.predictDf(spark, model, ml.MlQueries.Q74Queries)
      .as[(String, String)].collect().toMap
    ml.MlQueries.Q74Queries.foreach { q =>
      val want = if (ml.GdClassifier.margin(model, q) > 0) "threat" else "infrastructure"
      assert(got(q) == want, s"predictDf disagrees with margin for '$q'")
    }
    // and the spark.ml pipeline (the API-parity artifact) agrees
    val lr = ml.TextClassifier.train(spark)
    val mlPred = ml.TextClassifier.predict(spark, lr, ml.MlQueries.Q74Queries)
      .as[(String, String)].collect().toMap
    assert(mlPred == got, s"spark.ml $mlPred vs GD $got")
  }

  test("MLlib KMeans capability path keeps the M5 contract (doc -> topic over k clusters)") {
    val assigned = ml.Topics.cluster(Tables.embeddings(spark, sfDir), k = 8)
    val n = assigned.count()
    assert(n == Tables.embeddings(spark, sfDir).count())
    val ids = assigned.select(countDistinct("topic_id")).as[Long].head()
    assert(ids >= 2 && ids <= 8)
  }
}
