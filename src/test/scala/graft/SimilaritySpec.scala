package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSuite {

  /** Concatenated cause-chain messages — Spark wraps codegen/eval
    * failures, so guard tests match on the root text. */
  private def rootMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  import spark.implicits._

  test("brute-force top-1 of an exact duplicate vector is that duplicate with cos=1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.6f, 0.8f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.cosineTopK(emb, Seq(0L), 3)
      .select("vec_id", "rn", "cos").as[(Long, Long, Double)].collect()
    assert(got.head == ((1L, 1L, 1.0)))          // duplicate first
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L)) // then by cosine desc
  }

  test("ivf with nprobe = all labels equals brute force") {
    val emb = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f), 0), (1L, Array(0.9f, 0.2f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f, 0.2f), 1), (3L, Array(0.1f, 0.9f, 0.3f), 1))
      .toDF("vec_id", "embedding", "label")
    val bf = Similarity.cosineTopK(emb, Seq(0L), 3).select("vec_id", "rn").collect().toSeq
    val ivf = Similarity.ivfTopK(emb, Seq(0L), 3, nprobe = 2).select("vec_id", "rn").collect().toSeq
    assert(bf == ivf)
  }

  test("IVF at the file level: probed-label filter prunes partitions at the scan") {
    // SCALE.md's IVF claim made concrete: with the corpus laid out
    // partitionBy(label) — the coarse quantizer as the physical layout —
    // the candidate scan of the probed labels is PartitionFilters pruning,
    // so nprobe-of-N reads nprobe/N of the FILES, not a filtered full scan.
    val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Tables.embeddings(spark, sfDir)
      .write.mode("overwrite").partitionBy("label").parquet(out)
    val probed = Seq(1, 3) // the labels a query's nprobe=2 probe selected
    val scan = spark.read.parquet(out).filter(col("label").isInCollection(probed))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("label"), plan.take(600))
    // pruning is real: the scanned files all come from the probed dirs
    val files = scan.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => probed.exists(l => f.contains(s"label=$l"))), files.take(3).mkString)
  }

  test("codegen'd long_vec_dot equals the interpreted HOF dot on the q270 code table") {
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("mx", expr(
        "aggregate(embedding, 0D, (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
      .withColumn("codes", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D / mx + 0.5D) AS BIGINT))"))
      .select($"vec_id", $"codes")
    val pairs = e.crossJoin(e.limit(5)
      .select($"vec_id".as("qid"), $"codes".as("qcodes")))
    val both = pairs.select($"vec_id", $"qid",
      graft.functions.VectorExprs.longVecDot($"codes", $"qcodes").as("fast"),
      expr("aggregate(zip_with(codes, qcodes, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("hof"))
    assert(both.filter($"fast" =!= $"hof").count() == 0)
    assert(both.count() > 0)
  }

  test("codegen'd vec_sketch equals the interpreted HOF sketch on the corpus") {
    val e = Tables.embeddings(spark, sfDir)
    val both = e.select($"vec_id",
      operators.Similarity.sketchCol($"embedding").as("fast"),
      expr(operators.Similarity.sketchSpark).as("hof"))
    assert(both.filter($"fast" =!= $"hof").count() == 0)
    assert(both.count() > 0)
  }

  test("q57 PQ codes are valid and argmin-optimal per vector") {
    // Argmin optimality: reconstructing from the CHOSEN codes can never
    // be worse than pinning every subspace to centroid 0 — per subspace
    // d(chosen) ≤ d(0) by definition, so it holds per vector, exactly.
    val cbVals = operators.Similarity.pqCodebook.mkString(", ")
    val q57 = SparkEntry.queries("q57_pq_quantize")(spark, sfDir)
    assert(q57.filter(!$"codes_str".rlike("^[0-3]{8}$")).count() == 0)
    val base = Tables.embeddings(spark, sfDir)
      .withColumn("cb", expr(s"array(${cbVals})"))
      .select($"vec_id", (expr(
        """aggregate(sequence(0, 7), 0D, (a, m) ->
          |a + aggregate(sequence(0, 7), 0D, (a2, j) ->
          |a2 + pow(CAST(embedding[m*8+j] AS DOUBLE) - cb[j], 2D))) / 64.0D"""
          .stripMargin.replace("\n", " ")) * lit(1e6)).as("mse0"))
    val joined = q57.join(base, "vec_id")
    assert(joined.count() > 0)
    assert(joined.filter($"mse_e6" > $"mse0" + lit(1e-6)).count() == 0)
  }

  test("q123 fusion matches a local recompute of both candidate lists") {
    val got = SparkEntry.queries("q123_hybrid_rrf")(spark, sfDir)
      .select("id", "t_rank", "v_rank", "rrf")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 20)
    // lexical side: q59's (already oracled) scores in rank order
    val tRanks = SparkEntry.queries("q59_bm25")(spark, sfDir)
      .select("doc_id").as[Long].collect().take(100)
      .zipWithIndex.map { case (d, i) => d -> (i + 1).toLong }.toMap
    // dense side: cosine to vec 0 recomputed locally with the same
    // sequential double fold and 6-dp rounding
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    val qe = vecs.find(_._1 == 0L).get._2
    val (qn0) = norm(qe)
    val vRanks = vecs
      .map { case (id, e) =>
        id -> BigDecimal(dot(e, qe) / (norm(e) * qn0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy { case (id, c) => (-c, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (tRanks.keySet ++ vRanks.keySet).toSeq
      .map { id =>
        val (t, v) = (tRanks.get(id), vRanks.get(id))
        (id, t.getOrElse(-1L), v.getOrElse(-1L),
          t.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            v.map(r => 1.0 / (60 + r)).getOrElse(0.0))
      }
      .sortBy { case (id, _, _, r) => (-r, id) }.take(20)
      .map { case (id, t, v, r) =>
        (id, t, v, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.toSeq == expected, s"got=${got.take(5).toSeq} expected=${expected.take(5)}")
  }

  test("q134 ADC search: unit-norm premise holds and compressed ranking recalls ≥ 0.5 of exact top-10") {
    import spark.implicits._
    // the codebook's justification: coordinates of unit-norm vectors
    val norms = Tables.embeddings(spark, sfDir)
      .select("embedding").as[Seq[Float]].collect()
      .map(e => math.sqrt(e.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5, s"non-unit norm $n"))
    val approx = SparkEntry.queries("q134_adc_search")(spark, sfDir)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = SparkEntry.queries("q50_knn_bruteforce")(spark, sfDir)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(approx.keySet == Set(0L, 1L, 2L) && exact.keySet == approx.keySet)
    val recalls = approx.map { case (q, ids) => (exact(q) & ids).size / 10.0 }
    // measured 0.6 / 0.9 / 0.9 on this corpus — floor each query at 0.5
    // and the mean at 0.6 (vs 0.07 for q57's deliberately coarse 4-centroid
    // multi-dim codebook, the gap the scaladoc documents)
    recalls.foreach(r => assert(r >= 0.5, s"recall $r below floor; all=$recalls"))
    assert(recalls.sum / recalls.size >= 0.6, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("q140 hard negatives: exact non-dup top-5 per query, and the dup exclusion bites") {
    val got = SparkEntry.queries("q140_hard_negatives")(spark, sfDir)
      .select("qid", "vec_id", "rn", "cos").as[(Long, Long, Long, Double)].collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      def n(v: Seq[Float]) = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      r6(d / (n(a) * n(b)))
    }
    // the exclusion relation is q127's own published fused pair set
    val dup = SparkEntry.queries("q127_signal_fusion")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val qids = Seq(0L, 1L, 2L)
    val expected = qids.flatMap { q =>
      emb.keys.toSeq.filter(v => v != q && !dup((q, v)))
        .map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5)
        .zipWithIndex.map { case ((v, c), i) => (q, v, i + 1L, c) }
    }
    assert(got.toSeq == expected)
    got.foreach { case (q, v, _, _) => assert(!dup((q, v)), s"($q,$v) is a near-dup") }
    // non-vacuity: at least one query's UNFILTERED top-5 contains a
    // near-dup (so excluding dups actually changed the mined batch)
    val shifted = qids.exists { q =>
      emb.keys.toSeq.filter(_ != q).map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5).exists { case (v, _) => dup((q, v)) }
    }
    assert(shifted, "no dup in any unfiltered top-5 — exclusion vacuous on this corpus")
  }

  test("q141 cascade: exact replay of both stages; recall vs exact top-10 at the documented point") {
    val got = SparkEntry.queries("q141_truncated_rerank")(spark, sfDir)
      .select("qid", "vec_id", "rn", "cos").as[(Long, Long, Long, Double)].collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      def n(v: Seq[Float]) = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      r6(d / (n(a) * n(b)))
    }
    val qids = Seq(0L, 1L, 2L)
    // replay the two stages locally: 32-dim coarse top-100, exact re-rank
    val expected = qids.flatMap { q =>
      val coarse = emb.keys.toSeq.filter(_ != q)
        .map(v => (v, cos(emb(q).take(32), emb(v).take(32))))
        .sortBy { case (v, c) => (-c, v) }.take(100).map(_._1)
      coarse.map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10)
        .zipWithIndex.map { case ((v, c), i) => (q, v, i + 1L, c) }
    }
    assert(got.toSeq == expected)
    // measured operating point: per-query recall vs the exact top-10
    val recalls = qids.map { q =>
      val exact = emb.keys.toSeq.filter(_ != q).map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10).map(_._1).toSet
      val casc = got.filter(_._1 == q).map(_._2).toSet
      (exact & casc).size / 10.0
    }
    // measured 1.0 / 0.8 / 0.7 — floor each at 0.6 and the mean at 0.75
    recalls.foreach(r => assert(r >= 0.6, s"recall $r below floor; all=$recalls"))
    assert(recalls.sum / recalls.size >= 0.75, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("q166 trained PQ beats q57's pinned codebook on reconstruction MSE") {
    // The point of training: q57's scaladoc documents WHY its pinned
    // shared codebook is bad (can't fit 8-dim cells); q166 is the fix.
    def meanMse(name: String): Double = {
      val v = SparkEntry.queries(name)(spark, sfDir)
        .select($"mse_e6".as[Double]).collect()
      v.sum / v.size
    }
    val trained = meanMse("q166_pq_trained")
    val pinned = meanMse("q57_pq_quantize")
    assert(trained < pinned / 2,
      s"trained PQ mean MSE $trained should be well below pinned $pinned")
    // codes stay valid 8-digit base-4 strings like q57's
    val q166 = SparkEntry.queries("q166_pq_trained")(spark, sfDir)
    assert(q166.filter(!$"codes_str".rlike("^[0-3]{8}$")).count() == 0)
  }

  test("q264 recall rows replay from the published method queries; cost columns match first principles") {
    // The audit must agree with what the deployed queries actually
    // return: recompute tp for each method by joining that method's OWN
    // published top-10 (q134/q51/q53/q141) against q50's — the audit
    // row's tp/recall must match exactly.
    val audit = SparkEntry.queries("q264_ann_operating_point")(spark, sfDir)
      .select($"method", $"n_cand", $"n_truth", $"tp", $"recall_at_10")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val truth = SparkEntry.queries("q50_knn_bruteforce")(spark, sfDir)
      .select("qid", "vec_id")
    def tpOf(name: String): Long =
      SparkEntry.queries(name)(spark, sfDir).select("qid", "vec_id")
        .join(truth, Seq("qid", "vec_id")).count()
    val byMethod = Map("adc" -> "q134_adc_search", "ivf" -> "q51_knn_ivf",
      "lsh" -> "q53_knn_lsh", "rerank32" -> "q141_truncated_rerank")
    byMethod.foreach { case (m, q) =>
      assert(audit(m)._4 == tpOf(q), s"$m tp drifted from $q's published top-10")
      assert(audit(m)._5 == math.round(audit(m)._4 * 10000.0 / audit(m)._3) / 10000.0)
    }
    // cost columns from first principles: adc scans the whole compressed
    // corpus per query; rerank32 re-scores exactly k1=100 per query.
    val n = Tables.embeddings(spark, sfDir).count()
    assert(audit("adc")._2 == 3 * (n - 1))
    assert(audit("rerank32")._2 == 3 * math.min(100, n - 1))
    assert(audit.values.forall(r => r._3 == 30 && r._4 <= 30 && r._2 > 0))
    // the cascade premise: stage-2 cost is a tiny fraction of the full scan
    assert(audit("rerank32")._2 < audit("adc")._2 / 2)
  }

  test("q270 semantic decontam: cascade output equals the exact brute force (recall 1.0)") {
    val got = SparkEntry.queries("q270_semantic_decontam")(spark, sfDir)
      .as[(Long, Int, Double, Long, Boolean)].collect().toSeq
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect().toSeq
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]) = math.sqrt(dot(a, a))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eval = e.filter(_._1 % 20 == 0)
    val train = e.filter(_._1 % 20 != 0)
    // Because the int8 screen bound admits every true-τ pair, the gate's
    // published output must equal the EXACT brute-force gate with sub-τ
    // rows masked — this local replay is the recall-1.0 proof run
    // end-to-end, with no reference to the screen at all.
    val expected = train.map { case (id, lab, emb) =>
      val best = eval.map { case (qid, _, qe) =>
        (r6(dot(emb, qe) / (norm(emb) * norm(qe))), qid) }
        .maxBy { case (c, q) => (c, -q) }
      if (best._1 >= 0.40) (id, lab, best._1, best._2, true)
      else (id, lab, -1.0, -1L, false)
    }.sortBy(_._1)
    assert(got == expected)
    // the gate discriminates, and every match points into the eval split
    val flagged = got.count(_._5)
    assert(flagged > 0 && flagged < got.size)
    got.filter(_._4 >= 0).foreach { r =>
      assert(r._4 % 20 == 0 && r._1 % 20 != 0, s"row $r")
    }
  }

  test("q270 screen bound: local int8 replay dominates the exact cosine on every pair") {
    val e = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]) = math.sqrt(dot(a, a))
    case class Q(id: Long, emb: Seq[Float], nrm: Double, s: Double, codes: Seq[Long], csum: Long)
    val qs = e.map { case (id, emb) =>
      val mx = emb.foldLeft(0.0) { (a, x) => math.max(a, math.abs(x.toDouble)) }
      val codes = emb.map(x => math.floor(x.toDouble * 127.0 / mx + 0.5).toLong)
      Q(id, emb, norm(emb), mx / 127.0, codes, codes.map(math.abs).sum)
    }
    val eval = qs.filter(_.id % 20 == 0)
    val train = qs.filter(_.id % 20 != 0)
    var margins = List.empty[Double]
    for (t <- train; q <- eval) {
      val codeDot = t.codes.zip(q.codes).map { case (a, b) => a * b }.sum
      val ub = t.s * q.s * (codeDot + 0.5 * t.csum + 0.5 * q.csum + 64 / 4.0) /
        (t.nrm * q.nrm)
      val cos = dot(t.emb, q.emb) / (t.nrm * q.nrm)
      assert(ub >= cos, s"bound violated for (${t.id}, ${q.id}): ub=$ub cos=$cos")
      margins ::= ub - cos
    }
    // the margin is real but small — the screen prunes aggressively while
    // provably admitting every boundary (round-6) flag
    assert(margins.min > 1e-4 && margins.max < 0.05)
  }

  test("q271 operating point: recall is exactly 1.0 and the rescore set is tiny") {
    val Array(r) = SparkEntry.queries("q271_decontam_operating_point")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double, Long, Long, Long)].collect()
    val cascadeFlagged = SparkEntry.queries("q270_semantic_decontam")(spark, sfDir)
      .filter($"contaminated").count()
    assert(r._4 == cascadeFlagged) // the audit counts the deployed gate's flags
    // exact side recomputed locally (sequential fold + 6-dp rounding)
    val e = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]) = math.sqrt(dot(a, a))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eval = e.filter(_._1 % 20 == 0)
    val train = e.filter(_._1 % 20 != 0)
    val exactFlagged = train.count { case (_, emb) =>
      eval.map { case (_, qe) => r6(dot(emb, qe) / (norm(emb) * norm(qe))) }.max >= 0.40
    }
    assert(r._3 == exactFlagged)
    assert(r._1 == train.length && r._2 == eval.length)
    // the cascade's contract: zero misses, recall exactly 1.0
    assert(r._4 == r._3 && r._5 == 0L && r._6 == 1.0)
    // ...at a float64 rescore cost ≪ the exact pair scan; the published
    // screen cost records the deterministic full sweep (screened_pairs =
    // exact_pairs BY DESIGN — a future probabilistic screen shows up here)
    assert(r._7 == r._1 * r._2 && r._8 == r._7 && r._9 < r._7 / 100)
  }

  test("decontam guards: zero vector fails loudly; oversized eval side fails fast") {
    import org.apache.spark.sql.functions.col
    // a zero vector must raise, not silently vanish from the screen
    val bad = Seq(
      (0L, 0, Seq.fill(64)(0.1f)),
      (1L, 0, Seq.fill(64)(0.0f)),
      (20L, 0, Seq.fill(64)(0.2f)))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[Exception] {
      operators.Similarity.semanticDecontam(bad).collect()
    }
    assert(rootMsg(ex).contains("zero-magnitude embedding"),
      s"unexpected failure: ${rootMsg(ex).take(300)}")
    // the O(N_train × N_eval) contract is assertable and IN-PLAN (r11
    // ADVICE: the old eager count made mere construction run a Spark
    // job): building the frame is action-free; executing it refuses
    // while the eval broadcast is being built — before any pair work
    val ok = Tables.embeddings(spark, sfDir)
    val gated = operators.Similarity.semanticDecontam(ok, maxEvalRows = 1L)
    val ex2 = intercept[Exception] { gated.collect() }
    assert(rootMsg(ex2).contains("maxEvalRows"),
      s"unexpected failure: ${rootMsg(ex2).take(300)}")
  }

  test("long_vec_dot refuses a length mismatch instead of truncating") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(functions.VectorExprs.longVecDot(col("a"), col("b"))).collect()
    }
    assert(rootMsg(ex).contains("length mismatch"),
      s"unexpected failure: ${rootMsg(ex).take(300)}")
  }
}
