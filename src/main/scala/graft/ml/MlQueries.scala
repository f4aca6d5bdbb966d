package graft.ml

import graft.QueryDef
import graft.operators.{Similarity, TextAnalytics}

/** ML surface entries (M1/M2/M5). Since r5, q72 and q52 cluster with the
  * deterministic [[LloydKMeans]] unroll and carry full DuckDB oracles
  * (r4 verdict item #5); since r7, q74's logistic-regression fit is the
  * deterministic [[GdClassifier]] GD unroll with its own oracle; since
  * r12 q92 is hash-oracled too (first-principles register form), so
  * every declared query carries a DuckDB oracle.
  */
object MlQueries {

  private val km = LloydKMeans.assignDuckCte(k = 8, lloydIters = 2)
  private val kmFinal = LloydKMeans.finalAssignCte(lloydIters = 2)

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q72_topic_summary",
      (s, dir) => Topics.topicSummary(s, dir),
      Some(s"""WITH $km,
              |tk AS (SELECT a.cl AS topic_id, t.term
              |FROM $kmFinal a JOIN (SELECT doc_id, unnest(${TextAnalytics.toksDuck}) AS term
              |FROM documents) t ON t.doc_id = a.vec_id
              |WHERE t.term NOT IN (${TextAnalytics.stopSqlList})),
              |cnts AS (SELECT topic_id, term, count(*) AS cnt FROM tk GROUP BY 1, 2),
              |rk AS (SELECT topic_id, term, cnt,
              |row_number() OVER (PARTITION BY topic_id ORDER BY cnt DESC, term) AS rn FROM cnts),
              |top AS (SELECT topic_id, string_agg(term, ',' ORDER BY rn) AS top_terms
              |FROM rk WHERE rn <= 5 GROUP BY topic_id),
              |sizes AS (SELECT cl AS topic_id, count(*) AS n_docs FROM $kmFinal GROUP BY 1)
              |SELECT CAST(s.topic_id AS BIGINT) AS topic_id, s.n_docs, t.top_terms
              |FROM sizes s LEFT JOIN top t ON s.topic_id = t.topic_id
              |ORDER BY topic_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q52_knn_ivf_kmeans",
      // IVF with a LEARNED coarse quantizer: deterministic-Lloyd cluster
      // ids replace the (random) label column, so the probed partitions
      // actually contain the near neighbors (see SimilaritySpec for the
      // recall comparison). The oracle is q51's IVF chain over the
      // LloydKMeans assignment CTEs.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = graft.Tables.embeddings(s, dir)
        val relabeled = emb.drop("label")
          .join(LloydKMeans.assign(emb, k = 8, lloydIters = 2), "vec_id")
          .withColumnRenamed("cl", "label")
          .select("vec_id", "label", "embedding")
        Similarity.ivfTopK(relabeled, Seq(0L, 1L, 2L), 10, nprobe = 2)
      },
      Some(s"""WITH $km,
              |e AS (SELECT em.vec_id, a.cl AS label, em.embedding,
              |${Similarity.duckNorm("em.embedding")} AS nrm
              |FROM embeddings em JOIN $kmFinal a ON em.vec_id = a.vec_id),
              |dims AS (SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
              |FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
              |cent AS (SELECT label, pos, avg(v) AS cv FROM dims GROUP BY 1, 2),
              |centnorm AS (SELECT label, sqrt(sum(cv * cv)) AS cn FROM cent GROUP BY 1),
              |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id IN (0, 1, 2)),
              |qdims AS (SELECT qid, qn, i AS pos, CAST(qe[i] AS DOUBLE) AS qv
              |FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) g),
              |qc AS (SELECT qd.qid, c.label, round(sum(qv * cv) / (any_value(qd.qn) * any_value(cn.cn)), 6) AS cscore
              |FROM qdims qd JOIN cent c ON qd.pos = c.pos JOIN centnorm cn ON c.label = cn.label
              |GROUP BY 1, 2),
              |probed AS (SELECT qid, label FROM (SELECT qid, label,
              |row_number() OVER (PARTITION BY qid ORDER BY cscore DESC, label) AS pr FROM qc) p WHERE pr <= 2),
              |sc AS (SELECT q.qid, e.vec_id, round(${Similarity.duckDot("e.embedding", "qe")} / (e.nrm * qn), 6) AS cos
              |FROM e JOIN probed ON e.label = probed.label JOIN q ON q.qid = probed.qid
              |WHERE e.vec_id <> q.qid),
              |r AS (SELECT qid, vec_id, cos,
              |row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM sc)
              |SELECT qid, vec_id, rn, cos FROM r WHERE rn <= 10 ORDER BY qid, rn""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q169_ivf_delta",
      // INCREMENTAL INDEX MAINTENANCE — the vector-store operation
      // between retrains: a delta batch (vec_id % 10 = 0, the "new
      // ingest") is assigned to the FROZEN coarse quantizer trained on
      // the base corpus (LloydKMeans.fit on vec_id % 10 <> 0), and the
      // output is the per-label occupancy ledger — base vs delta counts
      // and shares — the signal a store watches to decide when drift
      // warrants a retrain. No retraining happens: the delta pass is
      // one zero-shuffle projection against the broadcast codebook plus
      // one label-keyed count, which is why this scales to continuous
      // ingest (the 100 TB base is never touched). Oracle: the km CTE
      // chain parametrized over the base relation + one frozen-assign
      // CTE for the delta.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = graft.Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 10 =!= 0)
        val delta = emb.filter(col("vec_id") % 10 === 0)
        val (baseAssign, cents) = LloydKMeans.fit(base, k = 8, lloydIters = 2)
        val deltaAssign = LloydKMeans.assignFrozen(delta, cents)
        val nb = baseAssign.groupBy("cl").agg(count(lit(1)).as("n_base"))
        val nd = deltaAssign.groupBy("cl").agg(count(lit(1)).as("n_delta"))
        val j = nb.join(nd, Seq("cl"), "full_outer")
          .select(col("cl"), coalesce(col("n_base"), lit(0L)).as("n_base"),
            coalesce(col("n_delta"), lit(0L)).as("n_delta"))
        val tot = j.agg(sum("n_base").as("tb"), sum("n_delta").as("td"))
        j.crossJoin(broadcast(tot))
          .select(col("cl").cast("long").as("label"),
            col("n_base"), col("n_delta"),
            round(col("n_base") / col("tb"), 4).as("share_base"),
            round(col("n_delta") / col("td"), 4).as("share_delta"))
          .orderBy("label")
      },
      Some(s"""WITH kbase AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
              |kdelta AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
              |${LloydKMeans.assignDuckCte(k = 8, lloydIters = 2, src = "kbase")},
              |${LloydKMeans.assignFrozenDuckCte("kda", "kdelta", "kmc2")},
              |nb AS (SELECT cl, count(*) AS n_base FROM $kmFinal GROUP BY cl),
              |nd AS (SELECT cl, count(*) AS n_delta FROM kda GROUP BY cl),
              |j AS (SELECT coalesce(nb.cl, nd.cl) AS cl,
              |coalesce(n_base, 0) AS n_base, coalesce(n_delta, 0) AS n_delta
              |FROM nb FULL OUTER JOIN nd ON nb.cl = nd.cl),
              |t AS (SELECT sum(n_base) AS tb, sum(n_delta) AS td FROM j)
              |SELECT CAST(cl AS BIGINT) AS label,
              |CAST(n_base AS BIGINT) AS n_base, CAST(n_delta AS BIGINT) AS n_delta,
              |round(CAST(n_base AS DOUBLE) / tb, 4) AS share_base,
              |round(CAST(n_delta AS DOUBLE) / td, 4) AS share_delta
              |FROM j, t ORDER BY label""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q170_semdedup",
      // SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023): cluster
      // the embedding space, then prune near-duplicates WITHIN each
      // cluster — the published recipe for web-scale corpora, where
      // clustering bounds the quadratic verify to cluster-sized blocks
      // (vs q44's sketch-anchor policy, which bounds it to anchors;
      // the two are alternative scale disciplines for the same
      // operator). Deterministic contract: members rank by cosine TO
      // THE CLUSTER CENTROID (desc, vec_id tie-break — the "keep the
      // most central exemplar" policy); a member is a dup iff some
      // better-ranked member of its cluster has cos ≥ 0.3 with it
      // (τ matched to this corpus's q44 operating point; real corpora
      // run τ ≈ 0.95+ on tightly-clustered embeddings), and dup_of
      // names the best-ranked such partner. Clustering is the
      // LloydKMeans unroll, so the WHOLE pipeline — fit, ranking,
      // within-cluster verify — is hash-checked. Scale: the only
      // non-linear step is the within-cluster pair join, the exact
      // cost SemDeDup's k controls; ranking windows are cluster-
      // bounded.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val emb = graft.Tables.embeddings(s, dir)
        val (assigned, centsRow) = LloydKMeans.fit(emb, k = 8, lloydIters = 2)
        val e = emb.join(assigned, "vec_id").crossJoin(broadcast(centsRow))
          .withColumn("cvec", expr("cc[cl]"))
          .withColumn("dotc", expr(
            "aggregate(sequence(0, 63), 0D, (a, i) -> a + CAST(embedding[i] AS DOUBLE) * cvec[i])"))
          .withColumn("nrm", expr(
            "sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
          .withColumn("cn", expr("sqrt(aggregate(cvec, 0D, (a, x) -> a + x * x))"))
          .withColumn("cq", round(col("dotc") / (col("nrm") * col("cn")), 6))
        val ranked = e.withColumn("crank",
          row_number().over(Window.partitionBy("cl").orderBy(col("cq").desc, col("vec_id"))))
          .select("vec_id", "cl", "crank", "embedding", "nrm")
        val b = ranked.select(col("vec_id").as("bvid"), col("cl").as("bcl"),
          col("crank").as("brank"), col("embedding").as("bemb"), col("nrm").as("bnrm"))
        val dup = ranked.join(b, col("cl") === col("bcl") && col("brank") < col("crank"))
          .withColumn("cos", round(expr(
            "aggregate(sequence(0, 63), 0D, (a, i) -> a + CAST(embedding[i] AS DOUBLE) * CAST(bemb[i] AS DOUBLE))")
            / (col("nrm") * col("bnrm")), 6))
          .filter(col("cos") >= 0.3)
          .groupBy("vec_id").agg(min(struct(col("brank"), col("bvid"))).as("mk"))
          .select(col("vec_id"), col("mk.bvid").as("dup_of"))
        ranked.join(dup, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cl").cast("long").as("cluster"),
            col("crank").cast("long").as("crank"),
            coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
            col("dup_of").isNull.as("kept"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $km,
              |sd AS (SELECT a.vec_id, a.cl, a.embedding,
              |${Similarity.duckNorm("a.embedding")} AS nrm, cc[a.cl + 1] AS cvec
              |FROM $kmFinal a, kmc2),
              |sq AS (SELECT vec_id, cl, embedding, nrm,
              |round(list_sum(list_transform(generate_series(1, 64), i ->
              |CAST(embedding[i] AS DOUBLE) * cvec[i]))
              |/ (nrm * sqrt(list_sum(list_transform(cvec, x -> x * x)))), 6) AS cq
              |FROM sd),
              |r AS (SELECT vec_id, cl, embedding, nrm, cq,
              |row_number() OVER (PARTITION BY cl ORDER BY cq DESC, vec_id) AS crank FROM sq),
              |d0 AS (SELECT a.vec_id AS vid, a.cl AS dcl, min(b.crank) AS mrank
              |FROM r a JOIN r b ON a.cl = b.cl AND b.crank < a.crank
              |AND round(${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.3
              |GROUP BY 1, 2),
              |d AS (SELECT d0.vid AS vec_id, r.vec_id AS dup_of
              |FROM d0 JOIN r ON r.cl = d0.dcl AND r.crank = d0.mrank)
              |SELECT r.vec_id, CAST(r.cl AS BIGINT) AS cluster,
              |CAST(r.crank AS BIGINT) AS crank,
              |coalesce(d.dup_of, -1) AS dup_of, d.dup_of IS NULL AS kept
              |FROM r LEFT JOIN d ON r.vec_id = d.vec_id
              |ORDER BY r.vec_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q74_classifier",
      // Since r7 the fit is the DETERMINISTIC GdClassifier unroll
      // (pinned init, 3 full-batch GD steps) so the whole fit+predict
      // chain has a DuckDB oracle — closing the last non-sketch
      // rows-only gap. MlSpec asserts the spark.ml pipeline
      // (TextClassifier, the API-parity artifact) agrees on these
      // queries and that both models hit ≥0.9 train accuracy.
      (s, _) => {
        val model = GdClassifier.fit()
        GdClassifier.predictDf(s, model, Q74Queries).orderBy("term")
      },
      Some(GdClassifier.oracleSql(Q74Queries)))
  )

  private[graft] val Q74Queries = Seq(
    "ransomware outbreak response",
    "phishing credential attack",
    "hospital network design",
    "medical record system upgrade")
}
