package graft.ml

import graft.QueryDef

/** ML surface entries (M1/M2/M5). Not SQL-expressible (iterative model
  * fits), so declared without oracle SQL — the driver records rows-only
  * checks; exact semantics are unit-tested (SURVEY.md §5.1).
  */
object MlQueries {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q72_topic_summary",
      (s, dir) => Topics.topicSummary(s, dir),
      None),

    QueryDef(
      "q52_knn_ivf_kmeans",
      // IVF with a LEARNED coarse quantizer: KMeans cluster ids replace the
      // (random) label column, so the probed partitions actually contain
      // the near neighbors (see SimilaritySpec for the recall comparison).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = graft.Tables.embeddings(s, dir)
        val assigned = Topics.cluster(emb, k = 8)
        val relabeled = emb.drop("label")
          .join(assigned, "vec_id")
          .withColumnRenamed("topic_id", "label")
          .select("vec_id", "label", "embedding")
        graft.operators.Similarity.ivfTopK(relabeled, Seq(0L, 1L, 2L), 10, nprobe = 2)
      },
      None),

    QueryDef(
      "q74_classifier",
      (s, _) => {
        val model = TextClassifier.train(s)
        TextClassifier.predict(s, model, Seq(
          "ransomware outbreak response",
          "phishing credential attack",
          "hospital network design",
          "medical record system upgrade"))
          .orderBy("term")
      },
      None)
  )
}
