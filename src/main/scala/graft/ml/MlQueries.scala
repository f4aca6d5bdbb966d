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
