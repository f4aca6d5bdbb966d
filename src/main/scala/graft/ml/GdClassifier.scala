package graft.ml

import graft.operators.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q74's DETERMINISTIC logistic-regression fit (r5/r6 verdict task:
  * "oracle q74 via a fixed-iteration GD unroll") — the LloydKMeans
  * discipline applied to M1/M2: pinned zero init, exactly [[Steps]]
  * full-batch gradient-descent steps at a fixed learning rate, shared
  * tokenizer/stop list, so the whole fit+predict chain is expressible
  * as an unrolled DuckDB CTE and q74 becomes hash-checkable.
  *
  * Pipeline (identical formula text on both engines):
  *  - tokens: the shared whitespace tokenizer + 12-word stop list
  *    (TextAnalytics.toksExpr/Stopwords — the corpus-wide definition);
  *  - features: x(doc, term) = tf · idf with idf = ln((N+1)/(df+1)) + 1
  *    over the [[TextClassifier.trainingData]] fixture (N = 32);
  *  - labels: threat → 1, infrastructure → 0;
  *  - fit: w⁰ = 0, b⁰ = 0; for each of [[Steps]] steps,
  *      p_i = σ(b + Σ_j w_j x_ij),  err_i = p_i − y_i,
  *      w_j ← w_j − η · (Σ_i err_i x_ij)/N,  b ← b − η · mean(err);
  *  - predict: phrase → tokens → tf·idf over the TRAIN vocabulary
  *    (OOV terms drop), label = threat iff b + Σ w_j x_j > 0.
  *
  * The decision threshold is on the margin's SIGN, and the output is
  * the discrete label — so engine-level float summation order (Spark
  * vs DuckDB) cannot flip the hash unless a margin sits at 0, which
  * MlSpec pins away from (|margin| bounded below on the q74 queries).
  *
  * Scale: the fit runs on a 32-row constant fixture — a driver-side
  * model build, like every real "train small, score big" pipeline; the
  * DISTRIBUTED part is [[predictDf]], a broadcast join + map over
  * arbitrarily many terms. The spark.ml pipeline (TextClassifier)
  * remains the API-parity artifact; MlSpec asserts both models agree
  * on the q74 queries and both hit ≥0.9 train accuracy.
  */
object GdClassifier {

  val Eta = 0.5
  val Steps = 3

  /** term → (idf, fitted weight), plus the fitted bias. */
  final case class Model(vocab: Map[String, (Double, Double)], bias: Double)

  private[ml] def tokens(text: String): Seq[String] =
    text.toLowerCase.split(' ').toSeq
      .filter(t => t.nonEmpty && !TextAnalytics.Stopwords.contains(t))

  /** Fit with q74's defaults, or a caller-supplied operating point: the
    * quality gate (Corpus14) trains the SAME unrolled GD on a different
    * fixture with `posLabel = "quality"`, `eta = 2`, and
    * `normalize = true` (relative term frequency tf/L, so the learned
    * boundary is document-length-invariant — mandatory when the scored
    * corpus's lengths differ from the fixture's). Defaults keep q74's
    * fit bit-identical. */
  def fit(data: Seq[(String, String)] = TextClassifier.trainingData,
      posLabel: String = "threat", eta: Double = Eta, steps: Int = Steps,
      normalize: Boolean = false): Model = {
    val n = data.size
    val docs = data.map { case (text, label) =>
      val tk = tokens(text)
      val raw = tk.groupBy(identity).map { case (t, g) => t -> g.size.toDouble }
      val tf = if (normalize) raw.map { case (t, c) => t -> c / tk.size } else raw
      (tf, if (label == posLabel) 1.0 else 0.0)
    }
    val dfCount = docs.flatMap(_._1.keys).groupBy(identity).map { case (t, g) => t -> g.size }
    val idf = dfCount.map { case (t, d) => t -> (math.log((n + 1.0) / (d + 1.0)) + 1.0) }
    val feats = docs.map { case (tf, y) => (tf.map { case (t, c) => t -> c * idf(t) }, y) }
    // summation in sorted-term order so the Scala fit itself is
    // run-to-run deterministic (Map iteration order is not)
    var w = Map.empty[String, Double].withDefaultValue(0.0)
    var b = 0.0
    for (_ <- 1 to steps) {
      val errs = feats.map { case (x, y) =>
        val s = x.toSeq.sortBy(_._1).map { case (t, v) => w(t) * v }.sum
        (x, 1.0 / (1.0 + math.exp(-(b + s))) - y)
      }
      val grad = collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      errs.foreach { case (x, e) => x.foreach { case (t, v) => grad(t) += e * v } }
      w = idf.keysIterator.map(t => t -> (w(t) - eta * grad(t) / n)).toMap.withDefaultValue(0.0)
      b -= eta * errs.map(_._2).sum / n
    }
    Model(idf.map { case (t, i) => t -> (i, w(t)) }, b)
  }

  /** Driver-side margin (for specs pinning |margin| away from 0). */
  private[graft] def margin(model: Model, phrase: String): Double =
    model.bias + tokens(phrase).groupBy(identity).toSeq.sortBy(_._1).map {
      case (t, g) => model.vocab.get(t).map { case (idf, w) => w * g.size * idf }.getOrElse(0.0)
    }.sum

  /** M2, distributed: broadcast the (term, idf, weight) table onto a
    * phrase table of any size — tokenize, tf·idf against the train
    * vocabulary, sum the margin, threshold. Zero shuffles beyond the
    * per-phrase aggregate. */
  def predictDf(spark: SparkSession, model: Model, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val vocab = model.vocab.toSeq.map { case (t, (idf, w)) => (t, idf, w) }
      .toDF("tok", "tidf", "tw")
    val t = terms.toDF("term")
    val tok = t.select(col("term"),
        explode(expr("filter(split(lower(term), ' '), x -> x <> '')")).as("tok"))
      .filter(!col("tok").isInCollection(TextAnalytics.Stopwords))
    val s = tok.groupBy("term", "tok").agg(count(lit(1)).cast("double").as("tf"))
      .join(broadcast(vocab), "tok")
      .groupBy("term").agg(sum(col("tf") * col("tidf") * col("tw")).as("s"))
    t.join(s, Seq("term"), "left")
      .select(col("term"),
        when(coalesce(col("s"), lit(0.0)) + model.bias > 0, "threat")
          .otherwise("infrastructure").as("predicted"))
  }

  /** The full fit+predict chain as one DuckDB query: the training
    * fixture and query phrases inline as VALUES, the GD steps unrolled
    * textually — the same shape as LloydKMeans.assignDuckCte. */
  def oracleSql(queries: Seq[String],
      data: Seq[(String, String)] = TextClassifier.trainingData): String = {
    val n = data.size
    val trainVals = data.zipWithIndex.map { case ((text, label), i) =>
      s"($i, ${if (label == "threat") "1.0" else "0.0"}, '$text')"
    }.mkString(", ")
    val queryVals = queries.map(q => s"('$q')").mkString(", ")
    val stopList = TextAnalytics.stopSqlList // the one shared quoted form
    val steps = (1 to Steps).map { k =>
      val (wp, bp) = (s"w${k - 1}", s"b${k - 1}")
      s"""s$k AS (SELECT f.i, sum($wp.w * f.v) AS s FROM feat f JOIN $wp ON f.term = $wp.term GROUP BY f.i),
         |e$k AS (SELECT t.i, 1/(1+exp(-((SELECT b FROM $bp) + coalesce(s$k.s, 0)))) - t.y AS err
         |FROM tr t LEFT JOIN s$k ON t.i = s$k.i),
         |g$k AS (SELECT f.term, sum(e$k.err * f.v) / $n AS g FROM feat f JOIN e$k ON f.i = e$k.i GROUP BY f.term),
         |w$k AS (SELECT $wp.term, $wp.w - $Eta * coalesce(g$k.g, 0) AS w FROM $wp LEFT JOIN g$k ON $wp.term = g$k.term),
         |b$k AS (SELECT (SELECT b FROM $bp) - $Eta * avg(err) AS b FROM e$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr(i, y, text) AS (VALUES $trainVals),
       |tok AS (SELECT i, y, unnest(list_filter(string_split(lower(text), ' '),
       |x -> x <> '' AND x NOT IN ($stopList))) AS term FROM tr),
       |x AS (SELECT i, y, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, count(DISTINCT i) AS dfc FROM x GROUP BY 1),
       |feat AS (SELECT x.i, x.y, x.term, x.tf * (ln(($n + 1.0) / (dfc + 1.0)) + 1.0) AS v
       |FROM x JOIN dfx USING (term)),
       |w0 AS (SELECT term, 0.0 AS w FROM dfx),
       |b0 AS (SELECT 0.0 AS b),
       |$steps,
       |q(term) AS (VALUES $queryVals),
       |qtok AS (SELECT term, unnest(list_filter(string_split(lower(term), ' '),
       |x -> x <> '' AND x NOT IN ($stopList))) AS t FROM q),
       |qx AS (SELECT term, t, CAST(count(*) AS DOUBLE) AS tf FROM qtok GROUP BY 1, 2),
       |qs AS (SELECT qx.term, sum(qx.tf * (ln(($n + 1.0) / (dfx.dfc + 1.0)) + 1.0) * w$Steps.w) AS s
       |FROM qx JOIN dfx ON qx.t = dfx.term JOIN w$Steps ON qx.t = w$Steps.term GROUP BY 1)
       |SELECT q.term,
       |CASE WHEN coalesce(qs.s, 0) + (SELECT b FROM b$Steps) > 0
       |THEN 'threat' ELSE 'infrastructure' END AS predicted
       |FROM q LEFT JOIN qs ON q.term = qs.term ORDER BY q.term""".stripMargin.replace("\n", " ")
  }
}
