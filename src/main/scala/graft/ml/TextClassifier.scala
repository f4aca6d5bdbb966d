package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** M1/M2: the reference's TF-IDF + LogisticRegression term classifier
  * (scrappy.py:32-44), as a spark.ml Pipeline. Labels match the reference's
  * contract: {"threat", "infrastructure"}. Training data is a 32-row
  * fixture of our own phrases in the same shape as the reference's
  * classifier_data.json (16/16 split; not copied).
  *
  * Scale: model fit is on a tiny labeled set (driver-side cost);
  * model.transform is a per-row map over arbitrarily large term tables.
  */
object TextClassifier {

  val trainingData: Seq[(String, String)] = Seq(
    ("ransomware encryption attack", "threat"),
    ("phishing email credential theft", "threat"),
    ("malware infection outbreak", "threat"),
    ("data breach patient records", "threat"),
    ("denial of service attack", "threat"),
    ("zero day exploit vulnerability", "threat"),
    ("insider threat data exfiltration", "threat"),
    ("social engineering attack vector", "threat"),
    ("botnet command control", "threat"),
    ("credential stuffing login attack", "threat"),
    ("supply chain compromise incident", "threat"),
    ("spyware surveillance infection", "threat"),
    ("trojan backdoor persistence", "threat"),
    ("brute force password attack", "threat"),
    ("keylogger data capture", "threat"),
    ("worm propagation network attack", "threat"),
    ("hospital network segmentation", "infrastructure"),
    ("medical device firmware update", "infrastructure"),
    ("electronic health record system", "infrastructure"),
    ("clinical data warehouse design", "infrastructure"),
    ("network firewall configuration", "infrastructure"),
    ("access control policy management", "infrastructure"),
    ("backup disaster recovery plan", "infrastructure"),
    ("cloud infrastructure deployment", "infrastructure"),
    ("identity management directory service", "infrastructure"),
    ("encryption key management system", "infrastructure"),
    ("security operations center staffing", "infrastructure"),
    ("patch management lifecycle", "infrastructure"),
    ("audit logging compliance monitoring", "infrastructure"),
    ("endpoint protection deployment", "infrastructure"),
    ("wireless network authentication", "infrastructure"),
    ("hospital hand washing", "infrastructure"))

  def train(spark: SparkSession): PipelineModel = {
    import spark.implicits._
    val df = trainingData.toDF("text", "label")
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("tokens").setPattern("\\W+"),
      new StopWordsRemover().setInputCol("tokens").setOutputCol("filtered"),
      new CountVectorizer().setInputCol("filtered").setOutputCol("tf"),
      new IDF().setInputCol("tf").setOutputCol("features"),
      new StringIndexer().setInputCol("label").setOutputCol("labelIdx").setStringOrderType("alphabetAsc"),
      new LogisticRegression().setLabelCol("labelIdx").setMaxIter(50)))
    pipeline.fit(df)
  }

  /** M2: classify terms; returns (term, predicted) with string labels. */
  def predict(spark: SparkSession, model: PipelineModel, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // alphabetAsc indexing: 0.0 -> infrastructure, 1.0 -> threat
    model.transform(terms.toDF("text"))
      .select(col("text").as("term"),
        when(col("prediction") === 0.0, "infrastructure").otherwise("threat").as("predicted"))
  }
}
