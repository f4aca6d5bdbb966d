package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S7/K2: JSON source/sink round-trip with a pinned schema (the reference
  * reads terms/classifier config from JSON, scrappy.py:33-35, 53-55).
  */
class JsonRoundTripSpec extends AnyFunSuite with SparkSuite {

  test("documents survive a JSON write/read round-trip with explicit schema") {
    val docs = Tables.documents(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(out)
    val back = spark.read.schema(docs.schema).json(out)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("terms-list JSON (the reference's search_terms shape) loads as a column") {
    val out = java.nio.file.Files.createTempDirectory("graft_terms").toString + "/terms.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      """{"term": "ransomware"}
        |{"term": "phishing"}
        |{"term": "ehr security"}""".stripMargin)
    val terms = spark.read.json(out).select("term")
    assert(terms.count() == 3)
    assert(terms.filter(col("term") === "phishing").count() == 1)
  }
}
