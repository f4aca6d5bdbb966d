package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing dump contract (r15): `Verify.run` must land
  * `oracle_sql.json` BEFORE any dump (so a timeout-killed sweep still
  * compares its completed prefix — the r14 empty-artifact mechanism),
  * must dump every selected query as readable parquet, and must leave
  * the `timings.json` tail-feedback artifact. Runs the real body on
  * the shared test session against sf0.001 with a two-query subset.
  */
class VerifyContractSpec extends AnyFunSuite with SparkSuite {

  test("verify dump: oracle JSON first, parquet dumps readable, timings artifact present") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_contract").toString
    val subset = Set("q01_pricing_summary", "q13_rollup")
    Verify.run(spark, "/root/testdata/sf0.001", out, subset, par = 2)

    val oraclePath = java.nio.file.Paths.get(s"$out/oracle_sql.json")
    assert(java.nio.file.Files.exists(oraclePath), "oracle_sql.json missing")
    val json = java.nio.file.Files.readString(oraclePath)
    // the FULL oracle map is always written (the driver compares
    // whatever dumps exist against it), single-line, control-char-free
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(!json.exists(_ < ' '), "raw control char would break json.load")
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"oracle key $k missing")
    }

    // every selected query landed as readable parquet with rows
    subset.foreach { name =>
      val df = spark.read.parquet(s"$out/$name")
      assert(df.count() > 0, s"$name dump empty")
    }

    // kill-robustness ordering: the oracle JSON is never NEWER than a
    // dump directory (it must have been written before dumping began)
    val oracleT = java.nio.file.Files.getLastModifiedTime(oraclePath).toMillis
    subset.foreach { name =>
      val dirT = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$out/$name")).toMillis
      assert(oracleT <= dirT, s"oracle_sql.json ($oracleT) newer than $name dump ($dirT)")
    }

    // tail-feedback artifact names both dumped queries
    val tj = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/timings.json"))
    subset.foreach(k => assert(tj.contains("\"" + k + "\""), s"timings missing $k"))
  }

  test("concurrent dump: the temp-view queries race-free under par=4, dumps equal direct runs") {
    // the r15 concurrency-safety argument, pinned: q24/q86 register
    // session-global temp views (orders_v / lineitem_v+part_v) inside
    // their bodies — the claim is that names are per-query unique and a
    // view is resolved at sql() time, so four-way concurrent dumping
    // can never cross-wire them. Dump all four concurrently, then
    // assert each landed dump equals its own direct (serial) run.
    val out = java.nio.file.Files.createTempDirectory("graft_verify_conc").toString
    val subset = Set("q24_grouping_sets", "q86_correlated_subquery",
      "q01_pricing_summary", "q13_rollup")
    Verify.run(spark, "/root/testdata/sf0.001", out, subset, par = 4)
    subset.foreach { name =>
      val dumped = spark.read.parquet(s"$out/$name").collect().map(_.toString).toSeq
      val direct = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq
      assert(dumped == direct, s"$name: concurrent dump differs from direct run")
      assert(direct.nonEmpty, s"$name produced no rows")
    }
  }
}
