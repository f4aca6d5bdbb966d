package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over the testdata
  * tables, optionally paired with ANSI SQL the driver runs in DuckDB as the
  * correctness oracle (see Verify.scala). `bench = true` marks it as a
  * headline benchmark query (Bench.scala).
  *
  * Determinism discipline (SURVEY.md §7.4): every oracle-checked query ends
  * in a total ORDER BY with explicit tie-breaks, aliases every computed
  * column identically on both sides, rounds floating-point aggregates, and
  * never outputs a raw timestamp (dates/strings/ints/doubles only) so the
  * parquet→DuckDB hash compare is stable.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
