package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capability is declared as [[QueryDef]]s in the operator modules; this
  * object is just the registry the driver's Verify/Bench mains read.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Relational2.defs ++
      operators.TextAnalytics.defs ++
      operators.Dedup.defs ++
      operators.Components.defs ++
      operators.Indexing.defs ++
      operators.Similarity.defs ++
      operators.EventWindows.defs ++
      operators.Ingest.defs ++
      operators.KeywordTree.defs ++
      operators.Multimodal.defs ++
      operators.Salting.defs ++
      operators.Corpus.defs ++
      operators.Corpus2.defs ++
      operators.Corpus3.defs ++
      operators.Corpus4.defs ++
      operators.Corpus5.defs ++
      operators.Corpus6.defs ++
      operators.Corpus7.defs ++
      operators.Corpus8.defs ++
      operators.Corpus9.defs ++
      operators.Corpus10.defs ++
      operators.Corpus11.defs ++
      operators.Corpus12.defs ++
      operators.Corpus13.defs ++
      operators.Corpus14.defs ++
      sources.Articles.defs ++
      ml.MlQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline benchmark subset (Bench.scala). */
  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
