package graft.operators

import graft.QueryDef
import graft.sources.Articles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ingest pipeline (SURVEY.md §3.1, scrappy.py:283-350),
  * Spark-shaped: union-by-name of the five sources → keep-first dedup on
  * title (D1) → institutions flatten (P2) → merge into the existing store
  * with existing-wins semantics (D2) → delta report (J1 anti-join).
  *
  * Scale shape: one shuffle (the title window); the delta anti-join
  * broadcasts existing titles when small. Keep-first priority is the
  * explicit (source_rank, ingest_idx) pair — stable under any partitioning,
  * unlike monotonically_increasing_id (SURVEY.md §7.4 #2).
  */
object Ingest {

  /** U1: union-by-name of per-source article batches (dict-key alignment
    * semantics of the reference's list concat, scrappy.py:286-311). */
  def unionSources(spark: SparkSession, sources: Seq[Articles.ArticleSource],
      terms: Seq[String]): DataFrame =
    sources.map(_.fetch(spark, terms))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** D1: intra-batch dedup by title; earlier source, earlier row wins
    * (pandas keep="first" over fetch order, scrappy.py:316). */
  def dedupByTitle(batch: DataFrame): DataFrame =
    Relational.dedupKeepFirst(batch, Seq("title"),
      Seq(col("source_rank"), col("ingest_idx")))

  /** P2: flatten nested per-author institutions to the "; "-joined string
    * form (scrappy.py:318-320 — minus its char-splitting bug on flat
    * lists, which we avoid by typing institutions as array<array<string>>). */
  def flattenInstitutions(df: DataFrame): DataFrame =
    df.withColumn("insts", array_join(flatten(col("institutions")), "; "))

  /** D2: merge batch into existing store — existing row beats incoming
    * duplicate, never updates (upsert-ignore, scrappy.py:334-335). */
  def mergeExistingWins(existing: DataFrame, batch: DataFrame): DataFrame = {
    val e = existing.withColumn("pri", lit(0))
    val b = batch.withColumn("pri", lit(1))
    Relational.dedupKeepFirst(e.unionByName(b), Seq("title"),
      Seq(col("pri"), col("source_rank"), col("ingest_idx"))).drop("pri")
  }

  /** J1: delta report — titles in the merged table absent from the prior
    * store (scrappy.py:339-341). */
  def deltaNew(merged: DataFrame, existing: DataFrame): DataFrame =
    merged.join(existing.select("title"), Seq("title"), "left_anti")

  /** M3: term contextualization (scrappy.py:390-426) — cross join the
    * class-matched theme list, then append " AND healthcare" when the term
    * has no health keyword. Pure DataFrame; the classifier that produces
    * `label` is graft.ml.TextClassifier. */
  def contextualize(termsLabeled: DataFrame, themes: DataFrame): DataFrame = {
    val healthRe = "(health|hospital|medical|clinic)"
    termsLabeled.join(themes, "label")
      .withColumn("contextualized",
        when(lower(col("term")).rlike(healthRe),
          concat(col("term"), lit(" AND "), col("theme")))
          .otherwise(concat(col("term"), lit(" AND "), col("theme"), lit(" AND healthcare"))))
  }

  /** The reference's persistent store (raw_articles.csv append-merge,
    * scrappy.py:333-350) as a parquet store with upsert-ignore semantics:
    * read existing → existing-wins merge → write to a staging dir → atomic
    * swap. Re-running with the same batch is a no-op (idempotent); on a
    * real deployment the same flow targets a table format with commit
    * semantics (the stage-and-swap is the filesystem stand-in).
    *
    * SINGLE-WRITER contract: concurrent callers (same or different JVMs)
    * can interleave the store→old / stage→store moves and fail or lose a
    * batch — there is deliberately no lock file here because the real
    * deployment target (a commit-protocol table format) owns that
    * concern. Callers must serialize invocations per storeDir.
    */
  def persistMerge(spark: SparkSession, storeDir: String, batch: DataFrame): Unit =
    stageSwapStore(spark, storeDir) {
      case Some(existing) => mergeExistingWins(existing, batch)
      case None => Relational.dedupKeepFirst(batch, Seq("title"),
        Seq(col("source_rank"), col("ingest_idx")))
    }

  /** The crash-safe stage-and-swap protocol around a parquet store,
    * factored out of [[persistMerge]] (r12: `Flows.drainBridge` needs the
    * same swap for a doc_id-keyed store): recover a torn previous swap,
    * hand the current store (if any) to `mergeWith`, stage the result,
    * swap atomically with an `.old` backup, drop the backup. The caller's
    * merge MUST be idempotent — that is what makes re-applying a batch
    * after the recovery path safe (PersistMergeSpec proves the protocol
    * for both a clean store and every torn-swap state). */
  private[graft] def stageSwapStore(spark: SparkSession, storeDir: String)(
      mergeWith: Option[DataFrame] => DataFrame): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val store = Paths.get(storeDir)
    val old = Paths.get(storeDir + ".old")
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => Files.delete(q))
    // Crash recovery BEFORE touching anything: a missing store with a
    // surviving .old means the previous swap died between its two moves —
    // restore the backup (the merge below is idempotent, so re-applying
    // the batch is safe). A store AND a stale .old means the swap
    // completed but cleanup didn't — drop the stale backup.
    if (!Files.exists(store) && Files.exists(old))
      Files.move(old, store, StandardCopyOption.ATOMIC_MOVE)
    else rmTree(old)
    val merged = mergeWith(
      if (Files.exists(store)) Some(spark.read.parquet(storeDir)) else None)
    val stage = Paths.get(storeDir + ".staging")
    merged.write.mode("overwrite").parquet(stage.toString)
    if (Files.exists(store)) Files.move(store, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(stage, store, StandardCopyOption.ATOMIC_MOVE)
    rmTree(old)
  }

  /** Suggest-terms pipeline (scrappy.py:354-429, minus the interactive
    * gate): n-gram candidate mining (A1) → novelty anti-join against the
    * saved terms (J2) → top-N (A4) → up to 2 example contexts per term
    * with truncated previews (A6 + C3). One broadcast of the tiny top-N
    * list against the corpus for examples — no per-term driver loop. */
  def suggestTerms(docs: DataFrame, existingTerms: Seq[String], topN: Int,
      examples: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalytics.toksExpr
    val grams = docs.select(expr(toks).as("w"))
      .select(explode(expr(
        s"""concat(w, CASE WHEN size(w) >= 2
           |THEN zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1), (x, y) -> concat(x, ' ', y))
           |ELSE slice(w, 1, 0) END)""".stripMargin.replace("\n", " "))).as("term"))
      .filter(!col("term").isInCollection(TextAnalytics.Stopwords))
      .filter(!lower(col("term")).isInCollection(existingTerms.map(_.toLowerCase)))
    val top = grams.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
    val w = Window.partitionBy("term").orderBy("doc_id")
    docs.join(broadcast(top), expr("contains(lower(text), term)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= examples)
      .select(col("term"), col("cnt"), col("doc_id"),
        when(length(col("text")) > 60,
          concat(substring(col("text"), 1, 60), lit("...")))
          .otherwise(col("text")).as("preview"))
      .orderBy(col("cnt").desc, col("term"), col("doc_id"))
  }

  /** Full pipeline used by q70. */
  def pipeline(spark: SparkSession): DataFrame = {
    val batch = dedupByTitle(unionSources(spark, Articles.allSources, Seq("t")))
    val merged = mergeExistingWins(Articles.existingStore(spark), batch)
    flattenInstitutions(merged)
      .select(col("title"), col("source"), col("year"),
        col("insts"), size(col("authors")).cast("long").as("n_authors"))
      .orderBy(col("title").asc_nulls_first)
  }

  // The same 12 batch rows + 2 store rows as literal VALUES, so the whole
  // pipeline is oracle-checkable in DuckDB without external fixtures.
  private val batchValues =
    """(VALUES
      |('IEEE', 'Security of Infusion Pumps', ['Ana B','Raj K'], []::VARCHAR[][], '2021', 0, 0),
      |('IEEE', 'Ransomware in Hospitals', ['Li W'], []::VARCHAR[][], '2020', 0, 1),
      |('IEEE', NULL, []::VARCHAR[], []::VARCHAR[][], '', 0, 2),
      |('GoogleScholar', 'Ransomware in Hospitals', []::VARCHAR[], []::VARCHAR[][], NULL, 1, 0),
      |('GoogleScholar', 'Phishing Countermeasures', []::VARCHAR[], []::VARCHAR[][], NULL, 1, 1),
      |('SemanticScholar', 'Phishing Countermeasures', ['Ana B'], [['MIT','CSAIL'],['Oxford']], '2019', 2, 0),
      |('SemanticScholar', 'EHR Data Integrity', ['Tom H'], [['Stanford']], '2022', 2, 1),
      |('PubMed', 'Null Abstract Study', []::VARCHAR[], [['NIH']], '2021', 3, 0),
      |('PubMed', NULL, []::VARCHAR[], []::VARCHAR[][], '', 3, 1),
      |('arXiv', 'EHR Data Integrity', ['Zoe Q'], []::VARCHAR[][], '2022', 4, 0),
      |('arXiv', 'Adversarial ML in Radiology', ['Kim S'], []::VARCHAR[][], '2023', 4, 1)
      |) b(source, title, authors, institutions, year, source_rank, ingest_idx)""".stripMargin

  private val existingValues =
    """(VALUES
      |('Existing', 'Ransomware in Hospitals', ['Old A'], []::VARCHAR[][], '2018', -1, 0),
      |('Existing', 'Zero-day Markets', []::VARCHAR[], []::VARCHAR[][], '2017', -1, 1)
      |) e(source, title, authors, institutions, year, source_rank, ingest_idx)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q70_article_pipeline",
      (s, _) => pipeline(s),
      Some(s"""WITH batch AS (SELECT * FROM $batchValues),
              |d1 AS (SELECT * FROM (SELECT b.*,
              |row_number() OVER (PARTITION BY title ORDER BY source_rank, ingest_idx) AS rn
              |FROM batch b) x WHERE rn = 1),
              |store AS (SELECT * FROM $existingValues),
              |u AS (SELECT 0 AS pri, source, title, authors, institutions, year, source_rank, ingest_idx FROM store
              |UNION ALL SELECT 1 AS pri, source, title, authors, institutions, year, source_rank, ingest_idx FROM d1),
              |merged AS (SELECT * FROM (SELECT u.*,
              |row_number() OVER (PARTITION BY title ORDER BY pri, source_rank, ingest_idx) AS rn2
              |FROM u) y WHERE rn2 = 1)
              |SELECT title, source, year,
              |coalesce(array_to_string(flatten(institutions), '; '), '') AS insts,
              |len(authors) AS n_authors
              |FROM merged ORDER BY title NULLS FIRST""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q47_suggest_terms",
      (s, dir) => suggestTerms(graft.Tables.documents(s, dir),
        existingTerms = Seq("data", "join", "query"), topN = 20, examples = 2),
      Some(s"""WITH toks AS (SELECT doc_id, text,
              |${graft.operators.TextAnalytics.toksDuck} AS w FROM documents),
              |grams AS (
              |SELECT w[i] AS term FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
              |UNION ALL
              |SELECT w[i] || ' ' || w[i+1] AS term FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) g),
              |cand AS (SELECT term, count(*) AS cnt FROM grams
              |WHERE term NOT IN (${TextAnalytics.Stopwords.map(w => s"'$w'").mkString(", ")})
              |AND lower(term) NOT IN ('data', 'join', 'query')
              |GROUP BY term),
              |top AS (SELECT term, cnt FROM cand ORDER BY cnt DESC, term LIMIT 20),
              |ex AS (SELECT t.term, t.cnt, d.doc_id,
              |CASE WHEN length(d.text) > 60 THEN substring(d.text, 1, 60) || '...' ELSE d.text END AS preview,
              |row_number() OVER (PARTITION BY t.term ORDER BY d.doc_id) AS rn
              |FROM top t JOIN toks d ON contains(lower(d.text), t.term))
              |SELECT term, cnt, doc_id, preview FROM ex WHERE rn <= 2
              |ORDER BY cnt DESC, term, doc_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q78_keyword_filter",
      // F4 on the REAL keywords array (article_querry.py:25-26): the
      // reference filters the stringified keywords list case-insensitively
      // with na=False; here that is containsCI over array_join(keywords)
      // across the full five-source union — null/empty keyword lists never
      // match, matching pandas' na=False.
      (s, _) =>
        unionSources(s, Articles.allSources, Seq("t"))
          .filter(Relational.containsCI(array_join(col("keywords"), ","), "ransom"))
          .select(col("source"), col("title"), col("year"))
          .orderBy("source", "title"),
      Some("""WITH b(source, title, year, kws) AS (VALUES
             |('IEEE', 'Security of Infusion Pumps', '2021', ['security', 'pumps']),
             |('IEEE', 'Ransomware in Hospitals', '2020', ['ransomware']),
             |('IEEE', NULL, '', []::VARCHAR[]),
             |('GoogleScholar', 'Ransomware in Hospitals', NULL, []::VARCHAR[]),
             |('GoogleScholar', 'Phishing Countermeasures', NULL, []::VARCHAR[]),
             |('SemanticScholar', 'Phishing Countermeasures', '2019', []::VARCHAR[]),
             |('SemanticScholar', 'EHR Data Integrity', '2022', []::VARCHAR[]),
             |('PubMed', 'Null Abstract Study', '2021', []::VARCHAR[]),
             |('PubMed', NULL, '', []::VARCHAR[]),
             |('arXiv', 'EHR Data Integrity', '2022', []::VARCHAR[]),
             |('arXiv', 'Adversarial ML in Radiology', '2023', []::VARCHAR[])
             |)
             |SELECT source, title, year FROM b
             |WHERE contains(lower(array_to_string(kws, ',')), 'ransom')
             |ORDER BY source, title""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q71_contextualize",
      (s, _) => {
        import s.implicits._
        val terms = Seq(
          ("ransomware attacks", "threat"),
          ("phishing", "threat"),
          ("hospital networks", "infrastructure"),
          ("medical device security", "infrastructure")).toDF("term", "label")
        val themes = Seq(
          ("threat", "data breach"), ("threat", "malware defense"),
          ("infrastructure", "network security"), ("infrastructure", "medical devices"))
          .toDF("label", "theme")
        contextualize(terms, themes)
          .select("term", "label", "theme", "contextualized")
          .orderBy("term", "theme")
      },
      Some("""WITH terms(term, label) AS (VALUES
             |('ransomware attacks', 'threat'), ('phishing', 'threat'),
             |('hospital networks', 'infrastructure'), ('medical device security', 'infrastructure')),
             |themes(label, theme) AS (VALUES
             |('threat', 'data breach'), ('threat', 'malware defense'),
             |('infrastructure', 'network security'), ('infrastructure', 'medical devices'))
             |SELECT term, t.label AS label, theme,
             |CASE WHEN regexp_matches(lower(term), '(health|hospital|medical|clinic)')
             |THEN term || ' AND ' || theme
             |ELSE term || ' AND ' || theme || ' AND healthcare' END AS contextualized
             |FROM terms t JOIN themes h ON t.label = h.label
             |ORDER BY term, theme""".stripMargin.replace("\n", " ")))
  )
}
