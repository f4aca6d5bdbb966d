package graft.sources

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The unified article table (SURVEY.md §1.1; reference builds it from five
  * HTTP sources, scrappy.py:104-115,134-144,188-199,232-243,267-278).
  *
  * The schema is pinned explicitly — the reference's inferred-schema bugs
  * (mixed int/str `year`, `""`-vs-list `keywords`) are normalized at the
  * source boundary: `year` is always string (the reference itself compares
  * via astype(str), article_querry.py:23), list columns are always arrays.
  *
  * Connectors are fixture-backed: network egress is unavailable and the
  * HTTP layer is incidental to query semantics (SURVEY.md §7.4 #6). Each
  * fixture reproduces its source's pathological shape: IEEE has keywords +
  * int-origin years, GoogleScholar lacks `year` entirely, SemanticScholar
  * nests institutions per-author (list-of-lists), PubMed is the two-phase
  * id→detail scan with flat affiliations (wrapped to the nested type),
  * arXiv has string years. Credentials, when a live connector is written,
  * come from config/env — never source (the reference hardcodes keys,
  * scrappy.py:604-606; deliberately not reproduced).
  */
object Articles {

  val schema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("title", StringType),
    StructField("abstract", StringType),
    StructField("url", StringType),
    StructField("authors", ArrayType(StringType)),
    StructField("institutions", ArrayType(ArrayType(StringType))),
    StructField("keywords", ArrayType(StringType)),
    StructField("term", StringType),
    StructField("year", StringType),
    // Explicit per-source ingest position: the keep-first tiebreak
    // (source_rank, ingest_idx) must be stable under any partitioning —
    // monotonically_increasing_id is not (SURVEY.md §7.4 #2).
    StructField("source_rank", IntegerType),
    StructField("ingest_idx", IntegerType)))

  /** A connector: rank = the reference's fetch order (scrappy.py:288-305),
    * which decides keep-first dedup priority. */
  trait ArticleSource {
    def name: String
    def rank: Int
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame
  }

  private def fixture(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  private def row(src: String, rank: Int, idx: Int, title: String, abstr: String,
      url: String, authors: Seq[String], insts: Seq[Seq[String]],
      kws: Seq[String], term: String, year: String): Row =
    Row(src, title, abstr, url, authors, insts, kws, term, year, rank, idx)

  object FixtureIeee extends ArticleSource {
    val name = "IEEE"; val rank = 0
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = fixture(spark, Seq(
      row(name, rank, 0, "Security of Infusion Pumps", "Threat models for pumps",
        "http://i1", Seq("Ana B", "Raj K"), Seq(), Seq("security", "pumps"), "medical devices", "2021"),
      row(name, rank, 1, "Ransomware in Hospitals", "Incident review",
        "http://i2", Seq("Li W"), Seq(), Seq("ransomware"), "ransomware", "2020"),
      row(name, rank, 2, null, "Untitled preprint",
        "", Seq(), Seq(), Seq(), "misc", "")))
  }

  object FixtureGoogleScholar extends ArticleSource {
    val name = "GoogleScholar"; val rank = 1
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = fixture(spark, Seq(
      row(name, rank, 0, "Ransomware in Hospitals", "Dup from GS",
        "http://g1", Seq(), Seq(), Seq(), "ransomware", null),
      row(name, rank, 1, "Phishing Countermeasures", "Survey",
        "http://g2", Seq(), Seq(), Seq(), "phishing", null)))
  }

  object FixtureSemanticScholar extends ArticleSource {
    val name = "SemanticScholar"; val rank = 2
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = fixture(spark, Seq(
      row(name, rank, 0, "Phishing Countermeasures", "Dup from SemSch",
        "http://s1", Seq("Ana B"), Seq(Seq("MIT", "CSAIL"), Seq("Oxford")), Seq(), "phishing", "2019"),
      row(name, rank, 1, "EHR Data Integrity", "Blockchain for EHR",
        "http://s2", Seq("Tom H"), Seq(Seq("Stanford")), Seq(), "ehr", "2022")))
  }

  private val emptyInsts = "CAST(array() AS ARRAY<ARRAY<STRING>>)"
  private val emptyStrs = "CAST(array() AS ARRAY<STRING>)"

  /** PubMed is the reference's TWO-PHASE scan (scrappy.py:209-231): an
    * esearch call returns an XML id list; a second efetch call returns
    * article XML for exactly those ids. Modeled as two DataFrames — the
    * id phase SEMI-JOINS into the detail phase, so details whose id the
    * search did not return are never ingested (PipelineSpec proves the
    * negative case with the decoy detail row p3). Both phases parse their
    * source's real wire shape with Spark's native `from_xml` (the
    * reference uses BeautifulSoup, scrappy.py:217-231). */
  object FixturePubmed extends ArticleSource {
    val name = "PubMed"; val rank = 3

    private val esearchXml =
      "<eSearchResult><IdList><Id>p1</Id><Id>p2</Id></IdList></eSearchResult>"

    private val efetchSchema =
      """MedlineCitation STRUCT<PMID: STRING, Article: STRUCT<
        |ArticleTitle: STRING,
        |Abstract: STRUCT<AbstractText: STRING>,
        |AuthorList: STRUCT<Author: ARRAY<STRUCT<ForeName: STRING, LastName: STRING>>>,
        |AffiliationInfo: STRUCT<Affiliation: STRING>,
        |PubDate: STRUCT<Year: STRING>>>""".stripMargin.replace("\n", " ")

    // p3 is a DECOY: a fetchable detail row whose id esearch did NOT
    // return — the semi-join must drop it.
    private val efetchXml = Seq(
      (0, """<PubmedArticle><MedlineCitation><PMID>p1</PMID><Article><ArticleTitle>Null Abstract Study</ArticleTitle><AffiliationInfo><Affiliation>NIH</Affiliation></AffiliationInfo><PubDate><Year>2021</Year></PubDate></Article></MedlineCitation></PubmedArticle>"""),
      (1, """<PubmedArticle><MedlineCitation><PMID>p2</PMID><Article/></MedlineCitation></PubmedArticle>"""),
      (2, """<PubmedArticle><MedlineCitation><PMID>p3</PMID><Article><ArticleTitle>Decoy Not Fetched</ArticleTitle></Article></MedlineCitation></PubmedArticle>"""))

    /** Phase 1: the esearch id list, one row per returned id. */
    def esearchIds(spark: SparkSession): DataFrame = {
      import spark.implicits._
      Seq(esearchXml).toDF("xml")
        .select(from_xml(col("xml"), lit("IdList STRUCT<Id: ARRAY<STRING>>")).as("r"))
        .select(explode(col("r.IdList.Id")).as("pmid"))
    }

    /** Phase 2: every fetchable article detail, parsed from efetch XML. */
    def efetchDetails(spark: SparkSession): DataFrame = {
      import spark.implicits._
      efetchXml.toDF("ingest_idx", "xml")
        .select(col("ingest_idx"), from_xml(col("xml"), lit(efetchSchema)).as("r"))
        .select(
          col("ingest_idx"),
          col("r.MedlineCitation.PMID").as("pmid"),
          col("r.MedlineCitation.Article.ArticleTitle").as("title"),
          col("r.MedlineCitation.Article.Abstract.AbstractText").as("abstract"),
          expr(s"coalesce(transform(r.MedlineCitation.Article.AuthorList.Author, a -> concat(a.ForeName, ' ', a.LastName)), $emptyStrs)").as("authors"),
          // the fixture models affiliation at article level; wrap to the
          // pinned nested array<array<string>> type
          expr(s"CASE WHEN r.MedlineCitation.Article.AffiliationInfo.Affiliation IS NULL THEN $emptyInsts ELSE array(array(r.MedlineCitation.Article.AffiliationInfo.Affiliation)) END").as("institutions"),
          coalesce(col("r.MedlineCitation.Article.PubDate.Year"), lit("")).as("year"))
    }

    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame =
      efetchDetails(spark)
        .join(esearchIds(spark), Seq("pmid"), "left_semi")
        .select(
          lit(name).as("source"), col("title"), col("abstract"),
          concat(lit("http://"), col("pmid")).as("url"),
          col("authors"), col("institutions"),
          expr(emptyStrs).as("keywords"),
          lit("misc").as("term"), col("year"),
          lit(rank).as("source_rank"), col("ingest_idx"))
  }

  /** arXiv returns Atom XML (scrappy.py:255-278, ElementTree there);
    * parsed here with native `from_xml` — repeated `<author>` elements
    * land in an array column, `<published>` yields the string year. */
  object FixtureArxiv extends ArticleSource {
    val name = "arXiv"; val rank = 4

    private[graft] val atomSchema =
      "id STRING, title STRING, summary STRING, published STRING, author ARRAY<STRUCT<name: STRING>>"

    private val atomXml = Seq(
      (0, "ehr", """<entry><id>http://a1</id><title>EHR Data Integrity</title><summary>Dup from arXiv</summary><published>2022-01-15T00:00:00Z</published><author><name>Zoe Q</name></author></entry>"""),
      (1, "adversarial", """<entry><id>http://a2</id><title>Adversarial ML in Radiology</title><summary>New from arXiv</summary><published>2023-06-01T00:00:00Z</published><author><name>Kim S</name></author></entry>"""))

    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = {
      import spark.implicits._
      atomXml.toDF("ingest_idx", "term", "xml")
        .select(col("ingest_idx"), col("term"), from_xml(col("xml"), lit(atomSchema)).as("e"))
        .select(
          lit(name).as("source"),
          col("e.title").as("title"),
          col("e.summary").as("abstract"),
          col("e.id").as("url"),
          expr("transform(e.author, a -> a.name)").as("authors"),
          expr(emptyInsts).as("institutions"),
          expr(emptyStrs).as("keywords"),
          col("term"),
          substring(col("e.published"), 1, 4).as("year"),
          lit(rank).as("source_rank"), col("ingest_idx"))
    }
  }

  /** All five, in the reference's fetch order. */
  def allSources: Seq[ArticleSource] =
    Seq(FixtureIeee, FixtureGoogleScholar, FixtureSemanticScholar, FixturePubmed, FixtureArxiv)

  /** The pre-existing store the batch merges into (D2 "existing wins",
    * scrappy.py:334-335). One overlapping title, one store-only title. */
  def existingStore(spark: SparkSession): DataFrame = fixture(spark, Seq(
    row("Existing", -1, 0, "Ransomware in Hospitals", "From the store",
      "http://e1", Seq("Old A"), Seq(), Seq(), "ransomware", "2018"),
    row("Existing", -1, 1, "Zero-day Markets", "Store only",
      "http://e2", Seq(), Seq(), Seq(), "markets", "2017")))

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q75_xml_articles",
      // The XML ingestion path end-to-end: arXiv Atom + PubMed efetch wire
      // XML → from_xml → pinned article schema. The oracle pins the
      // expected extraction (title/year/author-count/affiliation flatten)
      // as literal VALUES — including PubMed's null title, ''-year row and
      // the EXCLUDED decoy detail p3.
      (s, _) =>
        FixtureArxiv.fetch(s, Seq())
          .unionByName(FixturePubmed.fetch(s, Seq()))
          .select(col("source"), col("title"), col("year"), col("url"),
            size(col("authors")).cast("long").as("n_authors"),
            array_join(flatten(col("institutions")), "; ").as("insts"))
          .orderBy("source", "url"),
      Some("""SELECT * FROM (VALUES
             |('PubMed', 'Null Abstract Study', '2021', 'http://p1', CAST(0 AS BIGINT), 'NIH'),
             |('PubMed', NULL, '', 'http://p2', CAST(0 AS BIGINT), ''),
             |('arXiv', 'EHR Data Integrity', '2022', 'http://a1', CAST(1 AS BIGINT), ''),
             |('arXiv', 'Adversarial ML in Radiology', '2023', 'http://a2', CAST(1 AS BIGINT), '')
             |) v(source, title, year, url, n_authors, insts)
             |ORDER BY source, url""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q76_pubmed_twophase",
      // The two-phase scan as a declared query: detail rows survive ONLY
      // if their id came back from the search phase (semi-join); the
      // oracle expresses the same with VALUES + IN — decoy p3 absent.
      (s, _) =>
        FixturePubmed.efetchDetails(s)
          .join(FixturePubmed.esearchIds(s), Seq("pmid"), "left_semi")
          .select(col("pmid"), col("title"), col("year"))
          .orderBy("pmid"),
      Some("""WITH ids(pmid) AS (VALUES ('p1'), ('p2')),
             |details(pmid, title, year) AS (VALUES
             |('p1', 'Null Abstract Study', '2021'),
             |('p2', NULL, ''),
             |('p3', 'Decoy Not Fetched', ''))
             |SELECT pmid, title, year FROM details
             |WHERE pmid IN (SELECT pmid FROM ids)
             |ORDER BY pmid""".stripMargin.replace("\n", " ")))
  )
}
