package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  object FixturePubmed extends ArticleSource {
    val name = "PubMed"; val rank = 3
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = fixture(spark, Seq(
      row(name, rank, 0, "Null Abstract Study", null,
        "http://p1", Seq(), Seq(Seq("NIH")), Seq(), "misc", "2021"),
      row(name, rank, 1, null, null,
        "http://p2", Seq(), Seq(), Seq(), "misc", "")))
  }

  object FixtureArxiv extends ArticleSource {
    val name = "arXiv"; val rank = 4
    def fetch(spark: SparkSession, terms: Seq[String]): DataFrame = fixture(spark, Seq(
      row(name, rank, 0, "EHR Data Integrity", "Dup from arXiv",
        "http://a1", Seq("Zoe Q"), Seq(), Seq(), "ehr", "2022"),
      row(name, rank, 1, "Adversarial ML in Radiology", "New from arXiv",
        "http://a2", Seq("Kim S"), Seq(), Seq(), "adversarial", "2023")))
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
}
