package graft

import graft.operators.Ingest
import graft.sources.Articles
import org.scalatest.funsuite.AnyFunSuite

class PersistMergeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("persistMerge: first write dedups, re-run is idempotent, existing wins on update") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString + "/articles"
    val batch = Ingest.unionSources(spark, Articles.allSources, Seq("t"))

    Ingest.persistMerge(spark, dir, batch)
    val v1 = spark.read.parquet(dir).select("title", "source")
      .as[(String, String)].collect().toSet
    assert(v1.size == 7) // distinct batch titles incl. the null group

    // idempotent: same batch again changes nothing
    Ingest.persistMerge(spark, dir, batch)
    val v2 = spark.read.parquet(dir).select("title", "source")
      .as[(String, String)].collect().toSet
    assert(v2 == v1)

    // existing wins: an "updated" duplicate title must NOT replace the
    // stored row; a new title must append
    val update = Seq(
      ("NewSrc", "Ransomware in Hospitals", "updated dup", "u", Seq[String](),
        Seq[Seq[String]](), Seq[String](), "t", "2030", 9, 0),
      ("NewSrc", "Brand New Paper", "fresh", "u2", Seq[String](),
        Seq[Seq[String]](), Seq[String](), "t", "2030", 9, 1))
      .toDF("source", "title", "abstract", "url", "authors", "institutions",
        "keywords", "term", "year", "source_rank", "ingest_idx")
    Ingest.persistMerge(spark, dir, update)
    val v3 = spark.read.parquet(dir).select("title", "source")
      .as[(String, String)].collect().toMap
    assert(v3("Ransomware in Hospitals") == "IEEE")   // unchanged
    assert(v3("Brand New Paper") == "NewSrc")          // appended
    assert(v3.size == v1.size + 1)
  }

  test("persistMerge recovers a store stranded as .old by a mid-swap crash") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = java.nio.file.Files.createTempDirectory("graft_crash").toString + "/articles"
    val batch = Ingest.unionSources(spark, Articles.allSources, Seq("t"))
    Ingest.persistMerge(spark, dir, batch)
    val before = spark.read.parquet(dir).count()
    // simulate a crash between the two moves: store gone, backup stranded
    Files.move(Paths.get(dir), Paths.get(dir + ".old"), StandardCopyOption.ATOMIC_MOVE)
    Ingest.persistMerge(spark, dir, batch)
    assert(spark.read.parquet(dir).count() == before) // nothing lost
    assert(!Files.exists(Paths.get(dir + ".old")))
  }
}
