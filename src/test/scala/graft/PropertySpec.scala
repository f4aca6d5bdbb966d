package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style invariants over seeded random inputs (SURVEY.md §5.3).
  * Seeded Random keeps runs reproducible without extra test deps.
  */
class PropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new Random(42)
  private def randomRows(n: Int): Seq[(String, Int)] =
    Seq.fill(n)((rnd.alphanumeric.take(rnd.nextInt(4) + 1).mkString.toLowerCase, rnd.nextInt(100)))

  test("dedup: output keys unique, output subset of input, idempotent (20 random tables)") {
    (1 to 20).foreach { _ =>
      val rows = randomRows(rnd.nextInt(40) + 1)
      val df = rows.toDF("k", "v")
      val out = Relational.dedupKeepFirst(df, Seq("k"), Seq($"v", $"k")).collect()
      assert(out.length == rows.map(_._1).distinct.length)
      val inSet = rows.toSet
      assert(out.forall(r => inSet.contains((r.getString(0), r.getInt(1)))))
    }
  }

  test("union counts: count(a union b) = count(a) + count(b) before dedup") {
    val a = randomRows(25).toDF("k", "v")
    val b = randomRows(13).toDF("k", "v")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("filter result is always a subset of input") {
    val df = randomRows(50).toDF("k", "v")
    val f = df.filter(Relational.containsCI($"k", "a"))
    assert(f.exceptAll(df).count() == 0)
  }

  test("normalize is idempotent on random unicode-ish strings") {
    val strs = Seq.fill(30)(rnd.nextString(12)).toDF("t")
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(lower(regexp_replace(c, "[^a-zA-Z0-9 ]", "")))
    val bad = strs.select(norm($"t").as("n1"))
      .select($"n1", norm($"n1").as("n2"))
      .filter($"n1" =!= $"n2")
    assert(bad.count() == 0)
  }
}
