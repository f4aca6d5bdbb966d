package graft

import graft.functions.TopKTerms
import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalePatternsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted join result is identical to the plain join") {
    val probe = Seq.tabulate(1000)(i => (if (i % 10 == 0) "cold" + i else "hot", i))
      .toDF("k", "v") // 90% of rows share one key
    val build = Seq(("hot", "H"), ("cold10", "C")).toDF("k", "label")
    val plain = probe.join(build, Seq("k")).select("k", "v", "label")
    val salted = Salting.saltedJoin(probe, build, "k", salts = 8).select("k", "v", "label")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("TopKTerms Aggregator matches groupBy+orderBy+limit") {
    val counted = Tables.documents(spark, sfDir)
      .select(explode(expr("filter(split(lower(text), ' '), x -> x <> '')")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
    val topViaAgg = counted.groupByKey(_ => 0)
      .agg(new TopKTerms(10).toColumn).collect().head._2
    val topViaSql = counted.orderBy($"cnt".desc, $"term").limit(10).collect().toSeq
    assert(topViaAgg == topViaSql)
  }

  test("bucketized range join equals naive range join") {
    // the q28 Spark form vs a direct theta-join on a small slice
    val e = Tables.events(spark, sfDir).limit(200)
      .select($"event_id", $"user_id", expr("unix_micros(ts)").as("us"))
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" && $"b.us" > $"a.us" &&
          $"b.us" - $"a.us" <= 300000000L)
      .select($"a.event_id".as("x"), $"b.event_id".as("y"))
    val bucketized = {
      val eb = e.withColumn("bucket", expr("us div 300000000"))
      val probes = eb.select($"event_id".as("a_id"), $"user_id".as("a_user"),
        $"us".as("a_us"), explode(expr("array(bucket, bucket + 1)")).as("probe"))
      probes.join(eb,
          $"a_user" === $"user_id" && $"probe" === $"bucket" &&
            $"us" > $"a_us" && $"us" - $"a_us" <= 300000000L)
        .select($"a_id".as("x"), $"event_id".as("y"))
    }
    assert(naive.exceptAll(bucketized).count() == 0)
    assert(bucketized.exceptAll(naive).count() == 0)
  }
}
