package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q93 chunking covers every token and respects size/stride") {
    val chunks = SparkEntry.queries("q93_chunk_documents")(spark, sfDir)
      .select("doc_id", "chunk_idx", "n_tokens").as[(Long, Long, Long)].collect()
    assert(chunks.nonEmpty)
    assert(chunks.forall(_._3 <= 20))
    // total tokens covered = n + overlap·(chunks-1) per doc:
    // with stride 15 every non-final chunk contributes exactly 15 NEW tokens
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", expr("size(filter(split(lower(text), ' '), x -> x <> ''))").cast("long"))
      .as[(Long, Long)].collect().toMap
    chunks.groupBy(_._1).foreach { case (d, cs) =>
      val n = toks(d)
      val expected = (n - 1) / 15 + 1
      assert(cs.length == expected, s"doc $d: ${cs.length} chunks for $n tokens")
      val last = cs.maxBy(_._2)
      assert(last._2 * 15 + last._3 == n, s"doc $d: final chunk must end at the last token")
    }
  }

  test("q95 split assignment is content-stable and roughly 81/13/6") {
    val q = SparkEntry.queries("q95_split_assign")
    val a = q(spark, sfDir).select("doc_id", "split").as[(Long, String)].collect().toMap
    // repartitioning the input cannot change a content-hash assignment
    val b = Tables.documents(spark, sfDir).repartition(7)
      .select(col("doc_id"),
        expr("CAST(locate(substring(md5(CAST(doc_id AS STRING)), 1, 1), '0123456789abcdef') - 1 AS BIGINT)").as("bucket"))
      .withColumn("split",
        when(col("bucket") <= 12, "train").when(col("bucket") <= 14, "val").otherwise("test"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac.getOrElse("test", 0.0) < 0.15, frac.toString)
  }

  test("q92 sketches stay within error bounds of the exact aggregates") {
    val approx = SparkEntry.queries("q92_approx_sketches")(spark, sfDir)
      .as[(String, Double, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._5)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"), expr("percentile(l_quantity, 0.5)").as("m"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (k, (d, m)) =>
      val (ad, pubExact, am) = approx(k)
      // the honesty pair carries the true exact NDV; the HLL estimate is
      // within the m=256 error regime (~6.5% std err → 10% bound here)
      assert(pubExact == d, s"$k: published exact $pubExact vs $d")
      assert(math.abs(ad - d) / d < 0.10, s"$k: HLL estimate $ad vs exact $d")
      // the histogram lower-median can differ from percentile's even-N
      // interpolation by at most half a bucket on this integral domain
      assert(math.abs(am - m) <= 0.5, s"$k: sketch median $am vs exact $m")
    }
  }

  test("q92 sketch results are partitioning-independent (commutative merge)") {
    // register max and histogram count are monoids; the estimate folds
    // SORTED state — so any partitioning must produce identical rows
    val base = operators.Corpus.approxSketches(Tables.lineitem(spark, sfDir))
      .as[(String, Double, Long, Double, Long)].collect().toSeq
    val reparted = operators.Corpus.approxSketches(
        Tables.lineitem(spark, sfDir).repartition(13))
      .as[(String, Double, Long, Double, Long)].collect().toSeq
    assert(base == reparted)
  }

  test("engine-native sketches (HLL++, approx_percentile) track the oracled register form") {
    // the native surface stays exercised even though only the
    // first-principles form can be hash-oracled (engine sketches differ
    // across engines by construction)
    val oracled = SparkEntry.queries("q92_approx_sketches")(spark, sfDir)
      .as[(String, Double, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._3, r._5)).toMap
    val native = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey", 0.02).as("nd"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("nm"))
      .as[(String, Long, Double)].collect()
    native.foreach { case (k, nd, nm) =>
      val (exactD, med) = oracled(k)
      assert(math.abs(nd - exactD).toDouble / exactD < 0.05,
        s"$k: native HLL++ $nd vs exact $exactD")
      assert(math.abs(nm - med) <= 1.0, s"$k: native median $nm vs sketch $med")
    }
  }

  test("stratified sampling (sampleBy) hits per-stratum fractions with a fixed seed") {
    val docs = Tables.documents(spark, sfDir)
    val fractions = Map("en" -> 0.5, "es" -> 0.1, "de" -> 0.9)
    val s1 = docs.stat.sampleBy("lang", fractions, 42L)
    val s2 = docs.stat.sampleBy("lang", fractions, 42L)
    // deterministic under a fixed seed
    assert(s1.select("doc_id").as[Long].collect().toSeq ==
      s2.select("doc_id").as[Long].collect().toSeq)
    val got = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val tot = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    fractions.foreach { case (k, f) =>
      val g = got.getOrElse(k, 0L).toDouble / tot(k)
      assert(math.abs(g - f) < 0.15, s"stratum $k: sampled $g, wanted $f")
    }
  }

  test("q96 packing: bins respect the token budget up to one straddling chunk") {
    val rows = SparkEntry.queries("q96_pack_chunks")(spark, sfDir)
      .select("grp", "bin", "n_tokens").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // chunks are assigned by starting offset, so a bin can overflow only
    // by the tail of its last chunk (chunk size <= 20)
    rows.groupBy(r => (r._1, r._2)).foreach { case (gb, cs) =>
      val tot = cs.map(_._3).sum
      assert(tot < 128 + 20, s"bin $gb holds $tot tokens")
    }
    // bins within a group are contiguous from 0
    rows.groupBy(_._1).foreach { case (g, cs) =>
      val bins = cs.map(_._2).distinct.sorted.toSeq
      assert(bins == Seq.range(0L, bins.length.toLong), s"group $g bins: $bins")
    }
  }

  test("q97 decontamination drops exactly the eval-fingerprint docs") {
    val kept = SparkEntry.queries("q97_decontaminate")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(3L) && !kept.contains(7L))
    val all = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect().toSet
    val dropped = all -- kept
    // every dropped doc must share a fingerprint with the eval docs
    val fps = Tables.documents(spark, sfDir)
      .select($"doc_id", md5(trim(lower(regexp_replace($"text", "[^a-zA-Z0-9 ]", "")))).as("fp"))
      .as[(Long, String)].collect().toMap
    val evalFps = Set(fps(3L), fps(7L))
    assert(dropped.forall(d => evalFps.contains(fps(d))), s"over-dropped: $dropped")
  }

  test("q100 quality gate discriminates and its verdict is the AND of its rules") {
    val rows = SparkEntry.queries("q100_quality_gate")(spark, sfDir)
      .select("len_ok", "stop_ok", "toklen_ok", "rep_ok", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.exists(_._5) && rows.exists(!_._5), "gate must keep some and drop some")
    rows.foreach { case (a, b, c, d, k) => assert(k == (a && b && c && d)) }
  }

  test("q58 bloom prefilter: kept set equals q97's exact survivors, no false negatives") {
    val q58 = SparkEntry.queries("q58_bloom_decontaminate")(spark, sfDir)
      .select("doc_id", "bloom_hit", "kept").as[(Long, Long, Long)].collect()
    val keptBloom = q58.filter(_._3 == 1L).map(_._1).toSet
    val keptExact = SparkEntry.queries("q97_decontaminate")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(keptBloom == keptExact)
    // No false negatives: every dropped (contaminated) doc was a bloom hit.
    q58.filter(_._3 == 0L).foreach { case (id, hit, _) => assert(hit == 1L, s"doc $id") }
    assert(q58.exists(_._3 == 0L), "fixture must drop something")
  }

  test("q63 end-to-end pipeline is consistent with its component stages") {
    val chunks = SparkEntry.queries("q63_training_pipeline")(spark, sfDir)
      .select("doc_id", "chunk_idx").as[(Long, Long)].collect()
    assert(chunks.nonEmpty)
    val docs63 = chunks.map(_._1).toSet
    val keepers = SparkEntry.queries("q100_quality_gate")(spark, sfDir)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(docs63.subsetOf(keepers), "pipeline must only chunk gate-passing docs")
    val decontaminated = SparkEntry.queries("q97_decontaminate")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(docs63.subsetOf(decontaminated), "no contaminated doc may be chunked")
    // Chunk indices are contiguous from 0 per doc.
    chunks.groupBy(_._1).foreach { case (_, cs) =>
      val idxs = cs.map(_._2).sorted
      assert(idxs.head == 0L && idxs.last == idxs.length - 1)
    }
  }

  test("q99 repetition: a looping doc scores near 1, novel text scores 0") {
    val docs = Seq(
      (1L, "spam ham eggs " * 20),          // one trigram repeated
      (2L, (1 to 40).map(i => s"w$i").mkString(" "))) // all-novel trigrams
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), expr("filter(split(lower(text), ' '), x -> x <> '')").as("w"))
      .withColumn("tri", expr(
        "transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))
      .select(col("doc_id"),
        expr("(size(tri) - size(array_distinct(tri))) * 1.0D / size(tri)").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.9)
    assert(got(2L) == 0.0)
  }
}
