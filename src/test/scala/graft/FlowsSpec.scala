package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end flow parity: the five reference CLI entry points composed
  * from the declared operators, against a fresh persistent store. */
class FlowsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("fetch → persist → re-fetch is idempotent and delta shrinks to zero") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_spec")
    val store = out.resolve("store").toString
    val d1 = Flows.fetchArticles(spark, store, Seq("t"))
    assert(d1.count() > 0) // first run: everything is new
    val n1 = spark.read.parquet(store).count()
    val d2 = Flows.fetchArticles(spark, store, Seq("t"))
    // Reference-faithful quirk: pandas isin never matches NaN, so the
    // null-title row re-reports as "new" every run (scrappy.py:339-341);
    // the equi-anti-join reproduces that. Every TITLED row must not.
    assert(d2.filter(org.apache.spark.sql.functions.col("title").isNotNull).count() == 0,
      "re-ingesting the same batch must add no titled rows")
    // the store itself IS idempotent — nothing was appended
    assert(spark.read.parquet(store).count() == n1)
  }

  test("drainBridge compacts the batchId landing into the keyed store, replay-safe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drain")
    val bridge = tmp.resolve("bridge").toString
    val store = tmp.resolve("store").toString
    val truth = operators.Corpus12.hostedDocs(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"host", $"n_chars")
    val Seq(b0, b1, b2) = (0 to 2).map(i => truth.filter($"doc_id" % 3 === i))
    streaming.StreamingTwin.landBatch(b0, 0L, bridge)
    streaming.StreamingTwin.landBatch(b1, 1L, bridge)
    streaming.StreamingTwin.landBatch(b2, 2L, bridge)
    def storeRows(): Seq[(Long, String, Long)] =
      spark.read.parquet(store).as[(Long, String, Long)].collect().toSeq.sorted
    def bridgeParts(): Seq[String] =
      new java.io.File(bridge).list().toSeq.filter(_.startsWith("batch_id=")).sorted
    // drain up to the committed watermark (batch 1): batches 0+1 land in
    // the store, their dirs are pruned, batch 2 stays for its commit
    val expect01 = b0.unionByName(b1).as[(Long, String, Long)].collect().toSeq.sorted
    assert(Flows.drainBridge(spark, bridge, store, upTo = 1L) == 2)
    assert(storeRows() == expect01)
    assert(bridgeParts() == Seq("batch_id=2"))
    // double-drain at the same watermark is a no-op
    assert(Flows.drainBridge(spark, bridge, store, 1L) == 0)
    assert(storeRows() == expect01)
    // at-least-once replay AFTER the drain (batch 1 re-delivered, new
    // partitioning): the re-drain upserts the same rows — no doubling
    streaming.StreamingTwin.landBatch(b1.repartition(3), 1L, bridge)
    assert(Flows.drainBridge(spark, bridge, store, 1L) == 1)
    assert(storeRows() == expect01)
    // an EMPTY micro-batch (AvailableNow delivers them routinely) lands
    // a dir with no part files — it must drain (and prune) as a no-op
    streaming.StreamingTwin.landBatch(truth.filter($"doc_id" < 0), 3L, bridge)
    // advance the watermark: the store converges to the full truth, the
    // bridge is empty, and the landing is compacted to O(1) files
    assert(Flows.drainBridge(spark, bridge, store, 3L) == 2)
    assert(storeRows() == truth.as[(Long, String, Long)].collect().toSeq.sorted)
    assert(bridgeParts().isEmpty)
    val storeFiles = new java.io.File(store).list().count(_.endsWith(".parquet"))
    assert(storeFiles <= spark.sparkContext.defaultParallelism,
      s"store not compacted: $storeFiles files")
  }

  test("drainBridge enforces the consumer floor and skips foreign bridge entries") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drainguard")
    val bridge = tmp.resolve("bridge").toString
    val store = tmp.resolve("store").toString
    val truth = operators.Corpus12.hostedDocs(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"host", $"n_chars")
    val Seq(b0, b1, b2) = (0 to 2).map(i => truth.filter($"doc_id" % 3 === i))
    streaming.StreamingTwin.landBatch(b0, 0L, bridge)
    streaming.StreamingTwin.landBatch(b1, 1L, bridge)
    streaming.StreamingTwin.landBatch(b2, 2L, bridge)
    // a stray non-numeric entry (a foreign tool's temp dir) must be
    // SKIPPED, not a NumberFormatException permanently failing every
    // subsequent drain
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(bridge, "batch_id=__tmp_staging"))
    def bridgeParts(): Seq[String] =
      new java.io.File(bridge).list().toSeq.filter(_.startsWith("batch_id=")).sorted
    // producer watermark says 2, but a lagging consumer has only
    // consumed batch 0 — the floor caps the prune, so batches 1-2
    // survive for that consumer
    assert(Flows.drainBridge(spark, bridge, store, upTo = 2L,
      consumedFloor = Some(0L)) == 1)
    assert(bridgeParts() ==
      Seq("batch_id=1", "batch_id=2", "batch_id=__tmp_staging"))
    assert(spark.read.parquet(store).as[(Long, String, Long)].collect().toSeq.sorted ==
      b0.as[(Long, String, Long)].collect().toSeq.sorted)
    // the consumer catches up: the floor releases the rest; the foreign
    // entry is still ignored and still present
    assert(Flows.drainBridge(spark, bridge, store, upTo = 2L,
      consumedFloor = Some(5L)) == 2)
    assert(bridgeParts() == Seq("batch_id=__tmp_staging"))
    assert(spark.read.parquet(store).as[(Long, String, Long)].collect().toSeq.sorted ==
      truth.as[(Long, String, Long)].collect().toSeq.sorted)
  }

  test("query-articles composes the four optional filters like the reference") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_spec_q")
    val store = out.resolve("store").toString
    Flows.fetchArticles(spark, store, Seq("t"))
    val df = spark.read.parquet(store)
    val byTerm = Flows.queryArticles(df, term = Some("ransomware"))
      .select("title").as[String].collect()
    assert(byTerm.nonEmpty && byTerm.forall(_.toLowerCase.contains("ransomware")))
    val byYear = Flows.queryArticles(df, year = Some("2023"))
      .select("year").as[String].collect()
    assert(byYear.nonEmpty && byYear.forall(_ == "2023"))
    val byKeyword = Flows.queryArticles(df, keyword = Some("pumps"))
      .select("title").as[String].collect()
    assert(byKeyword.toSeq == Seq("Security of Infusion Pumps"))
    val byInst = Flows.queryArticles(df, institution = Some("nih"))
      .select("title").as[String].collect()
    assert(byInst.toSeq == Seq("Null Abstract Study"))
    // conjunctive: term + year that never co-occur → empty, no crash (F6)
    assert(Flows.queryArticles(df, term = Some("ransomware"), year = Some("2023")).isEmpty)
  }

  test("corpus flow matches q63 and writes an ordered, lossless chunk layout") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_corpus")
      .resolve("chunks").toString
    val docs = Tables.documents(spark, sfDir)
    val chunks = Flows.corpusFlow(docs, Seq(3L, 7L), out)
    val viaQuery = SparkEntry.queries("q63_training_pipeline")(spark, sfDir)
    assert(chunks.count() > 0)
    assert(viaQuery.exceptAll(chunks).count() == 0)
    assert(chunks.exceptAll(viaQuery).count() == 0)
    // the written layout round-trips losslessly
    val back = spark.read.parquet(out)
    assert(back.count() == chunks.count())
  }

  test("hygiene flow lands the scrubbed survivors + the funnel audit, tied to q268") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_hyg")
      .resolve("clean").toString
    val landed = Flows.hygieneFlow(spark, sfDir, out)
    val funnel = SparkEntry.queries("q268_hygiene_funnel")(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    val byName = funnel.map(r => r._2 -> r).toMap
    // the landing is exactly the chunk-scrub survivors, PII-scrubbed
    assert(landed.count() == byName("chunk_scrub")._4)
    assert(landed.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"text"))).as[Long].head() ==
      byName("pii_scrub")._6)
    // residual-free: re-running the PII patterns on the landed text finds 0
    val email = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""".r
    val phone = """\b\d{3}-\d{3}-\d{4}\b""".r
    val ip = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""".r
    val landedClean = landed.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    landedClean.foreach { case (id, t) =>
      assert(email.findAllIn(t).isEmpty && phone.findAllIn(t).isEmpty &&
        ip.findAllIn(t).isEmpty, s"doc $id has residual PII")
    }
    // the written audit matches the oracled q268 rows exactly
    val audit = spark.read.parquet(s"$out/_funnel")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(audit == funnel)
    // doc_id-ordered landing: file ranges are disjoint and sorted
    val ids = landed.select("doc_id").as[Long].collect()
    assert(ids.sorted.sameElements(
      spark.read.parquet(out).orderBy("doc_id").select("doc_id").as[Long].collect()))
  }

  test("packing flow refuses a collision corpus before anything lands (interning guard in-pipeline)") {
    // stage a corpus where a 4-bit fingerprint MUST collide (40 distinct
    // tokens, 16 buckets — the Corpus11Spec pigeonhole fixture) as a
    // documents.parquet dir, then run the REAL flow entry point against
    // it: the q260/q261 guard has to throw before the ladder runs, and
    // the landing directory must stay empty — no interned verdict may
    // land on a corpus where interning is unsound.
    val stage = java.nio.file.Files.createTempDirectory("graft_flows_guard")
    Seq((1L, (0 until 40).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.parquet(stage.resolve("documents.parquet").toString)
    val out = stage.resolve("packed").toString
    val ex = intercept[IllegalArgumentException] {
      Flows.packingFlow(spark, stage.toString, out, internHexWidth = 1)
    }
    assert(ex.getMessage.contains("UNSAFE"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
  }

  test("hygiene flow refuses a chunk-fingerprint collision before the product lands") {
    // force a collision by pigeonhole (the packingFlow guard's fixture
    // idiom): a 1-hex fingerprint has 16 buckets, and the clf-gate
    // survivor corpus carries far more distinct chunks than that — the
    // guard must throw and the training-ready product must NOT land.
    val out = java.nio.file.Files.createTempDirectory("graft_flows_hyg_guard")
      .resolve("corpus").toString
    val ex = intercept[IllegalArgumentException] {
      Flows.hygieneFlow(spark, sfDir, out, chunkFpHexWidth = 1)
    }
    assert(ex.getMessage.contains("UNSAFE"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
  }

  test("semantic-dedup flow refuses a zero-magnitude embedding before any verdict lands") {
    // cosine-to-centroid is undefined for a zero vector — the flow must
    // fail loudly (the semanticDecontam contract), not let the row rank
    // on a null and silently become or displace an exemplar. A NULL
    // embedding is the sneakier twin (aggregate() over NULL is NULL, so
    // a bare === 0 filter would drop it FROM THE GUARD), and a NULL
    // ELEMENT inside a present array is the sneakiest (the fold's sum
    // goes NULL the same way, r11 ADVICE) — all three count.
    val stage = java.nio.file.Files.createTempDirectory("graft_flows_sem_guard")
    Seq((0L, 0, Some(Seq.fill(64)(Option(0.1f)))),
      (1L, 0, Some(Seq.fill(64)(Option(0.0f)))),
      (2L, 1, Option.empty[Seq[Option[Float]]]),
      (3L, 1, Some(Seq.fill(64)(Option(0.2f)))),
      (4L, 1, Some(Option(0.3f) +: Option.empty[Float] +: Seq.fill(62)(Option(0.3f)))))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(stage.resolve("embeddings.parquet").toString)
    Seq((0L, "a doc", 5L), (1L, "b doc", 5L), (2L, "c doc", 5L),
      (3L, "d doc", 5L), (4L, "e doc", 5L))
      .toDF("doc_id", "text", "n_chars")
      .write.parquet(stage.resolve("documents.parquet").toString)
    val out = stage.resolve("semdedup").toString
    val ex = intercept[IllegalArgumentException] {
      Flows.semanticDedupFlow(spark, stage.toString, out)
    }
    assert(ex.getMessage.contains("zero-magnitude"))
    // all three degenerate shapes counted: all-zero (1), NULL array (2),
    // null-element array (4)
    assert(ex.getMessage.contains("3 zero-magnitude"), ex.getMessage)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
  }

  test("packing flow: decontaminated, q139-packed, ordered files, manifest certifies the landed bytes") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_pack")
      .resolve("packed").toString
    val landed = Flows.packingFlow(spark, sfDir, out)
    // only ladder-kept docs land
    val verdict = SparkEntry.queries("q143_contamination_ladder")(spark, sfDir)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    val landedIds = landed.select("doc_id").as[Long].collect()
    assert(landedIds.nonEmpty && landedIds.forall(verdict(_)))
    assert(landedIds.length == verdict.count(_._2))
    // the packing is q139's rule over exactly the kept subset: offsets
    // tile each sequence with no gaps (zero padding below the tail)
    val rows = landed.select("seq_first", "seq_offset", "n_toks")
      .as[(Long, Long, Long)].collect().sortBy { case (s, o, _) => (s, o) }
    val total = rows.map(_._3).sum
    rows.foldLeft(0L) { case (pos, (s, o, n)) =>
      assert(s == pos / 512 && o == pos % 512, s"doc at $pos misplaced")
      pos + n
    }
    // files hold disjoint (seq_first, seq_offset) ranges — a reader
    // streams the layout in order
    val files = landed.select(org.apache.spark.sql.functions
        .input_file_name().as("f"), $"seq_first", $"seq_offset")
      .as[(String, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(v => (v.map(r => (r._2, r._3)).min, v.map(r => (r._2, r._3)).max))
      .values.toSeq.sortBy(_._1)
    files.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(implicitly[Ordering[(Long, Long)]].lt(hi, lo))
      case _ =>
    }
    // the manifest certifies the landed bytes: recompute from the layout
    val man = spark.read.parquet(s"$out/_manifest")
      .select("pack_shard", "n_docs", "total_toks", "checksum")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expected = landed
      .select(($"seq_first" % 4L).as("ps"), $"n_toks",
        org.apache.spark.sql.functions
          .expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h2"))
      .as[(Long, Long, Long)].collect().groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (ps, v) => (ps, v.length.toLong, v.map(_._2).sum, v.map(_._3).reduce(_ ^ _)) }
    assert(man.toSeq == expected)
    assert(total == man.map(_._3).sum)
  }

  test("selection flow lands the q104→q115→q109 composition, hive-partitioned") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_sel")
      .resolve("selection").toString
    val docs = Tables.documents(spark, sfDir)
    val landed = Flows.selectionFlow(docs, budget = 600L, nShards = 4, out)
    assert(landed.count() > 0)
    // the landed doc set = the mixture sample run through the budget
    // (the same bodies q104/q115 declare)
    val expected = graft.operators.Corpus2.groupBudget(
        graft.operators.Corpus2.mixtureSample(docs), 600L)
      .select("doc_id").as[Long].collect().sorted
    import org.apache.spark.sql.functions.col
    assert(landed.select("doc_id").as[Long].collect().sorted.toSeq == expected.toSeq)
    // every shard materialized as a hive partition; reading one prunes
    val shards = landed.select("shard").distinct().as[Int].collect().sorted
    assert(shards.toSeq == (0 until 4))
    val one = spark.read.parquet(out).filter(col("shard") === 0)
    assert(one.count() > 0 && one.count() < landed.count())
  }

  test("tokenizer flow lands the encoded corpus + the merge-table artifact") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_spec_k").toString
    val docs = Tables.documents(spark, sfDir)
    val landed = Flows.tokenizerFlow(docs, rounds = 3, out)
    // encoded rows = q122's (already oracled) relation, doc by doc
    val expected = SparkEntry.queries("q122_bpe_encode")(spark, sfDir)
      .select("doc_id", "n_words", "n_bpe").as[(Long, Long, Long)].collect().sorted
    assert(landed.select("doc_id", "n_words", "n_bpe")
      .as[(Long, Long, Long)].collect().sorted.toSeq == expected.toSeq)
    // the model artifact is the q121 merge table
    val tok = spark.read.parquet(s"$out/_tokenizer")
    assert(tok.count() ==
      SparkEntry.queries("q121_bpe_merges")(spark, sfDir).count())
    assert(tok.columns.contains("merge1") && tok.columns.contains("syms"))
    // hive layout prunes by source
    import org.apache.spark.sql.functions.col
    val one = spark.read.parquet(s"$out/encoded").filter(col("source") === "src0")
    assert(one.count() > 0 && one.count() < landed.count())
  }

  test("build-tree writes the nested artifact file") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_spec_t")
    val docs = Seq(
      (0L, "spark join scan filter join"),
      (1L, "join scan hash join spark")).toDF("doc_id", "text")
    val json = Flows.buildTree(docs, Seq("join"), depth = 1, out.resolve("tree.json"))
    assert(java.nio.file.Files.readString(out.resolve("tree.json")) == json)
    assert(json.startsWith("{\n  \"join\": {"))
  }

  test("monitoring flow lands one health row per series, consistent with its component queries") {
    val out = java.nio.file.Files.createTempDirectory("graft_flows_mon")
    val health = Flows.monitoringFlow(spark, sfDir, out.resolve("mon").toString)
    val types = Tables.events(spark, sfDir)
      .select($"event_type".as[String]).distinct().collect().toSet
    val rows = health.collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet == types)
    // every component's columns landed, none null
    val cols = Seq("n", "mean_val", "sd_val", "skewness", "ex_kurtosis",
      "ks_d", "drift", "level", "trend", "f1", "f2", "f3", "msse")
    for (c <- cols; r <- rows) assert(!r.isNullAt(r.fieldIndex(c)), s"null $c")
    // health values must equal the standalone oracled queries
    val drift = SparkEntry.queries("q185_ks_drift")(spark, sfDir)
      .select($"event_type".as[String], $"ks_d".as[Double]).collect().toMap
    assert(rows.forall(r => drift(r.getAs[String]("event_type")) == r.getAs[Double]("ks_d")))
    // the anomalies sidecar is exactly q181's flagged days
    val anom = spark.read.parquet(out.resolve("mon").toString + "/_anomalies").count()
    val q181 = SparkEntry.queries("q181_seasonal_anomaly")(spark, sfDir)
      .filter($"anomaly" === 1).count()
    assert(anom == q181)
  }

  test("integrity flow localizes tampering to exactly the divergent subtrees") {
    val out = java.nio.file.Files.createTempDirectory("graft_integrity_flow")
    val v1 = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // tamper set: edit %97 docs, drop one doc, add one doc
    val tampered = v1.select($"doc_id".as[Long]).collect()
      .map(_.longValue).filter(_ % 97 == 0).toSet
    val dropped = 3L
    val v2 = v1.filter($"doc_id" =!= dropped)
      .withColumn("text", org.apache.spark.sql.functions.when($"doc_id" % 97 === 0,
        org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit(" tampered"))).otherwise($"text"))
      .unionByName(v1.filter($"doc_id" === 0L)
        .select(($"doc_id" + 900000L).as("doc_id"), $"text"))
    val verdict = Flows.integrityAuditFlow(v1, v2, out.resolve("audit").toString)

    val affectedPages = tampered.map(_ / 64) + (dropped / 64) + (900000L / 64)
    val affectedShards = affectedPages.map(_ % 8)
    val rows = verdict.collect().map(r => (r.getAs[String]("level"),
      r.getAs[Long]("node"), r.getAs[Int]("ok"))).toSeq
    // root must flag; bad pages/shards are exactly the affected sets
    assert(rows.filter(_._1 == "root").map(_._3) == Seq(0))
    assert(rows.filter(r => r._1 == "page" && r._3 == 0).map(_._2).toSet == affectedPages)
    assert(rows.filter(r => r._1 == "shard" && r._3 == 0).map(_._2).toSet == affectedShards)
    // the localized doc diff is exactly the edit script
    val tam = spark.read.parquet(out.resolve("audit").toString + "/_tampered")
      .select($"doc_id".as[Long], $"change".as[String]).collect().toSet
    val expected = tampered.map(id => (id, "changed")) +
      ((dropped, "removed")) + ((900000L, "added"))
    assert(tam == expected)
  }

  test("corpus-diagnostics flow summarizes its three component queries consistently") {
    val out = java.nio.file.Files.createTempDirectory("graft_diag_flow")
    val summary = Flows.corpusDiagnosticsFlow(spark, sfDir, out.resolve("diag").toString)
      .as[(Long, Long, Double, Long, Double, Double, Double)].collect()
    assert(summary.length == 1)
    val (nTokens, vocab, p0, vocabCum, beta, slope, r2) = summary.head

    val gt = SparkEntry.queries("q226_good_turing")(spark, sfDir)
      .select($"r".as[Long], $"mass".as[Double], $"n_tokens".as[Long], $"vocab".as[Long])
      .collect()
    assert(nTokens == gt.head._3 && vocab == gt.head._4)
    assert(p0 == gt.find(_._1 == 1).get._2)
    val heaps = SparkEntry.queries("q228_heaps_growth")(spark, sfDir)
      .select($"b".as[Long], $"vocab_cum".as[Long], $"heaps_beta".as[Option[Double]])
      .collect().maxBy(_._1)
    assert(vocabCum == heaps._2 && beta == heaps._3.get)
    val Array((_, zslope, _, zr2)) = SparkEntry.queries("q227_zipf_fit")(spark, sfDir)
      .as[(Long, Double, Double, Double)].collect()
    assert(slope == zslope && r2 == zr2)
    // artifacts landed: growth curve (main), smoothing table, fit sidecars
    assert(spark.read.parquet(out.resolve("diag").toString).count() == 10)
    assert(spark.read.parquet(out.resolve("diag").toString + "/_good_turing").count() == gt.length)
    assert(spark.read.parquet(out.resolve("diag").toString + "/_zipf").count() == 1)
  }

  test("quality-signals flow lands the per-doc scorecard consistent with its cube sidecar") {
    val out = java.nio.file.Files.createTempDirectory("graft_qsig").toString
    val cube = Flows.qualitySignalsFlow(spark, "/root/testdata/sf0.001", out)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the scorecard covers the corpus exactly once, ordered
    val card = spark.read.parquet(out)
      .select("doc_id", "rule_keep", "clf_keep", "tercile", "dsir_selected")
      .as[(Long, Boolean, Boolean, String, Boolean)].collect().toSeq
    assert(card.map(_._1) == docs.select("doc_id").as[Long].collect().sorted.toSeq)
    // the cube sidecar IS the scorecard's own contingency fold — the
    // flow cannot land two stories
    val sidecar = spark.read.parquet(s"$out/_cube")
      .as[(Boolean, Boolean, Boolean, Boolean, Long, Double)].collect().toSeq
    assert(sidecar.sortBy(r => (r._1, r._2, r._3, r._4)) ==
      cube.as[(Boolean, Boolean, Boolean, Boolean, Long, Double)].collect().toSeq)
    val folded = card.groupBy(c => (c._2, c._3, c._4 != "tail", c._5))
      .view.mapValues(_.size.toLong).toMap
    sidecar.foreach { case (a, b, c, d, n, _) =>
      assert(folded((a, b, c, d)) == n, s"cell ($a,$b,$c,$d)")
    }
    assert(sidecar.map(_._5).sum == card.size.toLong)
    // and the sidecar IS q285's published cube — the flow's scorecard
    // fold and the standalone query tell the same story
    val pub = SparkEntry.queries("q285_quality_signal_cube")(
        spark, "/root/testdata/sf0.001")
      .as[(Boolean, Boolean, Boolean, Boolean, Long, Double)].collect().toSeq
    assert(sidecar.sortBy(r => (r._1, r._2, r._3, r._4)) == pub)
    // r14: the scorecard's per-doc ens_keep column replays the q286
    // decision rule from its own landed votes...
    val ek = spark.read.parquet(out)
      .select("rule_keep", "clf_keep", "tercile", "dsir_selected", "ens_keep")
      .as[(Boolean, Boolean, String, Boolean, Boolean)].collect()
    ek.foreach { case (r, c, t, d, e) =>
      val lk = Seq(c, t != "tail", d).count(identity)
      assert(e == (r && lk >= 2), s"ens_keep rule at ($r,$c,$t,$d)")
    }
    // ...and the _verdict sidecar IS q286's published table — folded
    // from the landed bytes, same story as the standalone query
    val vsc = spark.read.parquet(s"$out/_verdict")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val vpub = SparkEntry.queries("q286_ensemble_verdict")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(vsc == vpub)
    // the landed decision's totals agree with the sidecar
    assert(ek.count(_._5).toLong == vsc.head._5)
  }

  test("quality-signals flow fail-loud names the offending doc_id, not just the column") {
    // a 1-token doc has no bigram, so q283's LM frame can't score it —
    // the flow's LEFT join + must() contract has to raise, and (r15)
    // the message must carry the ROW to chase, not only the column: on
    // a 100 TB run "ppl missing" without an id is not actionable.
    val stage = java.nio.file.Files.createTempDirectory("graft_qsig_short")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val short = docs.limit(1)
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(999999L))
      .withColumn("text", org.apache.spark.sql.functions.lit("single"))
    docs.union(short).coalesce(1)
      .write.parquet(stage.resolve("documents.parquet").toString)
    val out = stage.resolve("scorecard").toString
    val ex = intercept[Exception] {
      Flows.qualitySignalsFlow(spark, stage.toString, out)
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("missing for doc_id=999999"), msgs.take(500))
  }

  test("semantic-dedup flow lands exactly q170's kept docs plus a consistent cluster ledger") {
    val out = java.nio.file.Files.createTempDirectory("graft_semdedup_flow")
    val landed = Flows.semanticDedupFlow(spark, sfDir, out.resolve("kept").toString)
    val verdicts = SparkEntry.queries("q170_semdedup")(spark, sfDir)
      .select($"vec_id".as[Long], $"cluster".as[Long], $"crank".as[Long], $"kept".as[Boolean])
      .collect()
    val keptIds = verdicts.filter(_._4).map(_._1).toSet
    assert(landed.select($"doc_id".as[Long]).collect().toSet == keptIds)
    // ledger: per-cluster counts add up and the exemplar is the rank-1 member
    val ledger = spark.read.parquet(out.resolve("kept").toString + "/_clusters")
      .select($"cluster".as[Long], $"n_kept".as[Long], $"n_dropped".as[Long], $"exemplar".as[Long])
      .collect().map(r => r._1 -> r).toMap
    verdicts.groupBy(_._2).foreach { case (cl, ms) =>
      val (_, nk, nd, ex) = ledger(cl)
      assert(nk == ms.count(_._4) && nd == ms.count(!_._4))
      assert(ex == ms.find(_._3 == 1).get._1, s"cluster $cl exemplar")
    }
  }
}
