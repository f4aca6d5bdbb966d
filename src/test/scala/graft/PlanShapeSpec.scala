package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the physical plans SCALE.md's claims rest on. If a
  * future change silently degrades a plan (lost broadcast, surprise
  * nested loop, unpruned scan), these fail before a benchmark would.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q05 star join is all broadcast hash joins") {
    val p = plan("q05_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(500))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q02 top-k fuses into TakeOrderedAndProject") {
    val p = plan("q02_filter_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q135 weighted sample is a scan + TakeOrderedAndProject — the corpus never shuffles") {
    val p = plan("q135_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange hashpartitioning"), p.take(600))
  }

  test("q50/q134/q141 per-query top-k is a bounded k-heap aggregate — no corpus-sized sort in a per-query window") {
    // r4 verdict #3: Window.partitionBy(qid) over the scored corpus
    // shuffles the ENTIRE corpus into |queries| reduce partitions and
    // sorts each. The groupTopK rewrite must leave NO Window node (the
    // only windows these plans ever had were the per-qid rankers) and
    // aggregate through ObjectHashAggregate, whose Partial mode trims
    // map-side buffers to ≤2k entries per (task × query). q140's
    // dedup-signal subtree keeps its own (bucket-bounded) windows, so
    // the ban is specifically on a window PARTITIONED BY qid — the
    // executed-plan line `Window [...], [qid#NNL], [...]`.
    val perQidWindow = """Window \[[^\n]*\], \[qid#\d+L?\]""".r
    for (q <- Seq("q50_knn_bruteforce", "q134_adc_search", "q141_truncated_rerank",
                  "q53_knn_lsh", "q140_hard_negatives")) {
      val p = plan(q)
      assert(perQidWindow.findFirstIn(p).isEmpty,
        s"$q: per-qid window is back:\n${p.take(600)}")
      assert(p.contains("ObjectHashAggregate"), s"$q:\n${p.take(600)}")
    }
  }

  test("q02 containsCI rides LowercaseContainsRewrite onto the persisted p_name_lc twin") {
    // The rule's second declared family (r4 verdict #6): unlike
    // flagship/q89, q02 never names the _lc column — containsCI builds
    // coalesce(contains(lower(p_name)), false) and the RULE retargets it.
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ plans.LowercaseContainsRewrite
    try {
      val p = plan("q02_filter_topk")
      assert(p.contains("StringContains(p_name_lc"), p.take(800))
      assert(!p.contains("lower(p_name"), p.take(800))
    } finally spark.experimental.extraOptimizations = before
  }

  test("q02 scan prunes to the projected columns") {
    val p = plan("q02_filter_topk")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("p_type"), "unused column p_type must not be read")
  }

  test("q28 range join plans as a hash join, not a nested loop") {
    val p = plan("q28_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q44 cosine uses the codegen'd expression, not interpreted HOFs") {
    val p = plan("q44_dedup_embedding")
    assert(p.contains("floatvecdot"))
    assert(!p.contains("aggregate(zip_with"))
  }

  test("flagship and q89 contains filters reach the scan as PushedFilters") {
    // VERDICT r1 #3: containsCI(lower(text)) could never push below the
    // scan; the prepared text_lc/source_lc columns make the predicate a
    // plain StringContains that the parquet scan receives.
    val pushed = "PushedFilters: \\[[^\\]]".r // non-empty PushedFilters list
    val f = operators.Relational.flagship(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(pushed.findFirstIn(f).isDefined, f.take(800))
    assert(f.contains("StringContains(text_lc"), f.take(800))
    // (explain truncates each metadata field at ~100 chars, so assert on
    // the leading pushed entries rather than the full list)
    val p = plan("q89_conjunctive_query")
    assert(pushed.findFirstIn(p).isDefined, p.take(800))
    assert(p.contains("Or(StringContains(text_lc,scan),Strin"), p.take(800))
  }

  test("q44 candidates are linear: anchor policy, no unblocked corpus self-join") {
    import org.apache.spark.sql.functions._
    // The blocked-anchor form pairs each vector with exactly one anchor:
    // candidate count == n - |sketch blocks|. An all-pairs regression
    // (VERDICT r1 #1) would be quadratic in block size and fail this.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(operators.Similarity.sketchSpark).as("sk"))
    val n = e.count()
    val blocks = e.select("sk").distinct().count()
    val anchors = e.groupBy("sk").agg(min("vec_id").as("anchor"))
    val cand = e.join(anchors, "sk").filter(col("vec_id") > col("anchor"))
    assert(cand.count() == n - blocks)
    // And the physical plan keeps both anchor joins broadcast — the corpus
    // side never shuffles for candidate generation.
    val p = plan("q44_dedup_embedding")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(500))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q58/q59 keep their small sides broadcast — no corpus-wide sort-merge join") {
    // q58: the 64-long Bloom bitmap and the eval set broadcast; the
    // corpus side never shuffles for a join. q59: df/avgdl/N broadcast.
    Seq("q58_bloom_decontaminate", "q59_bm25").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name: ${p.take(300)}")
      assert(!p.contains("SortMergeJoin"), s"$name grew a corpus shuffle join:\n${p.take(800)}")
    }
  }

  test("q56 global index never funnels through a single partition") {
    import org.apache.spark.sql.functions._
    // The naive form's plan contains `Exchange SinglePartition` feeding
    // an unpartitioned Window — the whole table through one task. The
    // scalable form must show a parallel RangePartitioning exchange and
    // NO SinglePartition anywhere.
    val naive = Tables.documents(spark, sfDir).select("doc_id")
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      .queryExecution.executedPlan.toString
    assert(naive.contains("SinglePartition"), naive.take(300))
    val p = plan("q56_global_index")
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"), p.take(800))
    // same contract for the running-sum primitive (q103) and the shard
    // ranking built on globalIndex (q109)
    Seq("q103_token_budget", "q109_shard_assign", "q130_epoch_mixing",
        "q139_sequence_packing").foreach { name =>
      val pp = plan(name)
      assert(!pp.contains("SinglePartition"),
        s"$name funnels the corpus through one task:\n${pp.take(800)}")
    }
  }

  test("q124/q126 never funnel the event stream through one task") {
    // cohort sizes broadcast back onto the keyed aggregate; the session
    // windows are user-keyed; the only global orderings are the final
    // tiny outputs (TakeOrdered / bounded aggregate sort)
    val p124 = plan("q124_retention_cohorts")
    assert(p124.contains("BroadcastHashJoin"), p124.take(500))
    Seq("q124_retention_cohorts", "q126_session_paths").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange SinglePartition, ENSURE"),
        s"$name funnels the corpus through one task:\n${p.take(800)}")
    }
  }

  test("q119/q122 keep their vocab-sized artifacts broadcast — scoring stays map-side") {
    // the DSIR weight table (≤256 rows) and the trained BPE tokenizer
    // (vocab-sized) must join the corpus scan as broadcasts, never as a
    // corpus-wide shuffle join
    Seq("q119_importance", "q122_bpe_encode").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: ${p.take(500)}")
    }
  }

  test("q144/q145 keep their tiny artifacts broadcast — the corpus never sort-merge-joins") {
    // q144's quota table is |langs| rows; q145's sketch is ≤4160 cells
    // and its candidate set 20 terms — every join of corpus-derived data
    // against them must be a broadcast
    Seq("q144_temperature_mixture", "q145_countmin_heavy_hitters").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: ${p.take(500)}")
      assert(!p.contains("SortMergeJoin"), s"$name: ${p.take(500)}")
    }
  }

  test("q146 cuts to the top-500 terms via TakeOrderedAndProject before any global window") {
    val p = plan("q146_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q151 histogram never funnels a table through one task — SinglePartition only under scalar aggregates") {
    // the rank exchange itself is inside globalIndex's localCheckpoint
    // (plan truncation hides it — q56's test pins that primitive); what
    // q151 must NOT add is a corpus-wide single-partition funnel. The
    // two 1-row count(*) scalars ARE SinglePartition exchanges, but
    // their input is one partial row per partition — assert every such
    // exchange feeds a scalar HashAggregate and nothing else.
    val lines = plan("q151_equidepth_histogram").split("\n")
    val sp = lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
    assert(sp.length <= 2, lines.take(30).mkString("\n"))
    sp.foreach { case (_, i) =>
      assert(lines(i + 1).contains("HashAggregate") &&
        lines(i + 1).contains("partial_count"),
        s"SinglePartition exchange not a scalar count:\n${lines.slice(i, i + 3).mkString("\n")}")
    }
  }

  test("q154 bloom probe never shuffles or sort-merge-joins the train corpus") {
    // the bloom is ONE collect_set row (BroadcastNestedLoopJoin of a
    // 1-row build side — bounded by construction) and the exact_hit
    // lookup is a broadcast hash join; the train side must meet no
    // SortMergeJoin, and the only hash exchanges allowed are the
    // EVAL-side distinct builds (one per width) — never the corpus
    val lines = plan("q154_bloom_decontaminate").split("\n")
    assert(!lines.exists(_.contains("SortMergeJoin")))
    assert(lines.exists(_.contains("BroadcastHashJoin")))
    val hp = lines.zipWithIndex.filter(_._1.contains("Exchange hashpartitioning"))
    assert(hp.length <= 2, lines.mkString("\n").take(800))
    hp.foreach { case (_, i) =>
      assert(lines(i + 1).contains("HashAggregate(keys=[fp"),
        s"hash exchange not the eval distinct:\n${lines.slice(i, i + 3).mkString("\n")}")
    }
  }

  test("q144/q115 group prefixes are bucket-segmented — no corpus-sized single-group sort") {
    // r5 rewrites: the only window allowed to see corpus rows must
    // partition by (group, bucket); the tiny carry tables use distinct
    // attribute names (bsource/bbkt) or bucket-ordered specs, so the
    // regression signature — a corpus window partitioned by the bare
    // group and ordered by the priority key — is textually precise.
    val p144 = plan("q144_temperature_mixture")
    assert("""\[lang#\d+L?\], \[md5""".r.findFirstIn(p144).isEmpty,
      s"per-lang hash-rank window is back:\n${p144.take(600)}")
    assert("""Window \[[^\n]*\], \[lang#\d+, bkt#\d+\]""".r.findFirstIn(p144).isDefined, p144.take(600))
    val p115 = plan("q115_group_budget")
    assert("""\[source#\d+L?\], \[n_chars""".r.findFirstIn(p115).isEmpty,
      s"per-source running-sum window is back:\n${p115.take(600)}")
    assert("""Window \[[^\n]*\], \[source#\d+, bkt#\d+\]""".r.findFirstIn(p115).isDefined, p115.take(600))
  }

  test("q178-q186 closers: single-partition exchanges only under scalar aggregates") {
    // q178's merge window partitions by the key, q180's top-2 by
    // vec_id, q185's ECDF by event_type, q186's rank by source, and
    // q179 derives shard ids from broadcast percentile boundaries with
    // no window at all — so the ONLY legitimate SinglePartition
    // exchanges in this family are tiny scalar-aggregate merges
    // (percentile boundaries, date/value spans, global medians), each
    // one partial row per upstream partition. Pin exactly that.
    val fam = Seq("q178_cdc_apply", "q179_zonemap_pruning", "q180_mutual_knn",
      "q181_seasonal_anomaly", "q184_moments_profile", "q185_ks_drift",
      "q186_gini_concentration")
    for (q <- fam) {
      val lines = plan(q).split("\n")
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
        case (_, i) =>
          val next = lines.slice(i + 1, i + 3).mkString("\n")
          // `keys=[], functions=[]` is the degenerate scalar agg Spark
          // plans under a literal-only derivation — same one-row-per-
          // partition input as a partial_ merge.
          assert(next.contains("Aggregate") &&
            (next.contains("partial_") || next.contains("keys=[], functions=[]")),
            s"$q: SinglePartition exchange not a scalar-agg merge:\n" +
              lines.slice(i, i + 3).mkString("\n"))
      }
    }
    assert(!plan("q179_zonemap_pruning").contains("Window"),
      "q179 must not re-grow a global ntile/rank window")
  }

  test("q190/q193-q195: basket pairing stays order-keyed, skyline never goes quadratic, burst/latency stay user-keyed") {
    // q190: the pair join is keyed by l_orderkey (hash/broadcast on a
    // key — NEVER a cartesian pairing), item supports broadcast into
    // the pair aggregate, and the top-20 fuses to TakeOrdered.
    val p190 = plan("q190_basket_lift")
    assert(p190.contains("TakeOrderedAndProject"), p190.take(600))
    assert(!p190.contains("CartesianProduct"), p190.take(600))
    assert("BroadcastHashJoin".r.findAllIn(p190).size >= 2, p190.take(600))
    // q193: dominance is the segmented sweep — no NOT-EXISTS style
    // quadratic join anywhere, and the frontier joins back by broadcast.
    val p193 = plan("q193_pareto_frontier")
    assert(!p193.contains("CartesianProduct"), p193.take(600))
    assert(p193.contains("BroadcastHashJoin"), p193.take(600))
    // q194/q195: everything is user- or week-keyed — a SinglePartition
    // exchange would mean the event stream funneled through one task.
    for (q <- Seq("q194_burst_rate_audit", "q195_conversion_latency")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n${p.take(600)}")
    }
  }

  test("q153 KMV set-algebra joins stay broadcast — sketches never sort-merge") {
    val p = plan("q153_kmv_distinct_sketch")
    assert(!p.contains("SortMergeJoin"), p.take(600))
    // r4 verdict #4: the sketch build must be the bounded k-min monoid
    // (ObjectHashAggregate over KMinHashes), not a per-scope rank window
    // that pulls a scope's entire distinct-hash set into one partition.
    assert(!p.contains("Window"), s"per-scope rank window is back:\n${p.take(600)}")
    assert(p.contains("kminhashes"), p.take(600))
  }

  test("q211-q229 statistics tranche: broadcast/keyed joins, bounded windows, fused argmaxes") {
    // q215 k-center: every greedy argmax is TakeOrderedAndProject(1)
    // with the chosen set broadcast (1-row BNLJ build sides); the final
    // per-point assignment rank pre-trims through WindowGroupLimit. A
    // SortMergeJoin or CartesianProduct would mean a corpus-sized
    // pairing replaced the broadcast passes.
    val p215 = plan("q215_kcenter_coreset")
    assert(!p215.contains("SortMergeJoin") && !p215.contains("CartesianProduct"), p215.take(600))
    assert(p215.contains("TakeOrderedAndProject") && p215.contains("WindowGroupLimit"), p215.take(600))
    // q219 HITS: both mutual-reinforcement rounds join the (tiny)
    // previous iterate broadcast — the corpus never sort-merges.
    val p219 = plan("q219_hits_ranking")
    assert(!p219.contains("SortMergeJoin") && !p219.contains("CartesianProduct"), p219.take(600))
    // q221 Spearman: all three value-domain rank tables broadcast back
    // onto the corpus row; their prefix windows run on aggregated
    // domain tables, never a raw scan.
    val p221 = plan("q221_spearman_matrix")
    assert("BroadcastHashJoin".r.findAllIn(p221).size >= 3, p221.take(600))
    assert(!p221.contains("SortMergeJoin"), p221.take(600))
    // q212 Mann-Whitney: the unpartitioned prefix window's input is the
    // groupBy(value) domain table (HashAggregate keyed on x), which is
    // what makes the SinglePartition exchange the q151 exemption.
    val p212 = plan("q212_mann_whitney")
    assert(p212.contains("HashAggregate(keys=[n_chars#"), p212.take(800))
    // q222 Kendall: all counting happens in aggregates over the
    // contingency grid — no window node anywhere.
    assert(!plan("q222_kendall_taub").contains("Window"))
    // q229 skip-gram: the pair join stays doc-keyed and the final
    // top-20 fuses; no cross pairing of the corpus.
    val p229 = plan("q229_skipgram_pairs")
    assert(p229.contains("TakeOrderedAndProject"), p229.take(600))
    assert(!p229.contains("CartesianProduct"), p229.take(600))
  }

  test("q255 batch ANN: candidate join is a cell-keyed shuffle hash join, top-k stays a bounded heap") {
    // r5 task #5: the query side is a TABLE (|Q| grows with the corpus),
    // so the corpus↔query candidate join must NOT broadcast either vector
    // side — the pinned shape is a shuffle hash join on the cell id, with
    // only the k×d centroid artifacts broadcast and the per-query top-k
    // still the bounded TopKScored heap (never a corpus sort).
    val p = plan("q255_knn_batch")
    assert("""ShuffledHashJoin \[label""".r.findFirstIn(p).isDefined,
      s"candidate join lost the two-sided shuffle-hash shape:\n${p.take(800)}")
    assert(p.contains("ObjectHashAggregate"), p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(600))
  }

  test("q248 Lorenz prefix sums ride globalPrefixSums — no data-sized SinglePartition window") {
    import org.apache.spark.sql.functions._
    // r5/r6 verdicts' named scale-killer: `sum OVER (ORDER BY v)` on the
    // value-count table (near-continuous at scale) funnels it through one
    // task. The primitive the query now routes through must show a
    // parallel range exchange and NO SinglePartition — and agree with
    // the naive window value-for-value.
    val g = Tables.orders(spark, sfDir)
      .groupBy(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .agg(count(lit(1)).as("n"))
    val scalable = operators.Indexing.globalPrefixSums(g, Seq(col("v")),
      Seq((col("n"), "cn"), ((col("n") * col("v")), "cs")))
    val p = scalable.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p.take(800))
    // the range exchange itself lives inside the primitive's eager
    // localCheckpoint (plan truncation hides it — q56's test pins that);
    // what must be visible here is that EVERY window is _pid-partitioned
    assert("""Window \[[^\n]*\], \[_pid""".r.findFirstIn(p).isDefined, p.take(800))
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = g.select(col("v"), col("n"),
      sum("n").over(w).as("cn"), sum(col("n") * col("v")).over(w).as("cs"))
    assert(scalable.select("v", "n", "cn", "cs").exceptAll(naive).count() == 0)
    assert(naive.exceptAll(scalable.select("v", "n", "cn", "cs")).count() == 0)
  }
}
