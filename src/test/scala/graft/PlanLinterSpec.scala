package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** The automated plan linter (r5/r6 verdict task): EVERY query in
  * SparkEntry.queries is planned and swept for the statically
  * detectable 100 TB scale-killers —
  *
  *  (a) a CartesianProduct (both sides non-broadcast: quadratic
  *      pairing) — no query may plan one, ever (bounded scalar
  *      attaches plan as BroadcastNestedLoopJoin, not this);
  *  (b) an UNPARTITIONED Window/WindowGroupLimit (requires
  *      SinglePartition: the whole input through one task), unless the
  *      window's input is bounded by construction — each exemption
  *      below records that bound;
  *  (c) an `Exchange SinglePartition` in the executed plan that is not
  *      a scalar-aggregate merge (one partial row per upstream
  *      partition) and not under an allowlisted bounded window.
  *
  * Any NEW query tripping a rule fails red until fixed or justified
  * here. This is the net that would have caught q248's
  * `sum OVER (ORDER BY v)` automatically: its window input was the
  * data-sized order-value count table — NOT allowlistable — and q248
  * now routes through Indexing.globalPrefixSums instead.
  *
  * Scope notes: rules (a)+(b) walk the pre-AQE physical tree
  * (sparkPlan; exchanges are not yet inserted there, so (c) reads the
  * executedPlan text with the same next-line idiom the targeted
  * PlanShapeSpec tests use). Subtrees hidden behind an eager
  * localCheckpoint (global-index/prefix-sum primitives, iterative
  * fits) are pinned by targeted PlanShapeSpec tests. Per-key window
  * CARDINALITY (a corpus-sized sort under a ≤|groups|-partition
  * exchange) is not statically decidable and stays with the targeted
  * pins (q50/q115/q144/q153 families).
  */
class PlanLinterSpec extends AnyFunSuite with SparkSuite {

  /** Queries allowed an unpartitioned window, with the input bound that
    * justifies it. Every entry funnels a BOUNDED pre-aggregate —
    * domain/day/top-k/centroid-sized — never a corpus-sized relation. */
  private val globalWindowOk: Map[String, String] = Map(
    "q52_knn_ivf_kmeans"        -> "centroid tables: k=8 rows (Lloyd unroll ranking)",
    "q72_topic_summary"         -> "topic/centroid tables: k=8 rows",
    "q102_vocab_encode"         -> "token value-DOMAIN count table (top-50 id cut after rank; q151 exemption class)",
    "q123_hybrid_rrf"           -> "two limit(100) candidate lists (k-bounded fusion)",
    "q138_retrieval_ndcg"       -> "top-10 ranked list + ideal ordering (k-bounded)",
    "q146_vocab_coverage"       -> "top-500 terms via TakeOrderedAndProject (pinned in PlanShapeSpec)",
    "q160_cumulative_uniques"   -> "per-day first-seen counts: <=30 day rows",
    "q161_funnel"               -> "3 funnel stages",
    "q162_peak_concurrency"     -> "day-boundary delta table: <=31 day rows",
    "q169_ivf_delta"            -> "centroid rank/occupancy tables: k=8 rows",
    "q170_semdedup"             -> "Lloyd centroid tables: k=8 rows (member ranks are cluster-partitioned)",
    "q191_cusum_changepoint"    -> "daily aggregate: <=30 day rows",
    "q193_pareto_frontier"      -> "per-bucket skyline candidates: <=|buckets| rows",
    "q197_fair_share"           -> "20 source-group aggregate rows",
    "q200_volume_acf"           -> "daily volume series: <=30 day rows",
    "q208_kaplan_meier"         -> "distinct event-time table: <=|days| rows",
    "q209_logrank_contributions" -> "distinct event-time table: <=|days| rows",
    "q212_mann_whitney"         -> "n_chars value-DOMAIN count table (q151 exemption)",
    "q216_bradley_terry"        -> "5 item-strength rows",
    "q221_spearman_matrix"      -> "3 value-DOMAIN rank tables (domain-sized, broadcast back)",
    "q227_zipf_fit"             -> "top-100 terms",
    "q228_heaps_growth"         -> "10 decile checkpoints",
    "q231_silhouette"           -> "8 cluster aggregate rows",
    "q233_stl_decompose"        -> "30-day series",
    "q238_pacf"                 -> "daily aggregate (<=30 day rows) feeding the 5-lag Durbin-Levinson",
    "q245_kruskal_wallis"       -> "value-DOMAIN midrank table",
    "q246_rank_biased_overlap"  -> "two top-20 rank lists",
    "q279_temperature_scaling"  -> "10 temperature-grid aggregate rows (argmin rank)",
    "q280_domain_reweight"      -> "20 per-source aggregate rows (DRO tilt windows)",
    "q281_gate_ordering"        -> "120 permutation-total rows (rank windows)",
    "q282_doremi_sample"        -> "20 per-source target rows (total-sampled window)",
    "q283_lm_perplexity"        -> "value-DOMAIN ppl-bucket count table (boundary cumsum)",
    "q284_dsir_select"          -> "value-DOMAIN logw-bucket count table (boundary cumsum)",
    "q285_quality_signal_cube"  -> "<=16 contingency-cell rows (share window)"
  )

  /** Queries allowed a non-scalar-merge SinglePartition exchange — the
    * exchange feeds one of the bounded windows above. */
  private val singlePartitionExchangeOk: Map[String, String] = globalWindowOk

  private def cartesians(plan: SparkPlan): Seq[SparkPlan] =
    plan.collectWithSubqueries { case c: CartesianProductExec => c }

  private def globalWindows(plan: SparkPlan): Seq[SparkPlan] =
    plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty           => w: SparkPlan
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w: SparkPlan
    }

  /** `Exchange SinglePartition` lines whose next plan line is not a
    * scalar-aggregate merge (`partial_` or `keys=[], functions=[]`) —
    * the same next-line idiom as PlanShapeSpec's targeted pins. */
  private def badSinglePartitionExchanges(executed: String): Int = {
    val lines = executed.split("\n")
    lines.zipWithIndex.count { case (l, i) =>
      l.contains("Exchange SinglePartition") && {
        val next = lines.slice(i + 1, i + 3).mkString("\n")
        !(next.contains("partial_") || next.contains("keys=[], functions=[]"))
      }
    }
  }

  test("every declared query plans free of cartesian pairings and unbounded single-partition funnels") {
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val cart = cartesians(qe.sparkPlan)
        if (cart.nonEmpty)
          failures += s"$name: CartesianProduct (${cart.size}x) — quadratic pairing"
        val gw = globalWindows(qe.sparkPlan)
        if (gw.nonEmpty && !globalWindowOk.contains(name))
          failures += s"$name: ${gw.size} unpartitioned window(s) — whole input through one task"
        val sp = badSinglePartitionExchanges(qe.executedPlan.toString)
        if (sp > 0 && !singlePartitionExchangeOk.contains(name))
          failures += s"$name: $sp non-scalar SinglePartition exchange(s)"
      } catch {
        case e: Throwable => failures += s"$name: failed to plan: ${e.getMessage}"
      }
    }
    // allowlist hygiene: every entry must still name a declared query
    globalWindowOk.keySet.foreach { k =>
      if (!SparkEntry.queries.contains(k)) failures += s"stale allowlist entry: $k"
    }
    val f = failures.result()
    assert(f.isEmpty, s"\n${f.size} plan-linter violations:\n${f.mkString("\n")}")
  }
}
