package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 closers, part 3 — five operator families the surface did not
  * yet carry, each a staple of a production analytics/curation stack
  * (the reference's pandas loop, scrappy.py:311-352, could express none
  * of them):
  *
  *  - q190 market-basket lift: part-pair affinity over order baskets —
  *    support / confidence / lift (the association-rule core of
  *    Agrawal-Srikant Apriori, restricted to pairs, which need no
  *    candidate generation at all).
  *  - q191 CUSUM change-point: localize WHERE the daily event volume
  *    shifted (Page 1954's cumulative-sum statistic) — the
  *    change-LOCALIZATION complement to q185's KS "did it drift at
  *    all" and q181's per-day "is today weird".
  *  - q192 readability profile: Flesch reading-ease + Gunning-fog per
  *    source from a vowel-group syllable heuristic — the fluency
  *    pillar of a corpus quality dashboard (q100 gates on surface
  *    ratios; this scores prose complexity).
  *  - q193 Pareto frontier (skyline): the non-dominated parts under
  *    (minimize price, maximize size) — Börzsönyi et al. 2001's
  *    skyline operator via a segmented sweep, not a quadratic
  *    NOT-EXISTS.
  *  - q194 burst-rate audit: per-user peak trailing-24 h event count
  *    via a RANGE-frame window — the rate-limiter / abuse-detection
  *    readout (q162 measures GLOBAL concurrency; this is per-key
  *    burstiness).
  *  - q195 conversion latency: first-view → first-subsequent-purchase
  *    delay per user, rolled up by first-view week — conversion rate
  *    plus interpolated median/p90 latency (the time-to-convert
  *    funnel readout; q161 counts WHO converts, this measures HOW
  *    FAST).
  *  - q196 trend fit: per-event-type OLS regression of daily volume on
  *    a zero-filled day spine — slope/intercept/R² from the five
  *    exact-integer moments (the LINEAR-trend complement to q188's
  *    exponential smoothing and q191's level-shift localization).
  *  - q197 fair-share allocation: max-min water-filling of a global
  *    token budget across sources — small sources keep their full
  *    capacity, the rest share the waterline (the quota-setting dual
  *    of q115/q144's take-in-priority-order budgets).
  *
  * Scale notes (also in SCALE.md):
  *  - q190: basket pair fan-out is Σ k_i² with k_i = items per order
  *    (≤13 in this data; bounded by basket size, never corpus size) —
  *    the self-join is keyed by l_orderkey so pairs never cross
  *    orders; item supports are a |parts|-sized dim joined by key;
  *    top-20 is a TakeOrderedAndProject after a hash agg on pair keys.
  *  - q191: the only window runs over the per-DAY pre-aggregate
  *    (|days| rows — q162's discipline), never over events. The CUSUM
  *    statistic is kept as the exact integer n·cum_k − k·T (one
  *    global count + sum broadcast), so the oracle is bit-exact.
  *  - q192: pure per-doc integer arithmetic (HOF folds, codegen'd),
  *    one hash agg by source, float math only in the final 20-row
  *    projection. No shuffle before the agg's partial/final split.
  *  - q193: dominance is resolved by a SEGMENTED sweep (q162's
  *    carry decomposition): collapse to per-price maxima (map-side
  *    partial agg), bucket prices into ranges, resolve each bucket's
  *    local frontier in a bucket-keyed window, then apply a carry —
  *    the running max of whole cheaper buckets — computed on the
  *    |buckets|-row table. No corpus-wide window, no p² join: the
  *    unpartitioned window touches only bucket summaries.
  *  - q194: the sliding count is a user-keyed RANGE frame (peers share
  *    one value on both engines), so state per key is the 24 h event
  *    horizon; the per-user aggregate is a plain hash agg. Nothing
  *    global anywhere.
  *  - q195: two user-keyed min-aggregates and one user-keyed equi-join
  *    whose fan-out is the user's own purchase count; the weekly
  *    rollup runs on |users| rows and the percentiles interpolate
  *    exact integer microsecond gaps (the q132/q157 proven pair).
  *  - q196: one corpus pass to (type, day) counts; the spine fill and
  *    the five moment sums run on |types|·|days| rows. The moments are
  *    exact int64 at every gate SF; at 100 TB daily counts the two
  *    squared-sum products move to DECIMAL internals (the q110/q184
  *    rule) with the identical plan.
  *  - q197: capacities are one hash agg by source; the water-filling
  *    sort, prefix sum, and waterline pick all run on the |sources|-row
  *    summary (the only unpartitioned window in the family). The
  *    capped set is provably the ascending-capacity prefix — the
  *    per-row test pfx + cap·(n−i+1) ≤ B is monotone in i — so one
  *    window pass decides it; no iteration.
  */
object Corpus7 {

  /** Distinct (order, part) baskets — the input to q190. */
  private def baskets(li: DataFrame): DataFrame =
    li.select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q190_basket_lift",
      // MARKET-BASKET PAIR AFFINITY — for part pairs co-occurring in
      // ≥2 orders: support (co-orders), per-item supports, confidence
      // P(b|a) and lift N·c_ab/(c_a·c_b). Lift is ONE IEEE division of
      // exact integer products (each ≪ 2^53), so both engines compute
      // the identical double and the rank order (lift desc, pa, pb) is
      // total and stable; the published value is rounded to 6dp.
      (s, dir) => {
        val b = baskets(Tables.lineitem(s, dir))
        val n = b.agg(countDistinct("k").as("nn"))
        val sup = b.groupBy("p").agg(count(lit(1)).as("cs"))
        val pairs = b.as("a").join(b.as("b2"), col("a.k") === col("b2.k") && col("a.p") < col("b2.p"))
          .groupBy(col("a.p").as("pa"), col("b2.p").as("pb"))
          .agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
        pairs
          .join(broadcast(sup.withColumnRenamed("p", "pa").withColumnRenamed("cs", "ca")), "pa")
          .join(broadcast(sup.withColumnRenamed("p", "pb").withColumnRenamed("cs", "cb")), "pb")
          .crossJoin(broadcast(n))
          .withColumn("lift_x", (col("nn") * col("sup")).cast("double") / (col("ca") * col("cb")))
          .withColumn("conf_x", col("sup").cast("double") / col("ca"))
          .orderBy(col("lift_x").desc, col("pa"), col("pb")).limit(20)
          .select(col("pa"), col("pb"), col("sup").as("support"),
            col("ca").as("sup_a"), col("cb").as("sup_b"),
            round(col("lift_x"), 6).as("lift"),
            round(col("conf_x"), 6).as("confidence"))
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
             |n AS (SELECT count(DISTINCT k) AS nn FROM b),
             |s AS (SELECT p, count(*) AS cs FROM b GROUP BY 1),
             |pr AS (SELECT a.p AS pa, b2.p AS pb, count(*) AS sup FROM b a
             |JOIN b b2 ON a.k = b2.k AND a.p < b2.p GROUP BY 1, 2 HAVING count(*) >= 2),
             |x AS (SELECT pa, pb, sup, sa.cs AS ca, sb.cs AS cb,
             |CAST(nn * sup AS DOUBLE) / (sa.cs * sb.cs) AS lift_x,
             |CAST(sup AS DOUBLE) / sa.cs AS conf_x
             |FROM pr JOIN s sa ON pa = sa.p JOIN s sb ON pb = sb.p, n)
             |SELECT pa, pb, CAST(sup AS BIGINT) AS support, CAST(ca AS BIGINT) AS sup_a,
             |CAST(cb AS BIGINT) AS sup_b, round(lift_x, 6) AS lift,
             |round(conf_x, 6) AS confidence
             |FROM x ORDER BY lift_x DESC, pa, pb LIMIT 20"""
        .stripMargin.replace("\n", " "))),

    QueryDef(
      "q191_cusum_changepoint",
      // CUSUM CHANGE-POINT — scaled cumulative sum of daily-volume
      // deviations from the global mean, kept exact-integer as
      // s_k = n·cum_k − k·T (n days, T total events, cum_k the running
      // event count through day k): s_k/n is the classic CUSUM, and
      // argmax |s_k| localizes the most likely level-shift day
      // (earliest day wins ties). The running sum and the argmax both
      // operate on the |days| pre-aggregate.
      (s, dir) => {
        val daily = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
          .groupBy("d").agg(count(lit(1)).as("cnt"))
        val tot = daily.agg(count(lit(1)).as("n"), sum("cnt").as("t"))
        val w = Window.orderBy("d")
        val cu = daily.crossJoin(broadcast(tot))
          .withColumn("k", row_number().over(w))
          .withColumn("cum", sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cusum", col("n") * col("cum") - col("k") * col("t"))
        val mx = cu.agg(max(abs(col("cusum"))).as("mxa"))
        val cp = cu.crossJoin(broadcast(mx))
          .filter(abs(col("cusum")) === col("mxa"))
          .agg(min("d").as("cpd"))
        cu.crossJoin(broadcast(cp))
          .select(col("d"), col("cnt"), col("cusum").cast("long").as("cusum"),
            when(col("d") === col("cpd"), 1).otherwise(0).as("is_changepoint"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt FROM events GROUP BY 1),
             |tot AS (SELECT count(*) AS n, sum(cnt) AS t FROM daily),
             |cu AS (SELECT d, cnt,
             |n * sum(cnt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |- row_number() OVER (ORDER BY d) * t AS cusum FROM daily, tot),
             |mx AS (SELECT max(abs(cusum)) AS mxa FROM cu),
             |cp AS (SELECT min(d) AS cpd FROM cu, mx WHERE abs(cusum) = mxa)
             |SELECT d, CAST(cnt AS BIGINT) AS cnt, CAST(cusum AS BIGINT) AS cusum,
             |CASE WHEN d = cpd THEN 1 ELSE 0 END AS is_changepoint
             |FROM cu, cp ORDER BY d""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q192_readability",
      // READABILITY PROFILE — Flesch reading-ease and Gunning-fog per
      // source. Syllables are approximated by VOWEL GROUPS per token
      // (the standard dictionary-free heuristic); "complex" = ≥3
      // groups; sentence length is pinned at the corpus's 15-token
      // chunk convention (q93) since the synthetic text carries no
      // punctuation. All per-doc numbers are exact integers from HOF
      // folds; the two formulas are single float projections over the
      // 20-row per-source aggregate, rounded to 3dp.
      (s, dir) => {
        val syl = "aggregate(w, 0, (a, t) -> a + size(regexp_extract_all(t, '[aeiou]+', 0)))"
        val cpx = "size(filter(w, t -> size(regexp_extract_all(t, '[aeiou]+', 0)) >= 3))"
        Tables.documents(s, dir)
          .select(col("source"), expr(TextAnalytics.toksExpr).as("w"))
          .filter(size(col("w")) > 0)
          .select(col("source"), size(col("w")).cast("long").as("nw"),
            expr(syl).cast("long").as("ns"), expr(cpx).cast("long").as("nc"),
            expr("CAST((size(w) + 14) div 15 AS BIGINT)").as("nsent"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("nw").as("words"),
            sum("ns").as("syllables"), sum("nc").as("complex_words"),
            sum("nsent").as("sentences"))
          .withColumn("flesch", round(lit(206.835)
            - lit(1.015) * (col("words").cast("double") / col("sentences"))
            - lit(84.6) * (col("syllables").cast("double") / col("words")), 3))
          .withColumn("fog", round(lit(0.4)
            * (col("words").cast("double") / col("sentences")
              + lit(100.0) * col("complex_words") / col("words")), 3))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, ${TextAnalytics.toksDuck} AS w FROM documents),
              |d AS (SELECT source, len(w) AS nw,
              |coalesce(list_sum(list_transform(w, t -> len(regexp_extract_all(t, '[aeiou]+')))), 0) AS ns,
              |len(list_filter(w, t -> len(regexp_extract_all(t, '[aeiou]+')) >= 3)) AS nc,
              |(len(w) + 14) // 15 AS nsent FROM t WHERE len(w) > 0)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nw) AS BIGINT) AS words,
              |CAST(sum(ns) AS BIGINT) AS syllables, CAST(sum(nc) AS BIGINT) AS complex_words,
              |CAST(sum(nsent) AS BIGINT) AS sentences,
              |round(206.835 - 1.015 * (CAST(sum(nw) AS DOUBLE) / sum(nsent))
              |- 84.6 * (CAST(sum(ns) AS DOUBLE) / sum(nw)), 3) AS flesch,
              |round(0.4 * (CAST(sum(nw) AS DOUBLE) / sum(nsent)
              |+ 100.0 * sum(nc) / sum(nw)), 3) AS fog
              |FROM d GROUP BY 1 ORDER BY source""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q193_pareto_frontier",
      // PARETO FRONTIER (SKYLINE) — parts not dominated under
      // (minimize p_retailprice, maximize p_size): p is dominated iff
      // some q has price ≤, size ≥, one strict. Segmented sweep:
      // (1) collapse to per-price max size (map-side partial agg);
      // (2) bucket by price range and resolve each bucket's local
      // frontier with a bucket-KEYED running max; (3) carry = running
      // max of whole cheaper buckets, computed on the |buckets|-row
      // summary — a price survives iff its max beats both the local
      // strict-predecessor max and the carry. Frontier members are the
      // rows at a surviving price whose size equals that price's max
      // (ties on (price, size) are mutually non-dominating).
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        val pp = p.groupBy("p_retailprice").agg(max("p_size").as("mx"))
          .withColumn("bkt", floor(col("p_retailprice") / 100.0).cast("long"))
        val wLoc = Window.partitionBy("bkt").orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)
        val loc = pp.withColumn("prevloc", max("mx").over(wLoc))
        val bsum = pp.groupBy("bkt").agg(max("mx").as("bmax"))
        val wCarry = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
        val carry = bsum.withColumn("carry", max("bmax").over(wCarry)).select("bkt", "carry")
        val fr = loc.join(broadcast(carry), "bkt")
          .withColumn("bar", greatest(coalesce(col("prevloc"), lit(Int.MinValue)),
            coalesce(col("carry"), lit(Int.MinValue))))
          .filter(col("mx") > col("bar"))
          .select(col("p_retailprice").as("fpr"), col("mx"))
        p.join(broadcast(fr), col("p_retailprice") === col("fpr") && col("p_size") === col("mx"))
          .select("p_partkey", "p_retailprice", "p_size")
          .orderBy("p_retailprice", "p_partkey")
      },
      Some("""WITH pp AS (SELECT p_retailprice AS pr, max(p_size) AS mx FROM part GROUP BY 1),
             |r AS (SELECT pr, mx, max(mx) OVER (ORDER BY pr
             |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev FROM pp),
             |f AS (SELECT pr, mx FROM r WHERE prev IS NULL OR mx > prev)
             |SELECT p_partkey, p_retailprice, p_size FROM part
             |JOIN f ON p_retailprice = pr AND p_size = mx
             |ORDER BY p_retailprice, p_partkey""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q194_burst_rate_audit",
      // BURST-RATE AUDIT — per-user peak trailing-24 h event count via
      // a user-keyed RANGE frame over event time (peers at one
      // microsecond share one value on both engines), aggregated to
      // the users whose peak ever reached 5: peak, how many events sat
      // inside a bursty window, and the first day it happened — the
      // rate-limiter / abuse readout.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-86400000000L, 0)
        Tables.events(s, dir)
          .withColumn("us", expr("unix_micros(ts)"))
          .withColumn("win", count(lit(1)).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max("win").as("peak_24h"),
            sum(when(col("win") >= 5, 1L).otherwise(0L)).as("n_bursty"),
            min(when(col("win") >= 5, to_date(col("ts")))).as("first_burst_day"))
          .filter(col("peak_24h") >= 5)
          .orderBy("user_id")
      },
      Some("""WITH b AS (SELECT user_id, ts, count(*) OVER (PARTITION BY user_id
             |ORDER BY epoch_us(ts) RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS win
             |FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |CAST(max(win) AS BIGINT) AS peak_24h,
             |CAST(count(*) FILTER (win >= 5) AS BIGINT) AS n_bursty,
             |min(CASE WHEN win >= 5 THEN CAST(ts AS DATE) END) AS first_burst_day
             |FROM b GROUP BY 1 HAVING max(win) >= 5 ORDER BY user_id"""
        .stripMargin.replace("\n", " "))),

    QueryDef(
      "q195_conversion_latency",
      // CONVERSION LATENCY — per user: first 'view' (t0), first
      // 'purchase' strictly after it (t1), latency = t1−t0 in exact
      // integer microseconds; rolled up by the Monday-start week of
      // the first view: how many users started viewing, how many
      // converted, the rate, and interpolated median/p90/max latency
      // in seconds (1dp). Latency percentiles interpolate exact
      // integers, so both engines produce the identical double.
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", expr("unix_micros(ts)"))
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t0"))
          .withColumn("wk", to_date(date_trunc("week", timestamp_micros(col("t0")))))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("us") > col("t0"))
          .groupBy("user_id", "wk").agg((min("us") - min("t0")).as("lat"))
        val viewers = fv.groupBy("wk").agg(count(lit(1)).as("users_viewing"))
        conv.groupBy("wk")
          .agg(count(lit(1)).as("conversions"),
            expr("percentile(lat, 0.5D)").as("p50"),
            expr("percentile(lat, 0.9D)").as("p90"),
            max("lat").as("mx"))
          .join(broadcast(viewers), "wk")
          .select(col("wk"), col("users_viewing"), col("conversions"),
            round(col("conversions").cast("double") / col("users_viewing"), 4).as("conv_rate"),
            round(col("p50") / 1e6, 1).as("median_s"),
            round(col("p90") / 1e6, 1).as("p90_s"),
            round(col("mx") / 1e6, 1).as("max_s"))
          .orderBy("wk")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, ts, epoch_us(ts) AS us FROM events),
             |fv AS (SELECT user_id, min(us) AS t0,
             |CAST(date_trunc('week', min(ts)) AS DATE) AS wk
             |FROM ev WHERE event_type = 'view' GROUP BY 1),
             |conv AS (SELECT e.user_id, wk, min(us) - min(t0) AS lat FROM ev e
             |JOIN fv USING (user_id)
             |WHERE event_type = 'purchase' AND us > t0 GROUP BY 1, 2),
             |v AS (SELECT wk, count(*) AS users_viewing FROM fv GROUP BY 1)
             |SELECT wk, CAST(users_viewing AS BIGINT) AS users_viewing,
             |CAST(count(*) AS BIGINT) AS conversions,
             |round(CAST(count(*) AS DOUBLE) / users_viewing, 4) AS conv_rate,
             |round(quantile_cont(lat, 0.5) / 1e6, 1) AS median_s,
             |round(quantile_cont(lat, 0.9) / 1e6, 1) AS p90_s,
             |round(max(lat) / 1e6, 1) AS max_s
             |FROM conv JOIN v USING (wk) GROUP BY wk, users_viewing ORDER BY wk"""
        .stripMargin.replace("\n", " "))),

    QueryDef(
      "q196_trend_fit",
      // PER-SERIES OLS TREND — daily volume per event type regressed
      // on the day index over a ZERO-FILLED day spine (absent days are
      // real zeros, not gaps — without the fill a sparse series biases
      // its own slope). slope/intercept/R² come from the five moment
      // sums (n, Σx, Σy, Σxy, Σx², Σy²), which stay exact integers;
      // each published number is one fixed float expression over them,
      // identical on both engines. Degenerate variance → NULL.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("dd"))
          .groupBy("event_type", "dd").agg(count(lit(1)).as("c"))
        val span = daily.agg(min("dd").as("d0"), max("dd").as("d1"))
        val spine = daily.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"), col("d0"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("dd"))
        val f = spine.join(daily, Seq("event_type", "dd"), "left")
          .select(col("event_type"), datediff(col("dd"), col("d0")).cast("long").as("x"),
            coalesce(col("c"), lit(0L)).as("y"))
        val m = f.groupBy("event_type").agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
        val num = col("n") * col("sxy") - col("sx") * col("sy")
        val dx = col("n") * col("sxx") - col("sx") * col("sx")
        val dy = col("n") * col("syy") - col("sy") * col("sy")
        val slope = when(dx === 0, lit(null)).otherwise(num.cast("double") / dx)
        m.select(col("event_type"), col("n"),
            round(slope, 6).as("slope"),
            round((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept"),
            round(when(dx === 0 || dy === 0, lit(null))
              .otherwise((num * num).cast("double") / (dx * dy)), 6).as("r2"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS dd, count(*) AS c
             |FROM events GROUP BY 1, 2),
             |span AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM daily),
             |spine AS (SELECT DISTINCT event_type,
             |unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS dd, d0
             |FROM daily, span),
             |f AS (SELECT s.event_type, CAST(datediff('day', d0, s.dd) AS BIGINT) AS x,
             |CAST(coalesce(c, 0) AS BIGINT) AS y
             |FROM spine s LEFT JOIN daily USING (event_type, dd)),
             |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM f GROUP BY 1)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |ELSE CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END, 6) AS slope,
             |round((sy - (CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |ELSE CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END) * sx) / n, 4) AS intercept,
             |round(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
             |ELSE CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
             |/ ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
             |FROM m ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q197_fair_share",
      // MAX-MIN FAIR-SHARE (WATER-FILLING) — allocate a global token
      // budget B = ⌊9·total/10⌋ across sources: sources below the
      // waterline keep their full capacity, the rest split what's left
      // evenly (integer floor). The capped set is the ascending-
      // capacity prefix where pfx + cap·(n−i+1) ≤ B (monotone in i),
      // and the waterline is ⌊(B − pfx)/(n−i+1)⌋ at the FIRST uncapped
      // row. Every number is an exact integer.
      (s, dir) => {
        val caps = Tables.documents(s, dir)
          .select(col("source"), expr(s"CAST(size(${TextAnalytics.toksExpr}) AS BIGINT)").as("ntok"))
          .groupBy("source").agg(sum("ntok").as("cap"))
        val tot = caps.agg(count(lit(1)).as("n"),
          expr("(9 * sum(cap)) div 10").as("b"))
        val w = Window.orderBy(col("cap"), col("source"))
        val r = caps.crossJoin(broadcast(tot))
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("pfx", coalesce(
            sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("capped",
            when(col("pfx") + col("cap") * (col("n") - col("i") + 1) <= col("b"), 1)
              .otherwise(0))
        val line = r.filter(col("capped") === 0).orderBy("i").limit(1)
          .select(expr("(b - pfx) div (n - i + 1)").as("wl"))
        r.join(broadcast(line), lit(true), "left")
          .select(col("source"), col("cap"), col("capped"),
            when(col("capped") === 1, col("cap")).otherwise(col("wl")).as("alloc"),
            col("b").as("budget"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, ${TextAnalytics.toksDuck} AS w FROM documents),
              |caps AS (SELECT source, CAST(sum(len(w)) AS BIGINT) AS cap FROM t GROUP BY 1),
              |tot AS (SELECT count(*) AS n, CAST((9 * sum(cap)) // 10 AS BIGINT) AS b FROM caps),
              |r AS (SELECT source, cap, CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i,
              |coalesce(sum(cap) OVER (ORDER BY cap, source
              |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx FROM caps),
              |w2 AS (SELECT r.*, b, n,
              |CASE WHEN pfx + cap * (n - i + 1) <= b THEN 1 ELSE 0 END AS capped FROM r, tot),
              |line AS (SELECT CAST((b - pfx) // (n - i + 1) AS BIGINT) AS wl
              |FROM w2 WHERE capped = 0 ORDER BY i LIMIT 1)
              |SELECT source, cap, capped,
              |CAST(CASE WHEN capped = 1 THEN cap ELSE wl END AS BIGINT) AS alloc,
              |b AS budget FROM w2 LEFT JOIN line ON true ORDER BY source"""
        .stripMargin.replace("\n", " "))))
}
