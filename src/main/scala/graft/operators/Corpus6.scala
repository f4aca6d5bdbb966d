package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 closers, part 2 — lakehouse/ops surface the reference's
  * pandas store (scrappy.py:339-352 existing-wins merge) gestures at but
  * cannot express, plus two corpus-curation operators from the
  * training-data literature:
  *
  *  - q178 CDC changelog apply: the Delta/Iceberg MERGE shape — a base
  *    snapshot plus an ordered I/U/D changelog collapsed to the current
  *    table by keep-LAST-per-key (the dual of D1's keep-first), with
  *    upsert semantics (an UPDATE after a DELETE resurrects the key).
  *  - q179 zone-map pruning audit: per-shard min/max statistics under
  *    two physical layouts (range-partitioned by the predicate column
  *    vs hash-scattered), then the shard-skipping each layout yields
  *    for a fixed predicate set — the data-layout half of q125's
  *    z-order story, quantified as skip% and read amplification.
  *  - q180 margin-based mutual nearest neighbors: the bitext-mining /
  *    alignment primitive (Artetxe & Schwenk 2019's margin scoring,
  *    simplified to best-minus-second): a pair survives only if each
  *    side is the other's top-1 within the hyperplane-sketch bucket.
  *  - q181 seasonal anomaly: day-of-week baseline per day + robust
  *    modified z-score (q157's Iglewicz-Hoaglin discipline) over the
  *    residuals — the volume-monitoring alarm for an ingest pipeline.
  *  - q182 weak-supervision vote: three deterministic labeling
  *    functions (length gate, stopword-ratio gate, digit-density gate)
  *    with abstention, combined by signed majority vote — the
  *    Snorkel-style label-model shape reduced to its exact-integer
  *    core.
  *
  * Scale notes (also in SCALE.md):
  *  - q178: ONE hash-partitioned window keyed by the merge key; the
  *    changelog unions are map-side. This is exactly the MERGE INTO
  *    compaction plan a table format runs — at 100 TB the key space is
  *    bucketed and each bucket compacts independently; no global state.
  *  - q179: shard ids come from range-partition boundaries (a 15-double
  *    percentile broadcast — how Spark's RangePartitioner actually
  *    works) and from a hash — NO global-order window anywhere. Zone
  *    maps are one grouped agg (per-file metadata at real scale: footer
  *    stats); the audit joins a 32-row zone table against a 4-row
  *    literal predicate table — driver-scale.
  *  - q180: candidates are bounded by the sketch-bucket equi-join
  *    (q44's blocking discipline — never all-pairs); the per-vector
  *    top-2 window partitions by vec_id over bucket-bounded candidate
  *    lists, thousands of partitions, no corpus-wide sort. Plane count
  *    scales with log(corpus) to keep buckets bounded (SCALE.md).
  *  - q181: one corpus pass to per-day counts; everything downstream
  *    (baselines, median/MAD, flags) runs on |days| rows. At extreme
  *    scale exact percentile swaps for approx_percentile, same plan.
  *  - q182: embarrassingly parallel per-doc integer arithmetic — one
  *    projection, no shuffle at all until the final sort.
  *
  * Second tranche (q183-q186):
  *
  *  - q183 common-neighbor link prediction: Jaccard-of-neighborhoods
  *    over the q164 df-capped shingle-share graph for NON-adjacent
  *    pairs at distance 2 — the classic similarity-graph densification
  *    step (find near-dup families one hop before LSH connects them).
  *  - q184 higher-moment profile: per-event-type skewness and excess
  *    kurtosis from EXACT integer power sums (cents¹..cents⁴ —
  *    DECIMAL(38,0)/HUGEINT internally, never in the output schema per
  *    the q110/q149 rule), combined by one pinned double formula.
  *  - q185 binned two-sample Kolmogorov-Smirnov drift: first half of
  *    the date range vs second half, per event type; D = max gap of
  *    the binned ECDFs, flagged against the 95% critical value.
  *  - q186 Gini concentration of doc length per source — the corpus
  *    balance diagnostic (0 = uniform lengths, →1 = few giants hold
  *    all the mass), from the rank formula over integer sums.
  *
  * Scale notes: q183 adjacency is bounded by the df-cap (≤8 docs per
  * shingle ⇒ ≤7·|shingles| directed edges) and the wedge join is keyed
  * on the shared neighbor — at 100 TB the cap does for this exactly
  * what it does for q164's triangles. q184 is ONE grouped aggregate;
  * the moment algebra runs on |event_type| rows. q185 is a grouped
  * aggregate into (type, bin≤32) cells, then windows over ≤32-row
  * partitions. q186's rank window partitions by source — per-source
  * state only; none of the four has a global-order window.
  *
  * Third tranche (q187-q189) — the customer-analytics closers:
  *
  *  - q187 RFM segmentation: per-user recency/frequency/monetary
  *    quartile scores against BROADCAST percentile boundaries (the
  *    q179 range-boundary mechanism, reused deliberately — never a
  *    global ntile window over users), rolled into named segments.
  *  - q188 Holt double-exponential forecast: per-type level+trend
  *    smoothing over the daily-count series (α=0.5, β=0.3), 1-3 day
  *    forecasts and mean squared one-step error. The recurrence runs
  *    as a day-ordered fold per series (q114/q175's sorted-fold
  *    discipline) on ≤|days| rows; the DuckDB oracle executes the
  *    identical recurrence as a recursive CTE.
  *  - q189 marketing attribution: each purchase's revenue attributed
  *    to the last non-purchase touch before it AND to the user's
  *    first touch (both IGNORE-NULLS windows per user, q29's as-of
  *    discipline; no prior touch → 'direct'), reported per channel.
  *    The event-order tie-break is the q126 (ts, event_id) rule.
  */
object Corpus6 {

  /** Deterministic derived changelog over the documents table: base
    * snapshot is seq 0; seq 1 updates every 7th key, seq 2 deletes every
    * 13th, seq 3 inserts fresh keys for every 11th, seq 4 resurrects the
    * even multiples of 13 (UPDATE-after-DELETE ⇒ upsert re-creates). */
  private def cdcLog(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"))
    val base = d.select(col("doc_id").as("k"), col("source").as("attr"),
      lit(0L).as("seq"), lit("I").as("op"))
    val u1 = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("k"), concat(col("source"), lit("+u1")).as("attr"),
        lit(1L).as("seq"), lit("U").as("op"))
    val del = d.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id").as("k"), lit(null).cast("string").as("attr"),
        lit(2L).as("seq"), lit("D").as("op"))
    val ins = d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 100000L).as("k"), concat(lit("ins:"), col("source")).as("attr"),
        lit(3L).as("seq"), lit("I").as("op"))
    val u2 = d.filter(col("doc_id") % 26 === 0)
      .select(col("doc_id").as("k"), lit("resurrected").as("attr"),
        lit(4L).as("seq"), lit("U").as("op"))
    base.unionByName(u1).unionByName(del).unionByName(ins).unionByName(u2)
  }

  /** Shared CDC changelog as DuckDB SQL (same five arms). */
  private val cdcDuck =
    """SELECT doc_id AS k, source AS attr, 0 AS seq, 'I' AS op FROM documents
      |UNION ALL SELECT doc_id, source || '+u1', 1, 'U' FROM documents WHERE doc_id % 7 = 0
      |UNION ALL SELECT doc_id, NULL, 2, 'D' FROM documents WHERE doc_id % 13 = 0
      |UNION ALL SELECT doc_id + 100000, 'ins:' || source, 3, 'I' FROM documents WHERE doc_id % 11 = 0
      |UNION ALL SELECT doc_id, 'resurrected', 4, 'U' FROM documents WHERE doc_id % 26 = 0"""
      .stripMargin.replace("\n", " ")

  /** 15 interior sixteenth-quantile fractions (range-partition boundaries). */
  private val sixteenths: Seq[Double] = (1 to 15).map(_ / 16.0)

  /** Fixed predicate set for the zone-map audit: [lo, hi) ranges on n_chars. */
  private val preds = Seq((1, 0L, 800L), (2, 800L, 1600L), (3, 1600L, 3200L),
    (4, 3200L, 100000000L))

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q178_cdc_apply",
      // CDC CHANGELOG APPLY (MERGE INTO) — keep-LAST per key by the
      // changelog's total sequence order, then drop keys whose final
      // op is a DELETE. Upsert semantics: key 26k is deleted at seq 2
      // and updated at seq 4, so it re-appears ("resurrected"); key
      // 13k (odd multiples) stays gone. Everything is integer/string
      // arithmetic — the oracle is exact. The dual of q08's D1
      // keep-first: same hash-partitioned window, opposite order.
      (s, dir) => {
        val w = Window.partitionBy("k").orderBy(col("seq").desc)
        cdcLog(Tables.documents(s, dir))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("op") =!= "D")
          .select(col("k").as("doc_id"), col("attr"),
            col("seq").as("last_seq"), col("op").as("last_op"))
          .orderBy("doc_id")
      },
      Some(s"""WITH log_ AS ($cdcDuck),
              |r AS (SELECT k, attr, seq, op,
              |row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM log_)
              |SELECT k AS doc_id, attr, CAST(seq AS BIGINT) AS last_seq, op AS last_op
              |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    QueryDef(
      "q179_zonemap_pruning",
      // ZONE-MAP PRUNING AUDIT — the file-skipping arithmetic a
      // lakehouse scan planner runs against footer min/max stats,
      // under two layouts of the same rows: 'sorted' (range-partitioned
      // on n_chars via 15 percentile boundaries — the RangePartitioner
      // mechanism) and 'hash' (scattered). For each predicate range a
      // shard is scanned iff its [min,max] overlaps; the sorted layout
      // skips most shards, the hash layout almost none — that gap IS
      // the motivation for sort-ordered ingestion (and q125's
      // Z-ordering for multi-column predicates). read_amp = rows the
      // pruned scan still reads per truly-matching row.
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        val bnd = docs.agg(expr(
          s"percentile(n_chars, array(${sixteenths.map(f => f + "D").mkString(",")}))").as("bs"))
        val sharded = docs.crossJoin(broadcast(bnd))
          .withColumn("shard_sorted", expr(
            "aggregate(bs, 0, (a, b) -> a + CASE WHEN CAST(n_chars AS DOUBLE) > b THEN 1 ELSE 0 END)"))
          .withColumn("shard_hash", expr(
            "CAST(conv(substr(md5(concat('s#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 16"))
        val layouts = sharded.select(lit("sorted").as("layout"), col("shard_sorted").as("shard"), col("n_chars"))
          .unionByName(sharded.select(lit("hash").as("layout"), col("shard_hash").cast("int").as("shard"), col("n_chars")))
        val zones = layouts.groupBy("layout", "shard")
          .agg(min("n_chars").as("zmin"), max("n_chars").as("zmax"), count(lit(1)).as("cnt"))
        val pt = preds.map { case (p, lo, hi) => s"struct(${p}, ${lo}L, ${hi}L)" }
        val pred = s.range(1)
          .select(explode(expr(s"array(${pt.mkString(",")})")).as("p"))
          .select(col("p.col1").as("pid"), col("p.col2").as("lo"), col("p.col3").as("hi"))
        val audit = zones.crossJoin(broadcast(pred))
          .withColumn("scanned", when(!(col("zmax") < col("lo") || col("zmin") >= col("hi")), 1).otherwise(0))
        val matched = layouts.filter(col("layout") === "sorted")
          .crossJoin(broadcast(pred))
          .filter(col("n_chars") >= col("lo") && col("n_chars") < col("hi"))
          .groupBy("pid").agg(count(lit(1)).as("rows_matched"))
        audit.groupBy("layout", "pid", "lo", "hi")
          .agg(sum("scanned").cast("bigint").as("shards_scanned"),
            sum(when(col("scanned") === 1, col("cnt")).otherwise(0L)).as("rows_scanned"))
          .join(broadcast(matched), Seq("pid"), "left")
          .withColumn("rows_matched", coalesce(col("rows_matched"), lit(0L)))
          .withColumn("skip_pct", round(lit(1.0) - col("shards_scanned") / lit(16.0), 4))
          .withColumn("read_amp", round(col("rows_scanned").cast("double") /
            greatest(col("rows_matched"), lit(1L)), 2))
          .select("layout", "pid", "lo", "hi", "shards_scanned", "rows_scanned",
            "rows_matched", "skip_pct", "read_amp")
          .orderBy("layout", "pid")
      },
      Some({
        val hash16 = Corpus.hexFoldDuck(
          "substr(md5(concat('s#', CAST(doc_id AS VARCHAR))), 1, 15)", 15)
        s"""WITH bnd AS (SELECT quantile_cont(n_chars, [${sixteenths.mkString(",")}]) AS bs FROM documents),
           |sh AS (SELECT doc_id, n_chars,
           |CAST(list_sum(list_transform(bs, b -> CASE WHEN CAST(n_chars AS DOUBLE) > b THEN 1 ELSE 0 END)) AS INT) AS shard_sorted,
           |CAST($hash16 % 16 AS INT) AS shard_hash FROM documents, bnd),
           |layouts AS (SELECT 'sorted' AS layout, shard_sorted AS shard, n_chars FROM sh
           |UNION ALL SELECT 'hash', shard_hash, n_chars FROM sh),
           |zones AS (SELECT layout, shard, min(n_chars) AS zmin, max(n_chars) AS zmax,
           |count(*) AS cnt FROM layouts GROUP BY 1, 2),
           |pred AS (${preds.map { case (p, lo, hi) => s"SELECT $p AS pid, $lo AS lo, $hi AS hi" }.mkString(" UNION ALL ")}),
           |audit AS (SELECT layout, pid, lo, hi,
           |CASE WHEN NOT (zmax < lo OR zmin >= hi) THEN 1 ELSE 0 END AS scanned, cnt
           |FROM zones CROSS JOIN pred),
           |matched AS (SELECT pid, count(*) AS rows_matched FROM
           |(SELECT n_chars FROM layouts WHERE layout = 'sorted') l CROSS JOIN pred
           |WHERE n_chars >= lo AND n_chars < hi GROUP BY 1)
           |SELECT a.layout, a.pid, CAST(a.lo AS BIGINT) AS lo, CAST(a.hi AS BIGINT) AS hi,
           |CAST(sum(a.scanned) AS BIGINT) AS shards_scanned,
           |CAST(sum(CASE WHEN a.scanned = 1 THEN a.cnt ELSE 0 END) AS BIGINT) AS rows_scanned,
           |CAST(coalesce(max(m.rows_matched), 0) AS BIGINT) AS rows_matched,
           |round(1.0 - sum(a.scanned) / 16.0, 4) AS skip_pct,
           |round(CAST(sum(CASE WHEN a.scanned = 1 THEN a.cnt ELSE 0 END) AS DOUBLE) /
           |greatest(CAST(coalesce(max(m.rows_matched), 0) AS BIGINT), 1), 2) AS read_amp
           |FROM audit a LEFT JOIN matched m USING (pid)
           |GROUP BY a.layout, a.pid, a.lo, a.hi ORDER BY layout, pid"""
          .stripMargin.replace("\n", " ")
      })),

    QueryDef(
      "q180_mutual_knn",
      // MARGIN-BASED MUTUAL NEAREST NEIGHBORS (the bitext-mining /
      // alignment primitive; Artetxe & Schwenk 2019 simplified to
      // best-minus-second margin). A pair (a, b) survives iff each is
      // the other's top-1 cosine neighbor WITHIN its hyperplane-sketch
      // bucket — mutuality plus a margin score kills the hub vectors
      // that plain top-1 matching mis-pairs. Candidates come from the
      // q44/q53 sketch-bucket equi-join (never all-pairs); cosines are
      // rounded to 6dp BEFORE ranking so both engines rank identical
      // values; ties break by neighbor id.
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .withColumn("nrm", expr(
            "sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
          .withColumn("sk", Similarity.sketchCol(col("embedding")))
          .select("vec_id", "embedding", "nrm", "sk")
        val pairs = e.join(
          e.select(col("vec_id").as("bid"), col("embedding").as("be"),
            col("nrm").as("bn"), col("sk").as("bsk")),
          col("sk") === col("bsk") && col("vec_id") =!= col("bid"))
          .withColumn("cos", round(
            graft.functions.VectorExprs.vecDot(col("embedding"), col("be")) /
              (col("nrm") * col("bn")), 6))
          .select("vec_id", "bid", "cos")
        val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))
        val best = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
          .groupBy("vec_id").agg(
            max(when(col("rn") === 1, col("bid"))).as("nn"),
            max(when(col("rn") === 1, col("cos"))).as("cos1"),
            coalesce(max(when(col("rn") === 2, col("cos"))), lit(0.0)).as("cos2"))
          .withColumn("margin", round(col("cos1") - col("cos2"), 6))
        best.join(
          best.select(col("vec_id").as("yid"), col("nn").as("ynn"), col("margin").as("ym")),
          col("nn") === col("yid") && col("ynn") === col("vec_id") && col("vec_id") < col("yid"))
          .select(col("vec_id").as("a"), col("yid").as("b"), col("cos1").as("cos"),
            round(col("margin") + col("ym"), 6).as("margin2"))
          .orderBy("a")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, ${Similarity.duckNorm("embedding")} AS nrm,
              |${Similarity.sketchDuck} AS sk FROM embeddings),
              |p AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
              |round(${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
              |FROM e a JOIN e b ON a.sk = b.sk AND a.vec_id <> b.vec_id),
              |r AS (SELECT aid, bid, cos,
              |row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rn FROM p),
              |best AS (SELECT aid, max(CASE WHEN rn = 1 THEN bid END) AS nn,
              |max(CASE WHEN rn = 1 THEN cos END) AS cos1,
              |coalesce(max(CASE WHEN rn = 2 THEN cos END), 0) AS cos2
              |FROM r WHERE rn <= 2 GROUP BY aid),
              |bm AS (SELECT aid, nn, cos1, round(cos1 - cos2, 6) AS margin FROM best)
              |SELECT x.aid AS a, y.aid AS b, x.cos1 AS cos,
              |round(x.margin + y.margin, 6) AS margin2
              |FROM bm x JOIN bm y ON x.nn = y.aid AND y.nn = x.aid AND x.aid < y.aid
              |ORDER BY a""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q181_seasonal_anomaly",
      // SEASONAL VOLUME ANOMALY — per-day event counts vs a day-of-week
      // baseline (weekly seasonality is the dominant cycle in ingest
      // volume), residuals scored by the modified z-score 0.6745·|r−med|
      // /MAD (q157's Iglewicz-Hoaglin discipline — a real volume spike
      // must not poison its own threshold, which mean/stddev would
      // allow). Counts are exact integers; baseline is one division;
      // median/MAD interpolation agreement is proven at q132/q157.
      (s, dir) => {
        val daily = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
          .groupBy("d").agg(count(lit(1)).as("cnt"))
          .withColumn("dow", dayofweek(col("d")) - 1)
        val bl = daily.groupBy("dow").agg(sum("cnt").as("sc"), count(lit(1)).as("nd"))
          .withColumn("baseline", col("sc").cast("double") / col("nd"))
          .select("dow", "baseline")
        val r = daily.join(broadcast(bl), "dow")
          .withColumn("resid", col("cnt").cast("double") - col("baseline"))
        val med = r.agg(expr("percentile(resid, 0.5D)").as("med"))
        val dv = r.crossJoin(broadcast(med))
          .withColumn("dev", abs(col("resid") - col("med")))
        val mad = dv.agg(expr("percentile(dev, 0.5D)").as("mad"))
        dv.crossJoin(broadcast(mad))
          .withColumn("mz", when(col("mad") === 0, lit(null))
            .otherwise(lit(0.6745) * col("dev") / col("mad")))
          .select(col("d"), col("dow"), col("cnt"),
            round(col("baseline"), 2).as("baseline"),
            round(col("resid"), 2).as("resid"),
            round(col("mz"), 2).as("mz"),
            when(col("mz") > 3.5, 1).otherwise(0).as("anomaly"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt,
             |date_part('dow', CAST(ts AS DATE)) AS dow FROM events GROUP BY 1, 3),
             |bl AS (SELECT dow, CAST(sum(cnt) AS DOUBLE) / count(*) AS baseline
             |FROM daily GROUP BY 1),
             |r AS (SELECT d, daily.dow, cnt, baseline,
             |CAST(cnt AS DOUBLE) - baseline AS resid FROM daily JOIN bl USING (dow)),
             |med AS (SELECT quantile_cont(resid, 0.5) AS med FROM r),
             |dv AS (SELECT r.*, abs(resid - med) AS dev FROM r, med),
             |mad AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dv)
             |SELECT d, CAST(dow AS INT) AS dow, CAST(cnt AS BIGINT) AS cnt,
             |round(baseline, 2) AS baseline, round(resid, 2) AS resid,
             |round(CASE WHEN mad = 0 THEN NULL
             |ELSE 0.6745 * dev / mad END, 2) AS mz,
             |CASE WHEN (CASE WHEN mad = 0 THEN NULL ELSE 0.6745 * dev / mad END) > 3.5
             |THEN 1 ELSE 0 END AS anomaly
             |FROM dv, mad ORDER BY d""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q182_weak_label_vote",
      // WEAK-SUPERVISION LABEL VOTE — three deterministic labeling
      // functions with abstention (Snorkel's label-model input shape,
      // reduced to its exact-integer majority-vote core): a length
      // gate (+1 long / −1 tiny), a stopword-ratio gate (+1 fluent /
      // −1 no-stopword garble), and a one-sided digit-density veto.
      // label = sign(Σ votes); all arithmetic is integer or a single
      // ratio compare of identical integers — the oracle is exact.
      // At 100 TB this is a pure projection: no shuffle until the sort.
      (s, dir) => {
        val stops = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
        val stopArr = stops.map("'" + _ + "'").mkString(",")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"), col("text"))
          .withColumn("toks", expr(TextAnalytics.toksExpr))
          .withColumn("ntoks", size(col("toks")))
          .withColumn("nstop", expr(
            s"size(filter(toks, x -> array_contains(array($stopArr), x)))"))
          .withColumn("ndig", length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", "")))
          .withColumn("lf_len", when(col("n_chars") >= 300, 1)
            .when(col("n_chars") < 80, -1).otherwise(0))
          .withColumn("lf_stop", when(col("ntoks") === 0, 0)
            .when(col("nstop").cast("double") / col("ntoks") >= 0.15, 1)
            .when(col("nstop") === 0, -1).otherwise(0))
          .withColumn("lf_digit", when(length(col("text")) > 0 &&
            col("ndig").cast("double") / length(col("text")) > 0.1, -1).otherwise(0))
          .withColumn("score", col("lf_len") + col("lf_stop") + col("lf_digit"))
          .withColumn("label", when(col("score") > 0, 1)
            .when(col("score") < 0, -1).otherwise(0))
          .select("doc_id", "lf_len", "lf_stop", "lf_digit", "score", "label")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, n_chars, text,
              |${TextAnalytics.toksDuck} AS toks,
              |length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS ndig
              |FROM documents),
              |lf AS (SELECT doc_id,
              |CASE WHEN n_chars >= 300 THEN 1 WHEN n_chars < 80 THEN -1 ELSE 0 END AS lf_len,
              |CASE WHEN len(toks) = 0 THEN 0
              |WHEN CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS DOUBLE) / len(toks) >= 0.15 THEN 1
              |WHEN len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) = 0 THEN -1
              |ELSE 0 END AS lf_stop,
              |CASE WHEN length(text) > 0 AND CAST(ndig AS DOUBLE) / length(text) > 0.1
              |THEN -1 ELSE 0 END AS lf_digit FROM t)
              |SELECT doc_id, lf_len, lf_stop, lf_digit,
              |lf_len + lf_stop + lf_digit AS score,
              |CASE WHEN lf_len + lf_stop + lf_digit > 0 THEN 1
              |WHEN lf_len + lf_stop + lf_digit < 0 THEN -1 ELSE 0 END AS label
              |FROM lf ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q183_link_prediction",
      // COMMON-NEIGHBOR LINK PREDICTION — for every NON-adjacent doc
      // pair at distance 2 in a df-capped 4-gram-share graph,
      // jaccard = |N(a)∩N(b)| / |N(a)∪N(b)|; top-20 predicted links.
      // The near-dup-family densifier: pairs two docs one hop before
      // the LSH pair relation would. 4-grams (vs q164's 5-shingles)
      // keep the graph dense enough that distance-2 candidates exist
      // even at the smallest gate corpus; the df-cap bound is the same
      // (a gram shared by > 8 docs is dropped BEFORE any join, so no
      // hub explosion). Counts are exact integers, the score is one
      // division.
      (s, dir) => {
        val sh = Tables.documents(s, dir)
          .select(col("doc_id"), expr(TextAnalytics.toksExpr).as("w"))
          .select(col("doc_id"),
            explode(expr(s"array_distinct(${Corpus.ngramSpark(4)})")).as("sg"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy("sg")))
          .filter(col("df") <= 8).select("doc_id", "sg")
        val e0 = sh.as("a").join(sh.as("b"),
            col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v")).distinct()
        val adj = e0.select(col("u").as("a"), col("v").as("n"))
          .unionByName(e0.select(col("v").as("a"), col("u").as("n")))
        val deg = adj.groupBy("a").agg(count(lit(1)).as("dg"))
        val cn = adj.select(col("a").as("x"), col("n"))
          .join(adj.select(col("a").as("y"), col("n")), Seq("n"))
          .filter(col("x") < col("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("cn"))
        val nonEdge = cn.join(e0,
          cn("x") === e0("u") && cn("y") === e0("v"), "left_anti")
        nonEdge
          .join(deg.select(col("a").as("x"), col("dg").as("degx")), "x")
          .join(deg.select(col("a").as("y"), col("dg").as("degy")), "y")
          .withColumn("jaccard", round(col("cn").cast("double") /
            (col("degx") + col("degy") - col("cn")), 6))
          .select(col("x").as("a"), col("y").as("b"), col("cn"),
            col("degx"), col("degy"), col("jaccard"))
          .orderBy(col("jaccard").desc, col("a"), col("b")).limit(20)
      },
      Some(s"""WITH t AS (SELECT doc_id, ${TextAnalytics.toksDuck} AS w FROM documents),
              |sh0 AS (SELECT doc_id, unnest(list_distinct(${Corpus.ngramDuck(4)})) AS sg FROM t),
              |sh AS (SELECT doc_id, sg FROM
              |(SELECT doc_id, sg, count(*) OVER (PARTITION BY sg) AS df FROM sh0) z
              |WHERE df <= 8),
              |e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
              |FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id),
              |adj AS (SELECT u AS a, v AS n FROM e0 UNION ALL SELECT v, u FROM e0),
              |deg AS (SELECT a, count(*) AS dg FROM adj GROUP BY a),
              |cn AS (SELECT x.a AS x, y.a AS y, count(*) AS cn
              |FROM adj x JOIN adj y ON x.n = y.n AND x.a < y.a GROUP BY 1, 2),
              |ne AS (SELECT * FROM cn WHERE NOT EXISTS
              |(SELECT 1 FROM e0 WHERE e0.u = cn.x AND e0.v = cn.y))
              |SELECT ne.x AS a, ne.y AS b, CAST(ne.cn AS BIGINT) AS cn,
              |CAST(dx.dg AS BIGINT) AS degx, CAST(dy.dg AS BIGINT) AS degy,
              |round(CAST(ne.cn AS DOUBLE) / (dx.dg + dy.dg - ne.cn), 6) AS jaccard
              |FROM ne JOIN deg dx ON ne.x = dx.a JOIN deg dy ON ne.y = dy.a
              |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q184_moments_profile",
      // HIGHER-MOMENT PROFILE — per-event-type skewness and excess
      // kurtosis. Power sums Σc..Σc⁴ over exact integer cents are
      // order-free (c⁴ tops 9.8e18, past BIGINT — DECIMAL(38,0) on the
      // Spark side, HUGEINT in DuckDB, both strictly INTERNAL per the
      // q110/q149 no-wide-decimal-output rule); each statistic is then
      // ONE pinned double formula over the five aggregate values, so
      // the engines execute identical IEEE operation trees. The
      // raw-moment identities (m₂ = s₂/n − μ², etc.) are what make a
      // single distributed pass sufficient — no second centered pass.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("c").as("s1i"),
          sum(expr("c * c")).as("s2i"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c * c")).as("s3i"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c * c * c")).as("s4i"))
          .withColumn("nn", col("n").cast("double"))
          .withColumn("s1", col("s1i").cast("double"))
          .withColumn("s2", col("s2i").cast("double"))
          .withColumn("s3", col("s3i").cast("double"))
          .withColumn("s4", col("s4i").cast("double"))
          .withColumn("mean", expr("s1 / nn"))
          .withColumn("m2", expr("s2 / nn - mean * mean"))
          .withColumn("m3", expr(
            "s3 / nn - 3 * mean * (s2 / nn) + 2 * mean * mean * mean"))
          .withColumn("m4", expr(
            "s4 / nn - 4 * mean * (s3 / nn) + 6 * mean * mean * (s2 / nn) - 3 * mean * mean * mean * mean"))
          .select(col("event_type"), col("n"),
            round(expr("mean / 100"), 4).as("mean_val"),
            round(expr("sqrt(m2) / 100"), 4).as("sd_val"),
            round(expr("CASE WHEN m2 <= 0 THEN NULL ELSE m3 / pow(m2, 1.5) END"), 4).as("skewness"),
            round(expr("CASE WHEN m2 <= 0 THEN NULL ELSE m4 / (m2 * m2) - 3 END"), 4).as("ex_kurtosis"))
          .orderBy("event_type")
      },
      Some("""WITH a AS (SELECT event_type, count(*) AS n,
             |CAST(sum(c) AS DOUBLE) AS s1, CAST(sum(c * c) AS DOUBLE) AS s2,
             |CAST(sum(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS s3,
             |CAST(sum(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS s4,
             |CAST(count(*) AS DOUBLE) AS nn
             |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |FROM events) e GROUP BY 1),
             |m AS (SELECT event_type, n, s1 / nn AS mean,
             |s2 / nn - (s1 / nn) * (s1 / nn) AS m2,
             |s3 / nn - 3 * (s1 / nn) * (s2 / nn) + 2 * (s1 / nn) * (s1 / nn) * (s1 / nn) AS m3,
             |s4 / nn - 4 * (s1 / nn) * (s3 / nn) + 6 * (s1 / nn) * (s1 / nn) * (s2 / nn) - 3 * (s1 / nn) * (s1 / nn) * (s1 / nn) * (s1 / nn) AS m4
             |FROM a)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |round(mean / 100, 4) AS mean_val,
             |round(sqrt(m2) / 100, 4) AS sd_val,
             |round(CASE WHEN m2 <= 0 THEN NULL ELSE m3 / pow(m2, 1.5) END, 4) AS skewness,
             |round(CASE WHEN m2 <= 0 THEN NULL ELSE m4 / (m2 * m2) - 3 END, 4) AS ex_kurtosis
             |FROM m ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q185_ks_drift",
      // BINNED TWO-SAMPLE KOLMOGOROV-SMIRNOV DRIFT — first half of the
      // corpus's date range vs second half, per event type. Values are
      // bucketed into 32 equi-width bins over the type's own [min,max]
      // (at real scale the bin table IS the drift monitor's state —
      // never the raw values); D = max |ECDF_a − ECDF_b| evaluated at
      // bin edges, which for binned data is exact. Flagged against the
      // 95% critical value 1.358·√((n_a+n_b)/(n_a·n_b)). Counts are
      // exact integers; ECDF gaps are single divisions.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          to_date(col("ts")).as("d"), col("value"))
        val span = ev.agg(min("d").as("dmin"), max("d").as("dmax"))
        val tagged = ev.crossJoin(broadcast(span))
          .withColumn("sample", when(
            datediff(col("d"), col("dmin")) * 2 <= datediff(col("dmax"), col("dmin")),
            lit("a")).otherwise(lit("b")))
        val rng = tagged.groupBy("event_type")
          .agg(min("value").as("vmin"), max("value").as("vmax"))
        val binned = tagged.join(broadcast(rng), "event_type")
          .withColumn("bin", when(col("vmax") === col("vmin"), lit(0))
            .otherwise(least(lit(31), floor(
              (col("value") - col("vmin")) / ((col("vmax") - col("vmin")) / 32.0)).cast("int"))))
          .groupBy("event_type", "bin").agg(
            count(when(col("sample") === "a", 1)).as("ca"),
            count(when(col("sample") === "b", 1)).as("cb"))
        val tot = binned.groupBy("event_type")
          .agg(sum("ca").as("na"), sum("cb").as("nb"))
        val w = Window.partitionBy("event_type").orderBy("bin")
        binned
          .withColumn("cuma", sum("ca").over(w))
          .withColumn("cumb", sum("cb").over(w))
          .join(broadcast(tot), "event_type")
          .filter(col("na") > 0 && col("nb") > 0)
          .withColumn("gap", abs(
            col("cuma").cast("double") / col("na") - col("cumb").cast("double") / col("nb")))
          .groupBy("event_type").agg(
            max("na").as("n_a"), max("nb").as("n_b"),
            round(max("gap"), 6).as("ks_d"))
          .withColumn("crit", round(lit(1.358) * sqrt(
            (col("n_a") + col("n_b")).cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double"))), 6))
          .withColumn("drift", when(col("ks_d") > col("crit"), 1).otherwise(0))
          .select("event_type", "n_a", "n_b", "ks_d", "crit", "drift")
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events),
             |span AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ev),
             |tagged AS (SELECT event_type, value,
             |CASE WHEN datediff('day', dmin, d) * 2 <= datediff('day', dmin, dmax)
             |THEN 'a' ELSE 'b' END AS sample FROM ev, span),
             |rng AS (SELECT event_type, min(value) AS vmin, max(value) AS vmax
             |FROM tagged GROUP BY 1),
             |binned AS (SELECT t.event_type,
             |CASE WHEN vmax = vmin THEN 0
             |ELSE least(31, CAST(floor((value - vmin) / ((vmax - vmin) / 32.0)) AS INT)) END AS bin,
             |count(CASE WHEN sample = 'a' THEN 1 END) AS ca,
             |count(CASE WHEN sample = 'b' THEN 1 END) AS cb
             |FROM tagged t JOIN rng USING (event_type) GROUP BY 1, 2),
             |tot AS (SELECT event_type, sum(ca) AS na, sum(cb) AS nb
             |FROM binned GROUP BY 1),
             |cum AS (SELECT b.event_type, na, nb,
             |sum(ca) OVER (PARTITION BY b.event_type ORDER BY bin) AS cuma,
             |sum(cb) OVER (PARTITION BY b.event_type ORDER BY bin) AS cumb
             |FROM binned b JOIN tot USING (event_type) WHERE na > 0 AND nb > 0),
             |agg_ AS (SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
             |CAST(max(nb) AS BIGINT) AS n_b,
             |round(max(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_d
             |FROM cum GROUP BY 1)
             |SELECT event_type, n_a, n_b, ks_d,
             |round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) /
             |(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS crit,
             |CASE WHEN ks_d > round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) /
             |(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) THEN 1 ELSE 0 END AS drift
             |FROM agg_ ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q186_gini_concentration",
      // GINI CONCENTRATION of doc length per source — the corpus
      // balance diagnostic (0 = all docs equal, →1 = a few giants hold
      // the mass), via the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n
      // over ascending-sorted lengths. Both Σ terms are exact integer
      // sums (rank·n_chars fits BIGINT with room); the score is one
      // pinned double expression. The rank window partitions by source
      // — per-source state only, never a global sort.
      (s, dir) => {
        val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        Tables.documents(s, dir).select(col("source"), col("n_chars"), col("doc_id"))
          .withColumn("i", row_number().over(w))
          .groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            sum(expr("i * n_chars")).as("iw"))
          .withColumn("gini", round(expr(
            """2.0D * CAST(iw AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(total_chars AS DOUBLE))
              | - (CAST(n_docs AS DOUBLE) + 1.0D) / CAST(n_docs AS DOUBLE)"""
              .stripMargin.replace("\n", " ")), 6))
          .select("source", "n_docs", "total_chars", "gini")
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, n_chars,
             |row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
             |FROM documents),
             |a AS (SELECT source, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |CAST(sum(i * n_chars) AS BIGINT) AS iw FROM r GROUP BY 1)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, total_chars,
             |round(2.0 * CAST(iw AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(total_chars AS DOUBLE))
             | - (CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE), 6) AS gini
             |FROM a ORDER BY source""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q187_rfm_segments",
      // RFM SEGMENTATION — recency (days since last event), frequency
      // (event count), monetary (purchase cents) per user, each scored
      // 1-4 against the population's broadcast quartile boundaries
      // (count-of-boundaries-below — the q179 range-boundary fold, NOT
      // a global ntile window over users), then named segments from
      // the score combination. R/F/M are exact integers; boundaries
      // are interpolated percentiles (cross-engine agreement proven at
      // q132); segment means are single divisions of integer sums.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          to_date(col("ts")).as("d"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val mx = ev.agg(max("d").as("dmax"))
        val peru = ev.crossJoin(broadcast(mx)).groupBy("user_id").agg(
          min(datediff(col("dmax"), col("d"))).as("r"),
          count(lit(1)).as("f"),
          sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("m"))
        val b = peru.agg(
          expr("percentile(r, array(0.25D, 0.5D, 0.75D))").as("rb"),
          expr("percentile(f, array(0.25D, 0.5D, 0.75D))").as("fb"),
          expr("percentile(m, array(0.25D, 0.5D, 0.75D))").as("mb"))
        def score(v: String, bs: String) =
          s"1 + aggregate($bs, 0, (a, x) -> a + CASE WHEN CAST($v AS DOUBLE) > x THEN 1 ELSE 0 END)"
        peru.crossJoin(broadcast(b))
          .withColumn("rq", expr(score("r", "rb")))
          .withColumn("fq", expr(score("f", "fb")))
          .withColumn("mq", expr(score("m", "mb")))
          .withColumn("segment", expr(
            """CASE WHEN rq <= 2 AND fq >= 3 AND mq >= 3 THEN 'champion'
              |WHEN rq >= 3 AND fq <= 2 THEN 'at_risk'
              |WHEN rq <= 2 AND fq <= 2 THEN 'casual'
              |ELSE 'regular' END""".stripMargin.replace("\n", " ")))
          .groupBy("segment").agg(
            count(lit(1)).as("n_users"),
            round(expr("CAST(sum(r) AS DOUBLE) / count(1)"), 2).as("avg_recency"),
            round(expr("CAST(sum(f) AS DOUBLE) / count(1)"), 2).as("avg_freq"),
            round(expr("CAST(sum(m) AS DOUBLE) / count(1) / 100"), 2).as("avg_monetary"))
          .orderBy("segment")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
             |CAST(round(value * 100) AS BIGINT) AS c FROM events),
             |mx AS (SELECT max(d) AS dmax FROM ev),
             |peru AS (SELECT user_id, min(datediff('day', d, dmax)) AS r,
             |count(*) AS f,
             |CAST(sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS m
             |FROM ev, mx GROUP BY 1),
             |b AS (SELECT quantile_cont(r, [0.25, 0.5, 0.75]) AS rb,
             |quantile_cont(f, [0.25, 0.5, 0.75]) AS fb,
             |quantile_cont(m, [0.25, 0.5, 0.75]) AS mb FROM peru),
             |sc AS (SELECT user_id, r, f, m,
             |1 + CAST(list_sum(list_transform(rb, x -> CASE WHEN CAST(r AS DOUBLE) > x THEN 1 ELSE 0 END)) AS INT) AS rq,
             |1 + CAST(list_sum(list_transform(fb, x -> CASE WHEN CAST(f AS DOUBLE) > x THEN 1 ELSE 0 END)) AS INT) AS fq,
             |1 + CAST(list_sum(list_transform(mb, x -> CASE WHEN CAST(m AS DOUBLE) > x THEN 1 ELSE 0 END)) AS INT) AS mq
             |FROM peru, b),
             |seg AS (SELECT *,
             |CASE WHEN rq <= 2 AND fq >= 3 AND mq >= 3 THEN 'champion'
             |WHEN rq >= 3 AND fq <= 2 THEN 'at_risk'
             |WHEN rq <= 2 AND fq <= 2 THEN 'casual'
             |ELSE 'regular' END AS segment FROM sc)
             |SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
             |round(CAST(sum(r) AS DOUBLE) / count(*), 2) AS avg_recency,
             |round(CAST(sum(f) AS DOUBLE) / count(*), 2) AS avg_freq,
             |round(CAST(sum(m) AS DOUBLE) / count(*) / 100, 2) AS avg_monetary
             |FROM seg GROUP BY 1 ORDER BY segment""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q188_holt_forecast",
      // HOLT DOUBLE-EXPONENTIAL FORECAST — per event type over the
      // daily-count series: l₁=y₁, b₁=0, then
      //   lₜ = α·yₜ + (1−α)·(l+b),  bₜ = β·(lₜ−l) + (1−β)·b,
      // α=0.5, β=0.3, with the one-step squared error accumulated
      // BEFORE each update (pred = l+b). Forecasts l+h·b for h=1..3.
      // The Spark side is a day-ordered sequential fold (q114/q175
      // discipline — identical IEEE op order everywhere); the oracle
      // executes the IDENTICAL recurrence as a recursive CTE, one row
      // per (type, step). Squares are written as products, not pow().
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("d"))
          .groupBy("event_type", "d").agg(count(lit(1)).cast("double").as("y"))
        val fold = """aggregate(array_sort(collect_list(struct(d, y))),
          |named_struct('l', 0D, 'b', 0D, 'sse', 0D, 'k', 0),
          |(acc, x) -> CASE WHEN acc.k = 0
          |THEN named_struct('l', x.y, 'b', 0D, 'sse', 0D, 'k', 1)
          |ELSE named_struct(
          |'l', 0.5D * x.y + 0.5D * (acc.l + acc.b),
          |'b', 0.3D * ((0.5D * x.y + 0.5D * (acc.l + acc.b)) - acc.l) + 0.7D * acc.b,
          |'sse', acc.sse + (x.y - (acc.l + acc.b)) * (x.y - (acc.l + acc.b)),
          |'k', acc.k + 1) END)""".stripMargin.replace("\n", " ")
        daily.groupBy("event_type").agg(expr(fold).as("st"))
          .selectExpr("event_type", "CAST(st.k AS BIGINT) AS n_days",
            "round(st.l, 4) AS level", "round(st.b, 4) AS trend",
            "round(st.l + st.b, 4) AS f1",
            "round(st.l + 2 * st.b, 4) AS f2",
            "round(st.l + 3 * st.b, 4) AS f3",
            "round(st.sse / (st.k - 1), 4) AS msse")
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             |CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2),
             |idx AS (SELECT event_type, y,
             |row_number() OVER (PARTITION BY event_type ORDER BY d) AS i FROM daily),
             |n AS (SELECT event_type, max(i) AS nmax FROM idx GROUP BY 1),
             |rec AS (
             |SELECT event_type, 1 AS k, y AS l, CAST(0 AS DOUBLE) AS b,
             |CAST(0 AS DOUBLE) AS sse FROM idx WHERE i = 1
             |UNION ALL
             |SELECT r.event_type, r.k + 1,
             |0.5 * x.y + 0.5 * (r.l + r.b),
             |0.3 * ((0.5 * x.y + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b,
             |r.sse + (x.y - (r.l + r.b)) * (x.y - (r.l + r.b))
             |FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.k + 1),
             |fin AS (SELECT rec.* FROM rec JOIN n USING (event_type) WHERE k = nmax)
             |SELECT event_type, CAST(k AS BIGINT) AS n_days,
             |round(l, 4) AS level, round(b, 4) AS trend,
             |round(l + b, 4) AS f1, round(l + 2 * b, 4) AS f2, round(l + 3 * b, 4) AS f3,
             |round(sse / (k - 1), 4) AS msse
             |FROM fin ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q189_attribution",
      // MARKETING ATTRIBUTION — each purchase's revenue credited to
      // (a) the LAST non-purchase touch before it and (b) the user's
      // FIRST non-purchase touch before it, both via IGNORE-NULLS
      // windows per user ordered by the q126 (ts, event_id) rule;
      // purchases with no prior touch land in 'direct'. Revenue stays
      // in exact integer cents until the final /100. The windows are
      // user-keyed — per-user state only, the as-of discipline of q29.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("ts"),
          col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val wPrev = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type") =!= "purchase", col("event_type"))
        val pur = ev
          .withColumn("last_ch", last(touch, ignoreNulls = true).over(wPrev))
          .withColumn("first_ch", first(touch, ignoreNulls = true).over(wPrev))
          .filter(col("event_type") === "purchase")
          .select(coalesce(col("last_ch"), lit("direct")).as("last_ch"),
            coalesce(col("first_ch"), lit("direct")).as("first_ch"), col("c"))
        val lastAgg = pur.groupBy(col("last_ch").as("channel"))
          .agg(count(lit(1)).as("n_last"), sum("c").as("lc"))
        val firstAgg = pur.groupBy(col("first_ch").as("channel"))
          .agg(count(lit(1)).as("n_first"), sum("c").as("fc"))
        lastAgg.join(firstAgg, Seq("channel"), "full_outer")
          .select(col("channel"),
            coalesce(col("n_last"), lit(0L)).as("n_last"),
            round(coalesce(col("lc"), lit(0L)) / lit(100.0), 2).as("last_touch_rev"),
            coalesce(col("n_first"), lit(0L)).as("n_first"),
            round(coalesce(col("fc"), lit(0L)) / lit(100.0), 2).as("first_touch_rev"))
          .orderBy("channel")
      },
      Some("""WITH ev AS (SELECT user_id, ts, event_id, event_type,
             |CAST(round(value * 100) AS BIGINT) AS c FROM events),
             |t AS (SELECT *,
             |last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             |OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
             |first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             |OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch
             |FROM ev),
             |pur AS (SELECT coalesce(last_ch, 'direct') AS last_ch,
             |coalesce(first_ch, 'direct') AS first_ch, c FROM t
             |WHERE event_type = 'purchase'),
             |la AS (SELECT last_ch AS channel, count(*) AS n_last,
             |CAST(sum(c) AS BIGINT) AS lc FROM pur GROUP BY 1),
             |fa AS (SELECT first_ch AS channel, count(*) AS n_first,
             |CAST(sum(c) AS BIGINT) AS fc FROM pur GROUP BY 1)
             |SELECT channel,
             |CAST(coalesce(n_last, 0) AS BIGINT) AS n_last,
             |round(coalesce(lc, 0) / 100.0, 2) AS last_touch_rev,
             |CAST(coalesce(n_first, 0) AS BIGINT) AS n_first,
             |round(coalesce(fc, 0) / 100.0, 2) AS first_touch_rev
             |FROM la FULL OUTER JOIN fa USING (channel)
             |ORDER BY channel""".stripMargin.replace("\n", " ")))
  )
}
