package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 closers, part 2 — the mixture/diagnostics tail of the training
  * recipe: temperature-scaled language mixing (the multilingual-sampling
  * p^α rule every multi-source pretraining recipe applies), count-min
  * sketch heavy hitters (the constant-memory mergeable frequency summary,
  * measured at two widths so the collision/width tradeoff is a readout,
  * not an assumption), and the vocab coverage curve (the tokenizer-sizing
  * diagnostic).
  *
  * Scale notes (also in SCALE.md):
  *  - q144's quota table is |langs| rows (broadcast); the per-lang rank
  *    is a lang-partitioned window — the one shuffle. Quota arithmetic
  *    is integer-exact (floor(sqrt·1e6) weights) so Spark and DuckDB
  *    agree bit-for-bit with no float summation-order hazard.
  *  - q145's sketches are 4×16 + 4×1024 cells REGARDLESS of corpus
  *    size — the entire point of count-min: partial aggregation does
  *    the heavy lifting map-side, the reduce moves ≤4160 rows, and
  *    estimates are a broadcast join of candidates into the tiny
  *    sketch. Cells are a sum-monoid ⇒ sketches of corpus shards
  *    union-then-regroup to the exact whole-corpus sketch —
  *    mergeability is what makes it a distributed/streaming summary.
  *  - q146 takes top-500 terms via TakeOrderedAndProject BEFORE any
  *    global window — the cumulative sum runs over ≤500 rows.
  */
object Corpus3 {

  private val toksExpr = TextAnalytics.toksExpr
  private val toksDuck = TextAnalytics.toksDuck

  /** 60-bit content hash of a doc (q136's checksum rule): identical
    * conv()/hex-fold text on both sides. */
  private val hSpark = "CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"
  private def hDuck = Corpus.hexFoldDuck("substr(md5(text), 1, 15)", 15)

  /** Count-min row hash j of a term: fold of md5("j#term") mod width.
    * Shared by both sketch widths. */
  private[graft] def cmBucketSpark(j: Int, width: Int): String =
    s"CAST(conv(substr(md5(concat('$j', '#', term)), 1, 15), 16, 10) AS BIGINT) % $width"
  private def cmBucketDuck(j: Int, width: Int): String =
    s"${Corpus.hexFoldDuck(s"substr(md5(concat('$j', '#', term)), 1, 15)", 15)} % $width"

  private[graft] val CM_DEPTH = 4
  /** Narrow = deliberately under-sized for this corpus (31-term vocab in
    * 16 buckets ⇒ collisions are MEASURED in the output); wide = the
    * sized-right regime (est = exact). */
  private[graft] val CM_NARROW = 16
  private[graft] val CM_WIDE = 1024

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q144_temperature_mixture",
      // TEMPERATURE-SCALED LANGUAGE MIXTURE (α = 0.5) — the standard
      // multilingual sampling rule (pᵢ^α renormalized; XLM-R-style):
      // raw language shares are flattened so high-resource languages
      // stop drowning low-resource ones — and on this corpus the
      // effect is VISIBLE in the oracled output (en 43.6% raw → ~33%
      // tempered at sf0.01). Weights are floor(sqrt(n_docs)·1e6) as
      // BIGINT — sqrt is IEEE-correctly-rounded in both engines and
      // the floor makes every downstream quotient integer arithmetic,
      // so there is NO float summation-order hazard anywhere. The
      // target is half the corpus; per-lang quota = nsel·wᵢ div Σw;
      // the docs themselves are chosen by content-hash rank within
      // lang (deterministic under repartitioning / re-ingestion, like
      // q104/q112) — computed since r5 by the TWO-PASS BUCKET-BOUNDARY
      // selection instead of a per-lang rank window over the corpus:
      // the md5 sort key is bucketed by its first 2 hex chars (prefix
      // buckets are contiguous under the string ordering), per-(lang,
      // bucket) counts + a cumulative window over that TINY table
      // locate each lang's boundary bucket, whole buckets below it are
      // taken wholesale, and ONLY the boundary bucket's rows (≈1/256
      // of a lang) are ranked within the bucket — identical selection,
      // no corpus-sized sort in |langs| partitions (the q50/q153/q132
      // fix family; bucket width scales with the corpus). Output per
      // lang: raw share vs temperature share (the flattening,
      // visible), quota, and the selected subset's token sum +
      // q136-style XOR checksum so the CONTENT of the selection is
      // oracle-pinned, not just its size.
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(expr(toksExpr)).cast("long").as("n_toks"),
            expr(hSpark).as("h"))
        val w = t.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("wt", floor(sqrt(col("n_docs")) * 1e6).cast("long"))
        val g = w.agg(sum("wt").as("tot"),
          (sum("n_docs") / lit(2)).cast("long").as("nsel"),
          sum("n_docs").as("n_total"))
        val q = w.crossJoin(broadcast(g))
          .withColumn("quota", expr("CAST(nsel * wt DIV tot AS BIGINT)"))
        val keyed = t.withColumn("sk", md5(col("doc_id").cast("string")))
          .withColumn("bkt", expr("substring(sk, 1, 2)"))
        val bc = keyed.groupBy("lang", "bkt").agg(count(lit(1)).as("bc"))
        val wb = Window.partitionBy("lang").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bstat = bc.withColumn("cumb", coalesce(sum("bc").over(wb), lit(0L)))
          .join(broadcast(q.select(col("lang"), col("quota"))), "lang")
          .select(col("lang").as("blang"), col("bkt").as("bbkt"), col("cumb"),
            col("quota").as("bquota"),
            (col("cumb") + col("bc") <= col("quota")).as("isfull"),
            (col("cumb") < col("quota") && col("cumb") + col("bc") > col("quota"))
              .as("isboundary"))
        val joined = keyed.join(broadcast(bstat),
          col("lang") === col("blang") && col("bkt") === col("bbkt"))
        val fullSel = joined.filter(col("isfull")).select("lang", "n_toks", "h")
        val wIn = Window.partitionBy("lang", "bkt").orderBy(col("sk"), col("doc_id"))
        val boundarySel = joined.filter(col("isboundary"))
          .withColumn("irk", row_number().over(wIn))
          .filter(col("irk") <= col("bquota") - col("cumb"))
          .select("lang", "n_toks", "h")
        val sel = fullSel.unionByName(boundarySel)
          .groupBy("lang")
          .agg(count(lit(1)).as("sel_docs"), sum("n_toks").as("sel_toks"),
            expr("bit_xor(h)").as("checksum"))
        q.join(broadcast(sel), Seq("lang"), "left")
          .select(col("lang"), col("n_docs"),
            round(col("n_docs").cast("double") / col("n_total"), 6).as("raw_frac"),
            round(col("wt").cast("double") / col("tot"), 6).as("temp_frac"),
            col("quota"), coalesce(col("sel_docs"), lit(0L)).as("sel_docs"),
            coalesce(col("sel_toks"), lit(0L)).as("sel_toks"),
            coalesce(col("checksum"), lit(0L)).as("checksum"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, CAST(len($toksDuck) AS BIGINT) AS n_toks,
              |$hDuck AS h FROM documents),
              |w AS (SELECT lang, count(*) AS n_docs,
              |CAST(floor(sqrt(count(*)) * 1e6) AS BIGINT) AS wt FROM t GROUP BY 1),
              |g AS (SELECT CAST(sum(wt) AS BIGINT) AS tot,
              |CAST(sum(n_docs) // 2 AS BIGINT) AS nsel,
              |CAST(sum(n_docs) AS BIGINT) AS n_total FROM w),
              |q AS (SELECT lang, n_docs, wt, tot, nsel, n_total,
              |CAST(nsel * wt // tot AS BIGINT) AS quota FROM w, g),
              |rk AS (SELECT doc_id, lang, n_toks, h, row_number() OVER
              |(PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM t),
              |sel AS (SELECT rk.lang, count(*) AS sel_docs,
              |CAST(sum(n_toks) AS BIGINT) AS sel_toks, bit_xor(h) AS checksum
              |FROM rk JOIN q ON rk.lang = q.lang AND rk.rk <= q.quota GROUP BY 1)
              |SELECT q.lang, q.n_docs,
              |round(q.n_docs * 1.0 / q.n_total, 6) AS raw_frac,
              |round(q.wt * 1.0 / q.tot, 6) AS temp_frac, q.quota,
              |COALESCE(sel.sel_docs, 0) AS sel_docs,
              |COALESCE(sel.sel_toks, 0) AS sel_toks,
              |COALESCE(sel.checksum, 0) AS checksum
              |FROM q LEFT JOIN sel ON q.lang = sel.lang
              |ORDER BY q.lang""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q145_countmin_heavy_hitters",
      // COUNT-MIN SKETCH HEAVY HITTERS — the constant-memory frequency
      // summary: d=4 hash rows × w buckets of token counts, estimate =
      // min over rows of the term's bucket count; est ≥ exact always
      // (collisions only ADD). Built at TWO widths so the ε = e/w
      // error/width tradeoff is a measured readout: w=16 is
      // deliberately under-sized for this corpus (31-term vocab ⇒
      // collisions guaranteed, over_narrow > 0 rows appear) and
      // w=1024 is the sized-right regime (over_wide = 0 here). The
      // top-20 exact terms carry both estimates side by side.
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(expr(toksExpr)).as("term"))
        def cells(width: Int) = tok.select(posexplode(array(
            (0 until CM_DEPTH).map(j => expr(cmBucketSpark(j, width))): _*))
            .as(Seq("row_j", "bucket")))
          .groupBy("row_j", "bucket").agg(count(lit(1)).as("cnt"))
        def est(width: Int, alias: String) = {
          val cand = tok.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
            .orderBy(col("exact_cnt").desc, col("term")).limit(20)
            .select(col("term"), col("exact_cnt"),
              posexplode(array((0 until CM_DEPTH).map(j =>
                expr(cmBucketSpark(j, width))): _*)).as(Seq("row_j", "bucket")))
          cand.join(broadcast(cells(width)), Seq("row_j", "bucket"))
            .groupBy("term", "exact_cnt").agg(min("cnt").as(alias))
        }
        est(CM_NARROW, "est_narrow")
          .join(est(CM_WIDE, "est_wide"), Seq("term", "exact_cnt"))
          .select(col("term"), col("exact_cnt"),
            col("est_narrow"), (col("est_narrow") - col("exact_cnt")).as("over_narrow"),
            col("est_wide"), (col("est_wide") - col("exact_cnt")).as("over_wide"))
          .orderBy(col("exact_cnt").desc, col("term"))
      },
      Some {
        def side(width: Int, alias: String) = {
          val rows = (0 until CM_DEPTH).map(j =>
            s"SELECT $j AS row_j, ${cmBucketDuck(j, width)} AS bucket, term FROM tok")
            .mkString(" UNION ALL ")
          s"""hx_$alias AS ($rows),
             |cells_$alias AS (SELECT row_j, bucket, count(*) AS cnt
             |FROM hx_$alias GROUP BY 1, 2),
             |$alias AS (SELECT e.term, e.exact_cnt, min(c.cnt) AS $alias
             |FROM exact e
             |JOIN (SELECT DISTINCT row_j, bucket, term FROM hx_$alias) h ON e.term = h.term
             |JOIN cells_$alias c ON h.row_j = c.row_j AND h.bucket = c.bucket
             |GROUP BY 1, 2)"""
        }
        s"""WITH tok AS (SELECT unnest($toksDuck) AS term FROM documents),
           |exact AS (SELECT term, count(*) AS exact_cnt FROM tok GROUP BY 1
           |ORDER BY exact_cnt DESC, term LIMIT 20),
           |${side(CM_NARROW, "est_narrow")},
           |${side(CM_WIDE, "est_wide")}
           |SELECT n.term, CAST(n.exact_cnt AS BIGINT) AS exact_cnt,
           |CAST(n.est_narrow AS BIGINT) AS est_narrow,
           |CAST(n.est_narrow - n.exact_cnt AS BIGINT) AS over_narrow,
           |CAST(w.est_wide AS BIGINT) AS est_wide,
           |CAST(w.est_wide - w.exact_cnt AS BIGINT) AS over_wide
           |FROM est_narrow n JOIN est_wide w ON n.term = w.term
           |ORDER BY exact_cnt DESC, n.term""".stripMargin.replace("\n", " ")
      }),

    QueryDef(
      "q146_vocab_coverage",
      // VOCAB COVERAGE CURVE — the tokenizer/vocab sizing diagnostic:
      // what fraction of all token OCCURRENCES does a top-k vocabulary
      // cover (equivalently: the OOV rate a k-entry vocab would pay)?
      // Reported at k = 5/10/20/50/100/500 (ranks beyond the corpus
      // vocab — 31 terms here — simply don't appear; the curve's
      // terminal row covers 64.5% at k=20 on this corpus). The top-500
      // cut happens via TakeOrderedAndProject BEFORE any global
      // window, so the cumulative sum ranks ≤500 rows no matter the
      // corpus; the only corpus-wide work is the term-frequency
      // aggregate q30 already does. (q102's vocab-build/encode is the
      // ACTION this curve sizes.)
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(expr(toksExpr)).as("term"))
        val freq = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
        val total = freq.agg(sum("cnt").as("n_total"))
        val top = freq.orderBy(col("cnt").desc, col("term")).limit(500)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cnt").desc, col("term"))))
          .withColumn("cum", sum("cnt").over(
            Window.orderBy(col("cnt").desc, col("term"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        top.filter(col("rk").isin(5, 10, 20, 50, 100, 500))
          .crossJoin(broadcast(total))
          .select(col("rk").as("k"), col("cum").as("covered_occurrences"),
            round(col("cum").cast("double") / col("n_total"), 6).as("coverage"),
            round(lit(1.0) - col("cum").cast("double") / col("n_total"), 6).as("oov_rate"))
          .orderBy("k")
      },
      Some(s"""WITH tok AS (SELECT unnest($toksDuck) AS term FROM documents),
              |freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
              |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM freq),
              |top AS (SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rk,
              |CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
              |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              |FROM (SELECT * FROM freq ORDER BY cnt DESC, term LIMIT 500))
              |SELECT rk AS k, cum AS covered_occurrences,
              |round(cum * 1.0 / n_total, 6) AS coverage,
              |round(1.0 - cum * 1.0 / n_total, 6) AS oov_rate
              |FROM top, total WHERE rk IN (5, 10, 20, 50, 100, 500) ORDER BY k""".stripMargin
        .replace("\n", " "))),

    QueryDef(
      "q147_shuffle_skew_audit",
      // SHUFFLE SKEW AUDIT — the pre-flight check for any shuffle key:
      // hash the candidate key into 32 simulated reduce partitions (the
      // same mod-N placement a real exchange does, with our engine-
      // portable md5-fold in place of Murmur3) and report how the rows
      // land. Two keys from the same table, opposite verdicts:
      // `user_id` (150 spread keys) fills all buckets near-uniformly —
      // skew ratio ~1 — while `event_type` (5 hot values) leaves most
      // of the 32 partitions EMPTY and overloads the rest ~6.9× — the
      // exact shape that stalls a stage on one task and why q85 salts
      // and AQE splits. Per key: distinct keys, buckets used, max
      // bucket, and max/avg skew ratio.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def audit(keyExpr: String, name: String) = {
          val b = ev.select(
            expr(s"CAST(conv(substr(md5($keyExpr), 1, 15), 16, 10) AS BIGINT) % 32")
              .as("bucket"),
            expr(keyExpr).as("k"))
          b.groupBy("bucket")
            .agg(count(lit(1)).as("n"))
            .agg(count(lit(1)).as("buckets_used"),
              max("n").as("max_bucket"), sum("n").as("total"))
            .crossJoin(broadcast(b.agg(countDistinct("k").as("n_keys"))))
            .select(lit(name).as("key_name"), col("n_keys"), col("buckets_used"),
              col("max_bucket"),
              round(col("max_bucket") * lit(32) * lit(1.0) / col("total"), 4).as("skew_ratio"))
        }
        audit("CAST(user_id AS STRING)", "user_id")
          .unionByName(audit("event_type", "event_type"))
          .orderBy("key_name")
      },
      Some {
        def side(keyDuck: String, name: String) =
          s"""(SELECT '$name' AS key_name,
             |(SELECT count(DISTINCT $keyDuck) FROM events) AS n_keys,
             |count(*) AS buckets_used, CAST(max(n) AS BIGINT) AS max_bucket,
             |round(max(n) * 32 * 1.0 / sum(n), 4) AS skew_ratio
             |FROM (SELECT ${Corpus.hexFoldDuck(s"substr(md5($keyDuck), 1, 15)", 15)} % 32
             |AS bucket, count(*) AS n FROM events GROUP BY 1))"""
        s"""SELECT * FROM (${side("CAST(user_id AS VARCHAR)", "user_id")}
           |UNION ALL ${side("event_type", "event_type")})
           |ORDER BY key_name""".stripMargin.replace("\n", " ")
      }),

    QueryDef(
      "q148_linear_counting",
      // LINEAR (PROBABILISTIC) COUNTING — the oracled twin of q92's
      // rows-only HLL: approximate distinct counts from a FIXED
      // m-slot occupancy bitmap, est = -m·ln(empty/m). Unlike
      // approx_count_distinct, the hash (md5-fold mod m) is engine-
      // portable, so the estimate itself is exact-matched against
      // DuckDB — the approximation is oracle-CHECKED, not just
      // rows-counted. Like q145, run at TWO sizes so the failure mode
      // is a readout: m=256 SATURATES on sf0.1's 1500 users (every
      // slot hit ⇒ no estimate; est = -1 sentinel, saturated = true —
      // the signal to switch to a log-scale sketch) while m=4096
      // estimates every load here within ~7%. The bitmap is an
      // OR-monoid of m bits regardless of input size — the same merge
      // story as q145's sketch, at distinct-count semantics.
      (s, dir) => {
        def side(df: org.apache.spark.sql.DataFrame, valExpr: String,
            name: String, m: Int) = {
          val occ = df.select(
              expr(s"CAST(conv(substr(md5($valExpr), 1, 15), 16, 10) AS BIGINT) % $m")
                .as("slot"),
              expr(valExpr).as("v"))
          val estCol = when(col("occupied") === m, lit(-1.0))
            .otherwise(round(lit(-m.toDouble) *
              log((lit(m) - col("occupied")).cast("double") / lit(m)), 4))
          occ.agg(countDistinct("slot").as("occupied"), countDistinct("v").as("n_exact"))
            .select(lit(name).as("col_name"), col("n_exact"),
              lit(m.toLong).as("m"), col("occupied"),
              (col("occupied") === m).as("saturated"), estCol.as("est"),
              when(col("occupied") === m, lit(null).cast("double"))
                .otherwise(round((estCol - col("n_exact")) * lit(100) * lit(1.0) /
                  col("n_exact"), 2)).as("err_pct"))
        }
        val terms = Tables.documents(s, dir).select(explode(expr(toksExpr)).as("term"))
        val ev = Tables.events(s, dir)
        Seq(256, 4096).map { m =>
          side(terms, "term", "term", m)
            .unionByName(side(ev, "CAST(user_id AS STRING)", "user_id", m))
        }.reduce(_ unionByName _).orderBy("col_name", "m")
      },
      Some {
        def side(from: String, valDuck: String, name: String, m: Int) =
          s"""(SELECT '$name' AS col_name, count(DISTINCT v) AS n_exact,
             |CAST($m AS BIGINT) AS m, count(DISTINCT slot) AS occupied,
             |count(DISTINCT slot) = $m AS saturated,
             |CASE WHEN count(DISTINCT slot) = $m THEN -1.0
             |ELSE round(-CAST($m AS DOUBLE) * ln(CAST($m - count(DISTINCT slot) AS DOUBLE) / $m), 4)
             |END AS est,
             |CASE WHEN count(DISTINCT slot) = $m THEN CAST(NULL AS DOUBLE)
             |ELSE round((round(-CAST($m AS DOUBLE) * ln(CAST($m - count(DISTINCT slot) AS DOUBLE) / $m), 4)
             |- count(DISTINCT v)) * 100 * 1.0 / count(DISTINCT v), 2) END AS err_pct
             |FROM (SELECT ${Corpus.hexFoldDuck(s"substr(md5(v), 1, 15)", 15)} % $m AS slot, v
             |FROM (SELECT $valDuck AS v FROM $from) s0))"""
        val terms = "(SELECT unnest(" + toksDuck + ") AS term FROM documents)"
        s"""SELECT * FROM (${side(terms, "term", "term", 256)}
           |UNION ALL ${side("events", "CAST(user_id AS VARCHAR)", "user_id", 256)}
           |UNION ALL ${side(terms, "term", "term", 4096)}
           |UNION ALL ${side("events", "CAST(user_id AS VARCHAR)", "user_id", 4096)})
           |ORDER BY col_name, m""".stripMargin.replace("\n", " ")
      }),

    QueryDef(
      "q149_chisq_independence",
      // CHI-SQUARE INDEPENDENCE CELLS (source × lang) — the crawl-QA
      // question behind q110's token drift, at slice granularity: does
      // the language mix depend on the source, and WHICH cells drive
      // it? Per contingency cell: observed count, row/col totals, the
      // EXACT-integer cross-multiplied deviation |o·N − r·c| (q110's
      // trick — DECIMAL internally, engine-exact, ranks cells by
      // dependence without any float; the OUTPUT is narrowed to BIGINT
      // because DECIMAL(38,0) is not hash-stable across Spark parquet
      // FIXED_LEN_BYTE_ARRAY(16) and DuckDB HUGEINT — COVERAGE.md
      // determinism rules; gate-SF values ≪ 2^63), plus the
      // conventional expected count and
      // (o−e)²/e χ² term for interpretation. No order-dependent float
      // SUM anywhere: each row is a fixed per-row expression chain, so
      // the oracle is exact; the χ² TOTAL (a 25-term sum) is the
      // spec's job, where summation order is controlled. Shape: one
      // (source,lang) aggregate (the only corpus shuffle) + three
      // broadcast-joined marginal tables derived from it.
      (s, dir) => {
        val o = Tables.documents(s, dir)
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val r = o.groupBy("source").agg(sum("o").as("r"))
        val c = o.groupBy("lang").agg(sum("o").as("c"))
        val n = o.agg(sum("o").as("n"))
        o.join(broadcast(r), "source").join(broadcast(c), "lang")
          .crossJoin(broadcast(n))
          .withColumn("e", (col("r").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
            .cast("double") / col("n"))
          .select(col("source"), col("lang"), col("o"), col("r"), col("c"),
            abs(col("o").cast("decimal(18,0)") * col("n").cast("decimal(18,0)")
              - col("r").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
              .cast("long").as("dev"),
            round(col("e"), 4).as("e"),
            round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 4)
              .as("chisq_term"))
          .orderBy("source", "lang")
      },
      Some("""WITH o AS (SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
             |c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
             |j AS (SELECT o.source, o.lang, o.o, r.r, c.c, n.n,
             |CAST(CAST(r.r AS DECIMAL(18,0)) * CAST(c.c AS DECIMAL(18,0)) AS DOUBLE) / n.n AS e
             |FROM o JOIN r ON o.source = r.source JOIN c ON o.lang = c.lang, n)
             |SELECT source, lang, o, r, c,
             |CAST(abs(CAST(o AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))
             |- CAST(r AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS BIGINT) AS dev,
             |round(e, 4) AS e,
             |round((o - e) * (o - e) / e, 4) AS chisq_term
             |FROM j ORDER BY source, lang""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q150_constraint_audit",
      // CONSTRAINT AUDIT — the Deequ-style declarative data-quality
      // suite a pipeline runs before trusting an ingest: key
      // uniqueness (single and composite), referential integrity
      // (orders→customer as an anti-join count), NOT NULL, value
      // range, and a functional dependency (n_nationkey → n_regionkey:
      // LHS values mapping to >1 RHS are violations). One row per
      // declared constraint with checked/violation counts and the
      // verdict — the audit TABLE is the artifact a data contract
      // gates on. Every check is one aggregate or one anti-join on
      // the constraint's own key — the shapes the engine already
      // scales; the suite unions six tiny 1-row results.
      (s, dir) => {
        def row(name: String, checked: org.apache.spark.sql.Column,
            viol: org.apache.spark.sql.Column, df: org.apache.spark.sql.DataFrame) =
          df.agg(checked.cast("long").as("n_checked"), viol.cast("long").as("n_violations"))
            .select(lit(name).as("constraint_name"), col("n_checked"),
              col("n_violations"), (col("n_violations") === 0L).as("pass"))
        val cust = Tables.customer(s, dir)
        val uniqCust = row("customer.c_custkey unique",
          count(lit(1)), count(lit(1)) - countDistinct(col("c_custkey")),
          cust)
        val uniqLine = row("lineitem (l_orderkey,l_linenumber) unique",
          count(lit(1)),
          count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")),
          Tables.lineitem(s, dir))
        val refOrders = row("orders.o_custkey references customer",
          count(lit(1)), count(lit(1)),
          Tables.orders(s, dir).join(cust,
            col("o_custkey") === col("c_custkey"), "left_anti"))
          // anti-join leaves only violations: n_checked must be the full
          // orders count, so patch it from a separate 1-row aggregate
          .drop("n_checked")
          .crossJoin(broadcast(Tables.orders(s, dir)
            .agg(count(lit(1)).cast("long").as("n_checked"))))
          .select(col("constraint_name"), col("n_checked"), col("n_violations"), col("pass"))
        val notNull = row("events.user_id not null",
          count(lit(1)), count(lit(1)) - count(col("user_id")),
          Tables.events(s, dir))
        val range = row("lineitem.l_quantity in [1,50]",
          count(lit(1)),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)),
          Tables.lineitem(s, dir))
        val fd = row("nation.n_nationkey -> n_regionkey",
          count(lit(1)),
          sum(when(col("nrk") > 1L, 1L).otherwise(0L)),
          Tables.nation(s, dir).groupBy("n_nationkey")
            .agg(countDistinct("n_regionkey").as("nrk")))
        Seq(uniqCust, uniqLine, refOrders, notNull, range, fd)
          .reduce(_ unionByName _).orderBy("constraint_name")
      },
      Some("""SELECT * FROM (
             |SELECT 'customer.c_custkey unique' AS constraint_name,
             |CAST(count(*) AS BIGINT) AS n_checked,
             |CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations,
             |count(*) - count(DISTINCT c_custkey) = 0 AS pass FROM customer
             |UNION ALL
             |SELECT 'lineitem (l_orderkey,l_linenumber) unique',
             |CAST(count(*) AS BIGINT),
             |CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
             |count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0 FROM lineitem
             |UNION ALL
             |SELECT 'orders.o_custkey references customer',
             |CAST((SELECT count(*) FROM orders) AS BIGINT),
             |CAST(count(*) AS BIGINT), count(*) = 0
             |FROM orders o WHERE NOT EXISTS
             |(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
             |UNION ALL
             |SELECT 'events.user_id not null', CAST(count(*) AS BIGINT),
             |CAST(count(*) - count(user_id) AS BIGINT),
             |count(*) - count(user_id) = 0 FROM events
             |UNION ALL
             |SELECT 'lineitem.l_quantity in [1,50]', CAST(count(*) AS BIGINT),
             |CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
             |sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0 FROM lineitem
             |UNION ALL
             |SELECT 'nation.n_nationkey -> n_regionkey',
             |CAST(count(*) AS BIGINT),
             |CAST(sum(CASE WHEN nrk > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |sum(CASE WHEN nrk > 1 THEN 1 ELSE 0 END) = 0
             |FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nrk
             |FROM nation GROUP BY 1) f)
             |ORDER BY constraint_name""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q151_equidepth_histogram",
      // ANALYZE-STYLE EQUI-DEPTH HISTOGRAM — the optimizer-statistics
      // collection step (8 buckets of equal ROW count, each with its
      // value range, count, and NDV): what a cost-based planner feeds
      // on for selectivity estimates, and the stats artifact every
      // warehouse's ANALYZE emits. Bucket = (rank·8) div n over the
      // value-ordered frame (the same formula on both engines — NOT
      // ntile, whose remainder rule differs) — rank comes from
      // Indexing.globalIndex's two-pass range exchange, so no
      // single-partition sort ever sees the table. Two columns with
      // opposite shapes: l_quantity (50 discrete values, 12k rows per
      // value ⇒ buckets land on value boundaries and NDV ~6-7) and
      // events.value (continuous ⇒ NDV ≈ cnt per bucket).
      (s, dir) => {
        def hist(df: org.apache.spark.sql.DataFrame, valCol: String,
            tieBreak: Seq[org.apache.spark.sql.Column], name: String) = {
          val v = df.select((col(valCol).as("v") +: tieBreak): _*)
          val idx = Indexing.globalIndex(v, col("v") +: tieBreak)
          idx.crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
            .withColumn("bucket", expr("(idx * 8) DIV n"))
            .groupBy("bucket")
            .agg(min("v").as("lo"), max("v").as("hi"),
              count(lit(1)).as("cnt"), countDistinct("v").as("ndv"))
            .select(lit(name).as("col_name"), col("bucket"), col("lo"),
              col("hi"), col("cnt"), col("ndv"))
        }
        hist(Tables.lineitem(s, dir), "l_quantity",
            Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey")), "l_quantity")
          .unionByName(hist(Tables.events(s, dir), "value",
            Seq(col("event_id")), "events.value"))
          .orderBy("col_name", "bucket")
      },
      Some("""SELECT * FROM (
             |WITH lq AS (SELECT l_quantity AS v, (row_number() OVER
             |(ORDER BY l_quantity, l_orderkey, l_linenumber, l_partkey) - 1) AS idx,
             |(SELECT count(*) FROM lineitem) AS n FROM lineitem),
             |ev AS (SELECT value AS v, (row_number() OVER
             |(ORDER BY value, event_id) - 1) AS idx,
             |(SELECT count(*) FROM events) AS n FROM events)
             |SELECT 'l_quantity' AS col_name, CAST(idx * 8 // n AS BIGINT) AS bucket,
             |min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS cnt,
             |CAST(count(DISTINCT v) AS BIGINT) AS ndv
             |FROM lq GROUP BY 2
             |UNION ALL
             |SELECT 'events.value', CAST(idx * 8 // n AS BIGINT),
             |min(v), max(v), CAST(count(*) AS BIGINT), CAST(count(DISTINCT v) AS BIGINT)
             |FROM ev GROUP BY 2)
             |ORDER BY col_name, bucket""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q152_cardinality_estimates",
      // OPTIMIZER CARDINALITY-ESTIMATION AUDIT — the textbook CBO
      // formulas q151's statistics exist to feed, scored against
      // ground truth: equality via uniform-NDV (n/ndv), ranges via
      // min-max interpolation (n·(c−lo)/(hi−lo)), equi-join via
      // |A|·|B|/max(ndv_A, ndv_B). Four targets chosen so the audit
      // TEACHES: the equality and join estimates land near 1×; the
      // value>100 range estimate overshoots ~5× because events.value
      // is heavy-tailed and min-max interpolation assumes uniform —
      // exactly the error q151's equi-depth buckets exist to fix.
      // Every estimate is single-row arithmetic over table stats
      // (count/min/max/ndv aggregates — map-side combining scans);
      // each actual is one filter/join count.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val ev = Tables.events(s, dir)
        val liS = li.agg(count(lit(1)).as("n"), countDistinct("l_quantity").as("ndv"),
          min("l_quantity").as("lo"), max("l_quantity").as("hi"))
        val evS = ev.agg(count(lit(1)).as("n"),
          min("value").as("lo"), max("value").as("hi"))
        def row(name: String, est: org.apache.spark.sql.Column,
            stats: org.apache.spark.sql.DataFrame,
            actual: org.apache.spark.sql.DataFrame) =
          stats.crossJoin(broadcast(actual.agg(count(lit(1)).as("actual_rows"))))
            .select(lit(name).as("target"),
              round(est, 1).as("est_rows"), col("actual_rows"),
              round(round(est, 1) / col("actual_rows"), 4).as("err_ratio"))
        val eq = row("l_quantity = 5",
          col("n").cast("double") / col("ndv"), liS,
          li.filter(col("l_quantity") === 5))
        val rng1 = row("l_quantity <= 10",
          col("n") * (lit(10) - col("lo")) / (col("hi") - col("lo")), liS,
          li.filter(col("l_quantity") <= 10))
        val rng2 = row("events.value > 100",
          col("n") * (col("hi") - lit(100)) / (col("hi") - col("lo")), evS,
          ev.filter(col("value") > 100))
        val ord = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir)
        val joinS = ord.agg(count(lit(1)).as("n_o"), countDistinct("o_custkey").as("ndv_o"))
          .crossJoin(cust.agg(count(lit(1)).as("n_c"), countDistinct("c_custkey").as("ndv_c")))
        val jn = row("orders join customer on custkey",
          col("n_o") * col("n_c") / greatest(col("ndv_o"), col("ndv_c")), joinS,
          ord.join(cust, col("o_custkey") === col("c_custkey")))
        Seq(eq, rng1, rng2, jn).reduce(_ unionByName _).orderBy("target")
      },
      Some("""SELECT * FROM (
             |WITH li AS (SELECT count(*) AS n, count(DISTINCT l_quantity) AS ndv,
             |min(l_quantity) AS lo, max(l_quantity) AS hi FROM lineitem),
             |ev AS (SELECT count(*) AS n, min(value) AS lo, max(value) AS hi FROM events),
             |js AS (SELECT (SELECT count(*) FROM orders) AS n_o,
             |(SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_o,
             |(SELECT count(*) FROM customer) AS n_c,
             |(SELECT count(DISTINCT c_custkey) FROM customer) AS ndv_c)
             |SELECT 'l_quantity = 5' AS target,
             |round(CAST(n AS DOUBLE) / ndv, 1) AS est_rows,
             |CAST((SELECT count(*) FROM lineitem WHERE l_quantity = 5) AS BIGINT) AS actual_rows,
             |round(round(CAST(n AS DOUBLE) / ndv, 1)
             |/ (SELECT count(*) FROM lineitem WHERE l_quantity = 5), 4) AS err_ratio FROM li
             |UNION ALL
             |SELECT 'l_quantity <= 10', round(n * (10 - lo) / (hi - lo), 1),
             |CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 10) AS BIGINT),
             |round(round(n * (10 - lo) / (hi - lo), 1)
             |/ (SELECT count(*) FROM lineitem WHERE l_quantity <= 10), 4) FROM li
             |UNION ALL
             |SELECT 'events.value > 100', round(n * (hi - 100) / (hi - lo), 1),
             |CAST((SELECT count(*) FROM events WHERE value > 100) AS BIGINT),
             |round(round(n * (hi - 100) / (hi - lo), 1)
             |/ (SELECT count(*) FROM events WHERE value > 100), 4) FROM ev
             |UNION ALL
             |SELECT 'orders join customer on custkey',
             |round(n_o * n_c / greatest(ndv_o, ndv_c), 1),
             |CAST((SELECT count(*) FROM orders o JOIN customer c
             |ON o.o_custkey = c.c_custkey) AS BIGINT),
             |round(round(n_o * n_c / greatest(ndv_o, ndv_c), 1)
             |/ (SELECT count(*) FROM orders o JOIN customer c
             |ON o.o_custkey = c.c_custkey), 4) FROM js)
             |ORDER BY target""".stripMargin.replace("\n", " ")))
  )
}
