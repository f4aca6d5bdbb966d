package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-5 closers, part 4 — integrity, audit, and time-series
  * diagnostics:
  *
  *  - q198 Merkle manifest: a hash tree over the corpus (doc → page →
  *    shard → root) — the tamper-evidence / replication-check
  *    primitive behind content-addressed data lakes. Two corpora are
  *    equal iff their roots match; a mismatch localizes to a subtree
  *    in O(log) digest compares (q155 then names the exact rows).
  *  - q199 Benford first-digit audit: observed leading-digit mix of
  *    order totals vs Benford's law — the classic books-cooking /
  *    synthetic-data smell test. Expected probabilities are pinned
  *    literals (log10 of small rationals differs by libm; literals
  *    make both engines bit-identical).
  *  - q200 autocorrelation function: lag-1..7 ACF of daily event
  *    volume from exact n-scaled integer deviations — the
  *    periodicity detector that says WHICH seasonal baseline q181
  *    should use.
  *
  * Scale notes (also in SCALE.md):
  *  - q198: every digest fold has BOUNDED fan-in (≤64 docs per page;
  *    pages per shard shrink 8×; 8 shards to the root) — the B-ary
  *    tree discipline: at 100 TB add one more level, never a
  *    corpus-sized collect. Page/shard grouping is pure key
  *    arithmetic, so each level is one keyed agg.
  *  - q199: one hash agg to 9 digit rows; everything after is
  *    9-row arithmetic against broadcast literals.
  *  - q200: the day index, deviations, and the lag join all run on
  *    the |days| pre-aggregate (q162/q191 discipline); the lag join
  *    fan-out is exactly 7 per day.
  */
object Corpus8 {

  /** Benford P(d) as pinned literals — identical doubles on both
    * engines (computing log10(1+1/d) at runtime would expose libm
    * last-ulp differences between the JVM and DuckDB). */
  private val benford: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995663981, 2 -> 0.176091259055681, 3 -> 0.124938736608300,
    4 -> 0.096910013008056, 5 -> 0.079181246047625, 6 -> 0.066946789630613,
    7 -> 0.057991946977687, 8 -> 0.051152522447381, 9 -> 0.045757490560675)

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q198_merkle_manifest",
      // MERKLE SHARD MANIFEST — doc md5s fold into page digests
      // (≤64 docs, ordered by doc_id), pages into shard digests
      // (shard = page % 8, ordered by page), shards into one root.
      // Emits the page, shard, and root rows of the tree; leaf hashes
      // stay internal. Digest = md5 of the ordered concatenation —
      // deterministic under any partitioning because every fold sorts
      // its bounded child list first.
      (s, dir) => {
        def fold(c: String) = s"md5(array_join(transform(array_sort(collect_list(struct($c, hh))), x -> x.hh), ''))"
        val h = Tables.documents(s, dir)
          .select(col("doc_id"), md5(col("text")).as("hh"),
            expr("doc_id div 64").as("page"))
        val pages = h.groupBy("page")
          .agg(count(lit(1)).as("n_docs"), expr(fold("doc_id")).as("hh"))
          .withColumn("shard", pmod(col("page"), lit(8L)))
        val shards = pages.groupBy("shard")
          .agg(sum("n_docs").as("n_docs"), expr(fold("page")).as("hh"))
        val root = shards
          .select(col("shard").as("page"), col("n_docs"), col("hh"))
          .agg(sum("n_docs").as("n_docs"), expr(fold("page")).as("hh"))
        pages.select(lit("page").as("level"), col("page").as("node"), col("n_docs"), col("hh").as("digest"))
          .unionByName(shards.select(lit("shard").as("level"), col("shard").as("node"), col("n_docs"), col("hh").as("digest")))
          .unionByName(root.select(lit("root").as("level"), lit(-1L).as("node"), col("n_docs"), col("hh").as("digest")))
          .orderBy("level", "node")
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS hh, CAST(doc_id // 64 AS BIGINT) AS page FROM documents),
             |pages AS (SELECT page, CAST(count(*) AS BIGINT) AS n_docs,
             |md5(string_agg(hh, '' ORDER BY doc_id)) AS hh, page % 8 AS shard FROM h GROUP BY page),
             |shards AS (SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs,
             |md5(string_agg(hh, '' ORDER BY page)) AS hh FROM pages GROUP BY shard),
             |rt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
             |md5(string_agg(hh, '' ORDER BY shard)) AS hh FROM shards)
             |SELECT 'page' AS level, page AS node, n_docs, hh AS digest FROM pages
             |UNION ALL SELECT 'shard', shard, n_docs, hh FROM shards
             |UNION ALL SELECT 'root', -1, n_docs, hh FROM rt
             |ORDER BY level, node""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q199_benford_audit",
      // BENFORD FIRST-DIGIT AUDIT — leading digit of floor(total
      // price) vs the pinned Benford probabilities: observed count,
      // expected count, excess percentage points, and the χ²
      // contribution per digit (published per digit, NOT summed — a
      // 9-term float sum would be engine-order-dependent; the reader
      // sums rounded contributions if they want the statistic).
      (s, dir) => {
        val bf = benford.map { case (d, p) => s"struct($d AS digit, ${p}D AS p)" }
        val exp9 = Tables.orders(s, dir).sparkSession.range(1)
          .select(explode(expr(s"array(${bf.mkString(",")})")).as("b"))
          .select(col("b.digit"), col("b.p"))
        val obs = Tables.orders(s, dir)
          .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
            .cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("observed"))
        val n = obs.agg(sum("observed").as("n"))
        broadcast(exp9).join(obs, Seq("digit"), "left")
          .withColumn("observed", coalesce(col("observed"), lit(0L)))
          .crossJoin(broadcast(n))
          .select(col("digit"), col("observed"), col("n"),
            round(col("n") * col("p"), 2).as("expected"),
            round(lit(100.0) * (col("observed").cast("double") / col("n") - col("p")), 4).as("excess_pp"),
            round((col("observed") - col("n") * col("p")) * (col("observed") - col("n") * col("p"))
              / (col("n") * col("p")), 4).as("chisq_part"))
          .orderBy("digit")
      },
      Some({
        // CAST AS DOUBLE: DuckDB parses the bare literal as DECIMAL(15,15),
        // whose squared product overflows DECIMAL(38) at sf0.1.
        val bf = benford.map { case (d, p) => s"SELECT $d AS digit, CAST($p AS DOUBLE) AS p" }.mkString(" UNION ALL ")
        s"""WITH exp9 AS ($bf),
           |obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
           |count(*) AS observed FROM orders GROUP BY 1),
           |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
           |SELECT digit, CAST(coalesce(observed, 0) AS BIGINT) AS observed, n,
           |round(n * p, 2) AS expected,
           |round(100.0 * (CAST(coalesce(observed, 0) AS DOUBLE) / n - p), 4) AS excess_pp,
           |round((coalesce(observed, 0) - n * p) * (coalesce(observed, 0) - n * p) / (n * p), 4) AS chisq_part
           |FROM exp9 LEFT JOIN obs USING (digit), n ORDER BY digit"""
          .stripMargin.replace("\n", " ")
      })),

    QueryDef(
      "q200_volume_acf",
      // AUTOCORRELATION OF DAILY VOLUME — lag-1..7 ACF where the
      // deviations are the exact n-scaled integers n·x_t − T (q191's
      // trick: no float mean subtraction), so numerator and
      // denominator are exact integer sums and the published ACF is
      // one IEEE division. np counts the pairs each lag actually has.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
          .groupBy("d").agg(count(lit(1)).as("c"))
        val tot = daily.agg(count(lit(1)).as("n"), sum("c").as("t"))
        val z = daily.crossJoin(broadcast(tot))
          .withColumn("i", row_number().over(Window.orderBy("d")).cast("long"))
          .select(col("i"), (col("n") * col("c") - col("t")).as("dev"))
        val den = z.agg(sum(col("dev") * col("dev")).as("dd"))
        val lags = z.sparkSession.range(1, 8).select(col("id").as("lag"))
        val num = broadcast(lags).join(z.as("a"), lit(true))
          .join(z.as("b"), col("b.i") === col("a.i") + col("lag"))
          .groupBy("lag")
          .agg(count(lit(1)).as("np"), sum(col("a.dev") * col("b.dev")).as("nm"))
        num.crossJoin(broadcast(den))
          .select(col("lag"), col("np"),
            round(col("nm").cast("double") / col("dd"), 6).as("acf"))
          .orderBy("lag")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1),
             |t AS (SELECT count(*) AS n, sum(c) AS tt FROM daily),
             |z AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, n * c - tt AS dev FROM daily, t),
             |den AS (SELECT sum(dev * dev) AS dd FROM z),
             |k AS (SELECT unnest(generate_series(1, 7)) AS lag),
             |num AS (SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS np,
             |sum(a.dev * b.dev) AS nm FROM k, z a JOIN z b ON b.i = a.i + lag GROUP BY 1)
             |SELECT lag, np, round(CAST(nm AS DOUBLE) / dd, 6) AS acf
             |FROM num, den ORDER BY lag""".stripMargin.replace("\n", " "))))
}
