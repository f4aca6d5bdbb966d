package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage batch 2: the window/join/aggregate shapes the reference lacks
  * but a complete engine must expose (SURVEY.md §2.3/§2.6/§2.7 "declared
  * surface" rows): lag/lead, first/last frames, grouping sets, exact
  * percentiles, full-outer/cross joins, a bucketized event range join, an
  * as-of join, weighted word aggregation (A5), JSON field extraction (C14),
  * and ordered string aggregation.
  */
object Relational2 {

  import org.apache.spark.sql.DataFrame

  /** q49's body: generated month spine (sequence + explode) left-joined to
    * per-month counts — months with zero rows still appear with cnt = 0
    * (the zero branch is exercised on a gap fixture in RelationalSpec;
    * the testdata has no empty months). */
  def monthlyCounts(df: DataFrame, dateCol: String, from: String, to: String): DataFrame = {
    val spine = df.sparkSession.range(1)
      .select(explode(expr(
        s"sequence(to_date('$from'), to_date('$to'), interval 1 month)")).as("month_start"))
    val counts = df
      .groupBy(date_trunc("month", col(dateCol)).cast("date").as("m"))
      .agg(count(lit(1)).as("cnt"))
    spine.join(counts, col("month_start") === col("m"), "left")
      .select(col("month_start"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("month_start")
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q22_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |lag(o_totalprice) OVER w AS prev_price,
             |lead(o_totalprice) OVER w AS next_price
             |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q23_first_last",
      (s, dir) => {
        val base = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("first_price", first("o_totalprice").over(base))
          .withColumn("last_price", last("o_totalprice").over(
            base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("rn", row_number().over(base))
          .filter(col("rn") === 1)
          .select("o_custkey", "first_price", "last_price")
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, first_price, last_price FROM (
             |SELECT o_custkey,
             |first_value(o_totalprice) OVER w AS first_price,
             |last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
             |row_number() OVER w AS rn
             |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q24_grouping_sets",
      // Declared through the SQL API (temp view + spark.sql) — the engine's
      // SQL surface is part of the capability set.
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                 round(sum(o_totalprice), 2) AS total
                 FROM orders_v
                 GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
                 ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q25_percentiles",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
            round(expr("percentile(l_quantity, 0.5)"), 4).as("median"),
            round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
            round(avg("l_quantity"), 4).as("mean"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_quantity, 0.25), 4) AS p25,
             |round(quantile_cont(l_quantity, 0.5), 4) AS median,
             |round(quantile_cont(l_quantity, 0.75), 4) AS p75,
             |round(avg(l_quantity), 4) AS mean
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q26_full_outer",
      (s, dir) => {
        val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1),
             |s AS (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1)
             |SELECT coalesce(ck, sk) AS nationkey,
             |coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
             |FROM c FULL OUTER JOIN s ON ck = sk ORDER BY nationkey""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q27_cross_join",
      (s, dir) =>
        Tables.region(s, dir).select("r_name")
          .crossJoin(Tables.orders(s, dir).select(col("o_orderstatus").as("status")).distinct())
          .orderBy("r_name", "status"),
      Some("""SELECT r_name, status FROM region
             |CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) t
             |ORDER BY r_name, status""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q28_range_join",
      // Event pairs of the same user within a 5-minute window. The Spark
      // side is the SCALABLE form: coarse time-bucket equi-join (each left
      // row probes its own and the next bucket) + exact range filter — no
      // O(n²)-per-user nested loop. The oracle is the naive range join;
      // results are identical by construction.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("bucket", expr("us div 300000000"))
        val probes = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
            col("us").as("a_us"), explode(expr("array(bucket, bucket + 1)")).as("probe"))
        probes.join(e,
            col("a_user") === col("user_id") && col("probe") === col("bucket") &&
              col("us") > col("a_us") && col("us") - col("a_us") <= 300000000L)
          .select(col("a_id"), col("event_id").as("b_id"))
          .orderBy("a_id", "b_id")
      },
      Some("""SELECT a.event_id AS a_id, b.event_id AS b_id
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |AND b.ts > a.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
             |ORDER BY a_id, b_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q29_asof_join",
      // As-of join: for each purchase, the most recent prior click of the
      // same user — the union+window formulation (one sort-shuffle on
      // user_id, no range join) that scales to arbitrarily long histories.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("prior_click",
            last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("prior_click"))
          .orderBy("purchase_id")
      },
      Some("""SELECT event_id AS purchase_id, prior_click FROM (
             |SELECT event_id, event_type,
             |last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
             |FROM events) t WHERE event_type = 'purchase'
             |ORDER BY purchase_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q86_correlated_subquery",
      // TPC-H Q17 shape: correlated scalar subquery (per-part average)
      // through the SQL surface — Catalyst decorrelates it into an
      // aggregate + join rather than a per-row subplan.
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        s.sql("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
                 FROM lineitem_v, part_v
                 WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
                 AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                                   FROM lineitem_v l2 WHERE l2.l_partkey = p_partkey)""")
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
             |FROM lineitem, part
             |WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
             |AND l_quantity < (SELECT 0.5 * avg(l_quantity)
             |FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q48_unpivot",
      // wide → long reshape (melt): the inverse of the q17 conditional
      // pivot, via Dataset.unpivot.
      (s, dir) => {
        val wide = Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0))), 2).as("total_f"),
            round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(lit(0))), 2).as("total_o"),
            round(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(lit(0))), 2).as("total_p"))
        wide.unpivot(
            Array(col("o_orderpriority")),
            Array(col("total_f"), col("total_o"), col("total_p")),
            "status", "total")
          .orderBy("o_orderpriority", "status")
      },
      Some("""SELECT o_orderpriority, status, total FROM (
             |SELECT o_orderpriority,
             |round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
             |round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
             |round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice ELSE 0 END), 2) AS total_p
             |FROM orders GROUP BY 1) w
             |UNPIVOT (total FOR status IN (total_f, total_o, total_p))
             |ORDER BY o_orderpriority, status""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q98_pivot",
      // The dedicated pivot API (RelationalGroupedDataset.pivot with
      // explicit values — the form that avoids the extra distinct-values
      // job and keeps the plan a single hash aggregate). q17/q48 cover
      // the conditional-aggregate and unpivot shapes; this declares the
      // API itself.
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum("o_totalprice"), 2))
          .na.fill(0.0, Seq("F", "O", "P"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |coalesce(round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 2), 0) AS "F",
             |coalesce(round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 2), 0) AS "O",
             |coalesce(round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 2), 0) AS "P"
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q49_date_spine",
      // Generated date dimension left-joined to the fact — months with
      // zero orders still appear (see monthlyCounts).
      (s, dir) => monthlyCounts(Tables.orders(s, dir), "o_orderdate", "1995-01-01", "2001-08-01"),
      Some("""SELECT CAST(g.m AS DATE) AS month_start, coalesce(c.cnt, 0) AS cnt
             |FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01', INTERVAL 1 MONTH) g(m)
             |LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m2, count(*) AS cnt
             |FROM orders GROUP BY 1) c ON CAST(g.m AS DATE) = c.m2
             |ORDER BY month_start""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q37_weighted_words",
      // A5: weighted word accumulation (scrappy.py:508-517) — weights are
      // the per-doc TF-IDF scores, summed per term, stopwords skipped.
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tok = docs.select(col("doc_id"),
          explode(expr(TextAnalytics.toksExpr)).as("term"))
          .filter(!col("term").isInCollection(TextAnalytics.Stopwords))
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        tf.join(broadcast(dfT), "term").crossJoin(broadcast(n))
          .withColumn("wgt", col("tf") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
          .groupBy("term").agg(round(sum("wgt"), 4).as("weight"))
          .orderBy(col("weight").desc, col("term"))
          .limit(50)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${TextAnalytics.toksDuck}) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
              |WHERE term NOT IN (${TextAnalytics.Stopwords.map(w => s"'$w'").mkString(", ")}) GROUP BY 1, 2),
              |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS n FROM documents)
              |SELECT tf.term, round(sum(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0)), 4) AS weight
              |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
              |GROUP BY tf.term ORDER BY weight DESC, tf.term LIMIT 50""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q38_json_props",
      // C14: nested JSON field extraction (reference: index_terms path,
      // scrappy.py:112) over the events props column.
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum("k").as("sum_k"), count(lit(1)).as("cnt"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |count(*) AS cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q87_decimal_sum",
      // Exact decimal aggregation — the money path that needs NO rounding
      // dance: both engines sum DECIMAL(18,2) exactly; the final cast pins
      // the output type.
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q88_regexp_extract",
      // Regex capture-group extraction over the raw props string (the
      // non-JSON path to C14's nested-field access).
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q101_map_ops",
      // Map-typed column surface: parse the props JSON into MAP<STRING,
      // STRING> and exercise the map function family (map_keys /
      // element_at / size) — the dynamic-schema path C14's fixed-path
      // extraction (q38) doesn't cover. All scan expressions.
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"),
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("m"))
          .select(col("event_id"),
            size(map_keys(col("m"))).cast("long").as("n_keys"),
            array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
            element_at(col("m"), "k").cast("long").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
             |array_to_string(list_sort(json_keys(props)), ',') AS keys,
             |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q39_string_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(concat_ws(",", array_sort(collect_set("l_linestatus"))).as("statuses"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
             |count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " ")))
  )
}
