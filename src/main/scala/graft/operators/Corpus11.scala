package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 corpus operators: chunk-granularity deduplication — the
  * granularity production web-corpus pipelines actually dedup at
  * (paragraph/line-level exact dedup à la CCNet / RefinedWeb), mapped
  * back to per-document retention so downstream mixing can reason about
  * what survived — and the token-interning collision audit that backs
  * the LSH family's fingerprint-based Jaccard verify (Dedup.scala r8).
  * q261 (r9) extends the audit to the shingle/8-gram families once
  * those were interned too. The reference's own dedup is whole-record
  * keep-first (scrappy.py:316,334-335); all queries here are "beyond
  * the reference" training-pipeline extensions of that contract.
  */
object Corpus11 {

  /** q260's audit body, input-agnostic (docs needs `doc_id`, `text`).
    * `hexWidth` sets the fingerprint width in md5 hex digits (the
    * production interning uses 15 = 60 bits, Dedup.internExpr);
    * Corpus11Spec instantiates it at width 1 (4 bits) on a synthetic
    * corpus to prove the audit actually fires when fingerprints
    * collide — a real 60-bit md5-prefix collision is not constructible
    * in a test. */
  private[graft] def fingerprintAudit(
      docs: org.apache.spark.sql.DataFrame,
      hexWidth: Int = 15): org.apache.spark.sql.DataFrame = {
    val toks = "filter(split(lower(text), ' '), x -> x <> '')"
    val fold = Corpus.hexFoldSpark(s"substring(md5(u), 1, $hexWidth)", hexWidth)
    val perDoc = docs.select(
        size(expr(s"array_distinct($toks)")).cast("long").as("ns"),
        size(expr(s"array_distinct(transform($toks, u -> $fold))")).cast("long").as("nf"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ns") =!= col("nf"), 1L).otherwise(0L)).as("n_docs_affected"))
    val vocab = docs.select(explode(expr(toks)).as("u")).distinct()
      .agg(count(lit(1)).as("n_vocab_tokens"),
        countDistinct(expr(fold)).as("n_vocab_fps"))
    perDoc.crossJoin(broadcast(vocab))
      .select(col("n_docs"), col("n_docs_affected"),
        col("n_vocab_tokens"), col("n_vocab_fps"),
        (col("n_vocab_tokens") - col("n_vocab_fps")).as("n_vocab_collisions"))
  }

  /** q261's audit body, input-agnostic (docs needs `doc_id`, `text`) and
    * width-parameterized like [[fingerprintAudit]]: production interning
    * uses 15 hex digits (60 bits); Corpus11Spec instantiates width 1
    * (4 bits) on a synthetic corpus to prove the n-gram audit fires on a
    * real fingerprint collision. */
  private[graft] def ngramFingerprintAudit(
      docs: org.apache.spark.sql.DataFrame,
      hexWidth: Int = 15): org.apache.spark.sql.DataFrame = {
    def fp(e: String) =
      Corpus.hexFoldSpark(s"substring(md5($e), 1, $hexWidth)", hexWidth)
    val t = docs.select(col("doc_id"), expr(TextAnalytics.toksExpr).as("w"))
    val sh5Fp = s"transform(${Corpus.shingleSpark}, s5 -> ${fp("s5")})"
    val g8 = s"array_distinct(${Corpus.ngramSpark(8)})"
    val g8Fp = s"transform($g8, g8 -> ${fp("g8")})"
    val perDoc = t.select(
        size(expr(Corpus.shingleSpark)).cast("long").as("ns5"),
        size(expr(s"array_distinct($sh5Fp)")).cast("long").as("nf5"),
        size(expr(g8)).cast("long").as("ns8"),
        size(expr(s"array_distinct($g8Fp)")).cast("long").as("nf8"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ns5") =!= col("nf5"), 1L).otherwise(0L)).as("n_docs_affected_sh5"),
        sum(when(col("ns8") =!= col("nf8"), 1L).otherwise(0L)).as("n_docs_affected_g8"))
    def vocab(arr: String, n: String, nFps: String) =
      t.select(explode(expr(arr)).as("g")).distinct()
        .agg(count(lit(1)).as(n),
          countDistinct(expr(fp("g"))).as(nFps))
    perDoc
      .crossJoin(broadcast(vocab(Corpus.shingleSpark, "n_sh5", "n_sh5_fps")))
      .crossJoin(broadcast(vocab(g8, "n_g8", "n_g8_fps")))
      .select(col("n_docs"), col("n_docs_affected_sh5"), col("n_docs_affected_g8"),
        col("n_sh5"), col("n_sh5_fps"),
        (col("n_sh5") - col("n_sh5_fps")).as("n_sh5_collisions"),
        col("n_g8"), col("n_g8_fps"),
        (col("n_g8") - col("n_g8_fps")).as("n_g8_collisions"))
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q259_chunk_dedup",
      // CROSS-DOC CHUNK-LEVEL EXACT DEDUP: chunk every document with
      // q93's rule (20-token windows, stride 15 — ONE definition,
      // Corpus.chunkTokens), fingerprint each chunk, and keep the
      // corpus-wide FIRST occurrence of every fingerprint in
      // (doc_id, chunk_idx) order — the chunk-granularity analogue of
      // q40's keep-first contract. Output: per document, how much
      // survived (chunk and token counts + retained token fraction).
      // Scale shape: stateless map-side chunking (no shuffle), then ONE
      // hash shuffle keyed on the 128-bit chunk fingerprint into a
      // PARTIAL-AGGREGABLE min(struct(doc_id, chunk_idx, n_tokens)) —
      // a boilerplate chunk with billions of occurrences collapses to
      // one row per map partition BEFORE the exchange (r9; the previous
      // per-fingerprint keep-first window had no partial aggregation,
      // so a web-scale heavy-hitter fingerprint landed whole in one
      // task). The winner rows roll straight up to per-doc kept
      // counts — no join back on the skewed fingerprint key — and meet
      // the doc-keyed totals in a doc_id-keyed join. Nothing quadratic,
      // no window at all — the same plan runs at 100 TB with the
      // fingerprint shuffle as the only corpus-sized exchange.
      (s, dir) => {
        val ch = Corpus.chunkTokens(Tables.documents(s, dir))
        // min over the struct orders by (doc_id, chunk_idx) — unique per
        // row, so n_tokens merely rides along with the winning chunk.
        val keptPerDoc = ch
          .groupBy(md5(col("chunk")).as("fp"))
          .agg(min(struct(col("doc_id"), col("chunk_idx"), col("n_tokens"))).as("w"))
          .groupBy(col("w.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_kept"), sum("w.n_tokens").as("kept_tokens"))
        ch.groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("total_tokens"))
          .join(keptPerDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            col("total_tokens"),
            coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
            round(coalesce(col("kept_tokens"), lit(0L)) * lit(1.0) /
              col("total_tokens"), 4).as("retained_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w FROM documents),
             |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |array_to_string(w[i*15+1:i*15+20], ' ') AS chunk,
             |CAST(len(w[i*15+1:i*15+20]) AS BIGINT) AS n_tokens
             |FROM t, LATERAL (SELECT unnest(generate_series(0, (len(w)-1)//15)) AS i) g WHERE len(w) > 0),
             |r AS (SELECT doc_id, chunk_idx, n_tokens,
             |row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) = 1 AS kept FROM ch)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
             |round(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) * 1.0 / sum(n_tokens), 4) AS retained_frac
             |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")),
      // headline-benched (r9): the most production-representative dedup
      // query on the board — perf-tracked round over round.
      bench = true),

    QueryDef(
      "q260_fingerprint_audit",
      // 60-BIT TOKEN-INTERNING COLLISION AUDIT — the honesty check
      // behind the LSH family's interned Jaccard verify (Dedup r8): the
      // verify intersects md5-prefix int64 fingerprints instead of
      // strings, which is exact iff no two distinct tokens share a
      // fingerprint. This query measures that directly: per-document
      // (distinct tokens vs distinct fingerprints — a difference means
      // a within-doc collision that would perturb a Jaccard value) and
      // corpus-wide vocabulary (distinct tokens vs distinct
      // fingerprints). Expected collisions at 60 bits are |V|²/2⁶¹ —
      // ≈0.4 pairs even at a 10⁹-token web vocabulary — and on this
      // corpus the audit certifies exactly zero. Scale shape: the
      // per-doc half is pure map-side arithmetic (no explode); the
      // vocab half is one distinct + one hash aggregate over the
      // exploded token stream; the two 1-row aggregates meet in a
      // scalar broadcast attach.
      (s, dir) => fingerprintAudit(Tables.documents(s, dir)),
      qFpAuditOracle),

    QueryDef(
      "q261_ngram_fp_audit",
      // 60-BIT SHINGLE / 8-GRAM INTERNING COLLISION AUDIT — q260's
      // discipline extended to the n-gram families interned in r9: the
      // df-capped 5-shingle joins (q107/q114/q116/q143 rung 2) and the
      // positional-8-gram span pipeline (q117/q120/q127) now key on
      // md5-prefix int64 fingerprints, which is exact iff no two
      // distinct n-grams share a fingerprint. Measured directly, per
      // n-gram width: per-document (distinct n-grams vs distinct
      // fingerprints — a difference means a within-doc collision that
      // would perturb a contamination fraction, containment ratio, or
      // span match) and corpus-wide vocabulary. Expected collisions at
      // 60 bits are C(|V|,2)/2⁶⁰ ≈ 0.4 even at a 10⁹-gram vocabulary;
      // on this corpus the audit certifies exactly zero. Scale shape:
      // the per-doc halves are map-side array arithmetic; each vocab
      // half is one distinct + one hash aggregate; the 1-row aggregates
      // meet in scalar broadcast attaches.
      (s, dir) => ngramFingerprintAudit(Tables.documents(s, dir)),
      {
        val fold15 = Corpus.hexFoldDuck("h", 15)
        def foldList(lst: String) =
          s"list_distinct(list_transform(list_transform($lst, x -> substr(md5(x), 1, 15)), h -> $fold15))"
        val g8Duck = s"list_distinct(${Corpus.ngramDuck(8)})"
        Some(s"""WITH t AS (SELECT doc_id, ${TextAnalytics.toksDuck} AS w FROM documents),
                |d AS (SELECT len(${Corpus.shingleDuck}) AS ns5,
                |len(${foldList(Corpus.shingleDuck)}) AS nf5,
                |len($g8Duck) AS ns8,
                |len(${foldList(g8Duck)}) AS nf8 FROM t),
                |pd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                |CAST(sum(CASE WHEN ns5 <> nf5 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected_sh5,
                |CAST(sum(CASE WHEN ns8 <> nf8 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected_g8 FROM d),
                |v5a AS (SELECT DISTINCT unnest(${Corpus.shingleDuck}) AS g FROM t),
                |v5 AS (SELECT CAST(count(*) AS BIGINT) AS n_sh5,
                |CAST(count(DISTINCT ${Corpus.hexFoldDuck("substr(md5(g), 1, 15)", 15)}) AS BIGINT) AS n_sh5_fps FROM v5a),
                |v8a AS (SELECT DISTINCT unnest($g8Duck) AS g FROM t),
                |v8 AS (SELECT CAST(count(*) AS BIGINT) AS n_g8,
                |CAST(count(DISTINCT ${Corpus.hexFoldDuck("substr(md5(g), 1, 15)", 15)}) AS BIGINT) AS n_g8_fps FROM v8a)
                |SELECT n_docs, n_docs_affected_sh5, n_docs_affected_g8,
                |n_sh5, n_sh5_fps, n_sh5 - n_sh5_fps AS n_sh5_collisions,
                |n_g8, n_g8_fps, n_g8 - n_g8_fps AS n_g8_collisions
                |FROM pd, v5, v8""".stripMargin.replace("\n", " "))
      }),

    QueryDef(
      "q267_boilerplate_scrub",
      // BOILERPLATE SCRUB + KEEP-FIRST, COMPOSED (the CCNet/Dolma
      // paragraph-hygiene ladder in one pass): a chunk whose fingerprint
      // appears in >= 3 DISTINCT documents is boilerplate (nav/footer
      // class) and ALL its occurrences drop — including the would-be
      // keep-first winner, which is what distinguishes this from q259's
      // pure dedup; the surviving duplicated chunks then keep-first
      // exactly as q259. Output: per doc, occurrences by fate
      // (boiler/dup-removed/kept) + retained token fraction. Scale
      // shape: stateless map-side chunking, then ONE fp-keyed aggregate
      // computing BOTH signals — count(DISTINCT doc_id) (Spark plans it
      // as the two-level (fp, doc_id) -> fp partial aggregate, so a
      // billion-occurrence boilerplate chunk collapses map-side) and
      // the partial-aggregable min(struct) winner — and the classify
      // join fans out only to the true occurrence count, which is the
      // output's own size. No window anywhere.
      (s, dir) => {
        val ch = Corpus.chunkTokens(Tables.documents(s, dir))
          .withColumn("fp", md5(col("chunk")))
        val d = ch.groupBy("fp").agg(
          countDistinct("doc_id").as("df"),
          min(struct(col("doc_id"), col("chunk_idx"))).as("win"))
        ch.join(d, Seq("fp"))
          .select(col("doc_id"), col("n_tokens"),
            when(col("df") >= 3, "boiler")
              .when(col("win") === struct(col("doc_id"), col("chunk_idx")), "kept")
              .otherwise("dup").as("status"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("status") === "boiler", 1L).otherwise(0L)).as("n_boiler"),
            sum(when(col("status") === "dup", 1L).otherwise(0L)).as("n_dup_removed"),
            sum(when(col("status") === "kept", 1L).otherwise(0L)).as("n_kept"),
            sum("n_tokens").as("total_tokens"),
            sum(when(col("status") === "kept", col("n_tokens")).otherwise(0L)).as("kept_tokens"))
          .withColumn("retained_frac",
            round(col("kept_tokens") * lit(1.0) / col("total_tokens"), 4))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w FROM documents),
             |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |array_to_string(w[i*15+1:i*15+20], ' ') AS chunk,
             |CAST(len(w[i*15+1:i*15+20]) AS BIGINT) AS n_tokens
             |FROM t, LATERAL (SELECT unnest(generate_series(0, (len(w)-1)//15)) AS i) g WHERE len(w) > 0),
             |d AS (SELECT md5(chunk) AS fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             |min(row(doc_id, chunk_idx)) AS win FROM ch GROUP BY 1),
             |cl AS (SELECT c.doc_id, c.n_tokens,
             |CASE WHEN d.df >= 3 THEN 'boiler'
             |WHEN d.win = row(c.doc_id, c.chunk_idx) THEN 'kept'
             |ELSE 'dup' END AS status
             |FROM ch c JOIN d ON md5(c.chunk) = d.fp)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |CAST(sum(CASE WHEN status = 'boiler' THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             |CAST(sum(CASE WHEN status = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_removed,
             |CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |CAST(sum(CASE WHEN status = 'kept' THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
             |round(sum(CASE WHEN status = 'kept' THEN n_tokens ELSE 0 END) * 1.0 / sum(n_tokens), 4) AS retained_frac
             |FROM cl GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")))
  )

  private val qFpAuditOracle =
      Some(s"""WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks FROM documents),
              |d AS (SELECT len(list_distinct(toks)) AS ns,
              |len(list_distinct(list_transform(toks, u -> ${Corpus.hexFoldDuck("substr(md5(u), 1, 15)", 15)}))) AS nf FROM t),
              |pd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |CAST(sum(CASE WHEN ns <> nf THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected FROM d),
              |v0 AS (SELECT DISTINCT unnest(toks) AS u FROM t),
              |v AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab_tokens,
              |CAST(count(DISTINCT ${Corpus.hexFoldDuck("substr(md5(u), 1, 15)", 15)}) AS BIGINT) AS n_vocab_fps FROM v0)
              |SELECT n_docs, n_docs_affected, n_vocab_tokens, n_vocab_fps,
              |n_vocab_tokens - n_vocab_fps AS n_vocab_collisions FROM pd, v""".stripMargin.replace("\n", " "))
}
