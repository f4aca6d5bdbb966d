package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 corpus operators: chunk-granularity deduplication — the
  * granularity production web-corpus pipelines actually dedup at
  * (paragraph/line-level exact dedup à la CCNet / RefinedWeb), mapped
  * back to per-document retention so downstream mixing can reason about
  * what survived. The reference's own dedup is whole-record keep-first
  * (scrappy.py:316,334-335); chunk-level is the "beyond the reference"
  * training-pipeline extension of the same keep-first contract.
  */
object Corpus11 {

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
      // hash shuffle keyed on the 128-bit chunk fingerprint; the
      // keep-first window runs inside fingerprint groups (duplicate
      // count per fingerprint, never corpus-sized), and the per-doc
      // rollup is a doc-keyed hash aggregate. Nothing quadratic, no
      // data-sized window — the same plan runs at 100 TB with the
      // fingerprint shuffle as the only corpus-sized exchange.
      (s, dir) => {
        val ch = Corpus.chunkTokens(Tables.documents(s, dir))
        val kept = ch.withColumn("kept",
          row_number().over(
            Window.partitionBy(md5(col("chunk")))
              .orderBy("doc_id", "chunk_idx")) === 1)
        kept.groupBy("doc_id").agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum("n_tokens").as("total_tokens"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"),
          round(sum(when(col("kept"), col("n_tokens")).otherwise(0L)) * lit(1.0) /
            sum("n_tokens"), 4).as("retained_frac"))
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
             |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")))
  )
}
