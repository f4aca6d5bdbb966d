package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** North-star multimodal columns: media as opaque `binary` payloads with
  * typed metadata (BASELINE.json). The testdata has no real media, so the
  * payload is the document text's bytes; the DECODE step is a clearly
  * marked stub — everything around it (pinned schema, typed Encoders,
  * partition-batched iteration, metadata struct shape) is the real
  * plumbing a codec would drop into.
  *
  * Scale: payloads never shuffle — decode is a mapPartitions over the scan
  * (predicate/projection pushdown still applies to the metadata columns);
  * per-partition batching amortizes codec init exactly like an Arrow-batch
  * UDF would. Frame sampling is pure Catalyst (sequence + explode).
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, format: String)

  /** Wrap documents as a media table: binary payload + kind. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decode, deterministic from the payload bytes. A real deployment
    * replaces `decodeOne` with an actual codec (e.g. JPEG dims from the
    * header); the mapPartitions shape — one codec instance per partition,
    * streaming iterator, no per-row setup — is what carries to 100 TB. */
  def decodeBatch(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec init would happen here, once per partition
      it.map(decodeOne)
    }
  }

  private def decodeOne(m: MediaRecord): DecodedMedia = {
    // ??? real codec goes here; stub derives dims from byte content.
    val n = m.payload.length.toLong
    // First Unicode CODEPOINT of the UTF-8-decoded payload — the same
    // value the q80 expression twin's ascii(cast(payload AS STRING))
    // computes, so the two paths agree on non-ASCII payloads too
    // (MultimodalSpec pins a non-ASCII row).
    val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
    val first = if (s.nonEmpty) s.codePointAt(0) else 0
    DecodedMedia(m.media_id, m.kind, n,
      width = (n % 640).toInt, height = first,
      format = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp")
  }

  /** Video-style frame sampling: every `stride`-th frame index of a fake
    * frame count derived from payload size. Pure Catalyst. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_frames", (length(col("payload")) % 24 + 1).cast("int"))
      .select(col("media_id"),
        explode(expr(s"filter(sequence(0, n_frames - 1), i -> i % $stride = 0)")).as("frame_idx"))

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q80_multimodal_meta",
      // Expression-only twin of the stub decode (the mapPartitions path is
      // asserted equal to this in MultimodalSpec) so metadata extraction is
      // oracle-checkable.
      (s, dir) =>
        toMediaTable(Tables.documents(s, dir))
          .select(
            col("media_id"), col("kind"),
            length(col("payload")).cast("long").as("n_bytes"),
            (length(col("payload")) % 640).cast("long").as("width"),
            expr("CASE WHEN length(payload) > 0 THEN ascii(substring(cast(payload AS STRING), 1, 1)) ELSE 0 END")
              .cast("long").as("height"),
            expr("CASE WHEN length(payload) % 3 = 0 THEN 'png' WHEN length(payload) % 3 = 1 THEN 'jpeg' ELSE 'webp' END")
              .as("format"))
          .orderBy("media_id"),
      Some("""WITH m AS (SELECT doc_id AS media_id, 'image' AS kind, encode(text) AS payload FROM documents)
             |SELECT media_id, kind,
             |octet_length(payload) AS n_bytes,
             |octet_length(payload) % 640 AS width,
             |CASE WHEN octet_length(payload) > 0 THEN ascii(substr(decode(payload), 1, 1)) ELSE 0 END AS height,
             |CASE WHEN octet_length(payload) % 3 = 0 THEN 'png'
             |WHEN octet_length(payload) % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format
             |FROM m ORDER BY media_id""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q81_frame_sample",
      (s, dir) =>
        frameSample(toMediaTable(Tables.documents(s, dir)), 4)
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
          .orderBy("media_id", "frame_idx"),
      Some("""WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) % 24 + 1 AS n_frames FROM documents)
             |SELECT media_id, CAST(i AS BIGINT) AS frame_idx
             |FROM m, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS i) g
             |WHERE i % 4 = 0 ORDER BY media_id, frame_idx""".stripMargin.replace("\n", " ")))
  )
}
