package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY.md §2.11: the
  * reference is batch-only, so this is the streaming-capable extension —
  * each transform takes any DataFrame with (ts, user_id, event_type,
  * value), so the SAME function runs on `spark.read` (batch, oracle-checked
  * here) and `spark.readStream` (see graft.streaming.StreamingTwin, which
  * adds watermarks).
  *
  * Scale: tumbling/sliding aggregation is a hash-agg on (window, type) —
  * partial aggregation map-side, one shuffle. Sessionization uses Spark's
  * native session_window (state-store backed in streaming; a window
  * function over user partitions in batch).
  */
object EventWindows {

  /** Tumbling 1-hour counts/sums per event type — sort-free core, legal on
    * both batch and streaming inputs. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Batch/oracle form of [[tumblingAgg]] with deterministic output order. */
  def tumbling(events: DataFrame): DataFrame =
    tumblingAgg(events).orderBy("win_start", "event_type")

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2) —
    * sort-free core, batch or streaming. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Batch/oracle form of [[slidingAgg]] with deterministic output order. */
  def sliding(events: DataFrame): DataFrame =
    slidingAgg(events).orderBy("win_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap) per user, via
    * Spark's native session_window. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q60_tumbling_window",
      (s, dir) => tumbling(Tables.events(s, dir)),
      // Spark's window() aligns to the epoch; date_trunc('hour') is the
      // same alignment for 1-hour tumbling.
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             |event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin.replace("\n", " ")),
      bench = true),

    QueryDef(
      "q61_sliding_window",
      (s, dir) => sliding(Tables.events(s, dir)),
      // Each event belongs to 2 sliding windows: starts at its 30-min
      // bucket and 30 min before. to_timestamp(floor(epoch/1800)*1800)
      // reproduces Spark's epoch-aligned bucketing.
      Some("""WITH x AS (SELECT event_type, value,
             |to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800) AS win_start
             |FROM events, LATERAL (SELECT unnest([0, 1]) AS k) g)
             |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
             |count(*) AS cnt, round(sum(value), 2) AS sum_value
             |FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin.replace("\n", " "))),

    QueryDef(
      "q62_sessionize",
      (s, dir) => sessionize(Tables.events(s, dir)),
      // session_window semantics: an event extends the session iff it is
      // strictly before prev_end = prev_ts + gap; session end = last ts +
      // gap. Reproduced with lag + conditional cumsum.
      Some("""WITH o AS (SELECT user_id, ts, value,
             |lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |FROM events),
             |m AS (SELECT user_id, ts, value,
             |CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) >= 1800000000 THEN 1 ELSE 0 END AS brk
             |FROM o),
             |sid AS (SELECT user_id, ts, value,
             |sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |FROM m)
             |SELECT user_id,
             |strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
             |count(*) AS n_events, round(sum(value), 2) AS sum_value
             |FROM sid GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin.replace("\n", " ")))
  )
}
