package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2.11 extension): per-user running
  * aggregates via flatMapGroupsWithState — the primitive behind
  * session-stores, online feature counters, and dedup horizons that
  * windowed aggregation can't express.
  *
  * State is keyed by user_id → partitioned across executors; at 100 TB of
  * stream history the state store holds one small record per active key,
  * checkpointed incrementally.
  */
object StatefulOps {

  final case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class UserStat(user_id: Long, n_events: Long, sum_value: Double)

  def runningStats(events: Dataset[Ev]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStat, UserStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserStat(user, n, s)
          state.update(next)
          Iterator(next)
      }
  }

  /** Batch twin for equivalence tests. */
  def runningStatsBatch(spark: SparkSession, dir: String): Dataset[UserStat] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .as[UserStat]
  }
}
