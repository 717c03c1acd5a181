package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (batch shape; streaming twins live in
  * graft.streaming). Windows order on (ts, id) so results are
  * deterministic even with equal timestamps.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. One shuffle by
    * user; both window passes reuse the same partitioning. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser))
    val marked = events.withColumn("_new_s",
      when(gap.isNull || gap > lit(gapMinutes * 60L), lit(1)).otherwise(lit(0)))
    marked.withColumn("session_id",
      sum(col("_new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_s")
  }

  /** Session summary: events per session + duration in seconds. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapMinutes: Int): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .cast("long").as("dur_sec"))

  /** Tumbling time-window aggregation (batch twin of the streaming
    * windowed agg): bucket by hour via date_trunc. */
  def tumblingAgg(events: DataFrame, tsCol: String, typeCol: String,
                  valueCol: String): DataFrame =
    events.groupBy(
        date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH").as("h"),
        col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total"))

  /** Sliding-window aggregation: `windowMin`-minute windows every
    * `slideMin` minutes via Spark's native `window()` generator. Each
    * event expands to exactly windowMin/slideMin rows IN THE MAP STAGE
    * (a constant factor, not a join against a window spine), then one
    * shuffle on (window, type) — the same cost shape as the tumbling
    * twin times the overlap factor, at any scale. */
  def slidingAgg(events: DataFrame, tsCol: String, typeCol: String,
                 valueCol: String, windowMin: Int, slideMin: Int): DataFrame =
    events.groupBy(
        window(col(tsCol), s"$windowMin minutes", s"$slideMin minutes"),
        col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("wstart"),
        col(typeCol), col("n"), col("total"))
}
