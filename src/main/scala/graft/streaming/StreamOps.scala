package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the batch operators (SURVEY §2.7).
  *
  * The reference runs its ETL on a cron schedule (index.js:75-86) — the
  * streaming-native re-expression is a continuous query with watermarked
  * event-time state instead of batch re-scans:
  *  - `windowedAgg` twins `events_window_agg` (tumbling window counts/sums)
  *  - `dedupByKey` twins the changelog "process each reference once" /
  *    upsert idempotency (etlService.js:36-53) via watermarked
  *    dropDuplicates
  *  - `cleanStream` twins `etl_clean_events` — stateless transforms apply
  *    unchanged to a streaming frame (same Column kernel).
  *
  * State size is bounded by the watermark: at 100 TB/day the windowed agg
  * keeps only open windows + late-tolerance in the state store.
  */
object StreamOps {

  /** Tumbling event-time window aggregation with a late-data watermark. */
  def windowedAgg(events: DataFrame, tsCol: String, typeCol: String,
                  valueCol: String, windowLen: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col(typeCol), col("n"), col("total"))

  /** Exactly-once key dedup within the watermark horizon: state for a key
    * is evicted once the watermark passes it, so state stays bounded. */
  def dedupByKey(events: DataFrame, tsCol: String, keyCols: Seq[String],
                 watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The batch cleaning kernel applied to a stream — identical Columns
    * (graft.etl.Normalize), proving the transforms are engine-mode
    * agnostic. */
  def cleanStream(events: DataFrame): DataFrame = {
    import graft.etl.Normalize
    events.select(
      col("event_id"),
      Normalize.numOrNull(col("value")).as("val"),
      Normalize.bool01(col("event_type") === "error").as("iserr"),
      Normalize.upperTrim(col("event_type")).as("et"),
      col("ts"))
  }
}
