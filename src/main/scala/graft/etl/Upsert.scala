package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed keyed upsert ≡ MySQL `INSERT … ON DUPLICATE KEY UPDATE`
  * (services/etlService.js:36-53, 177-194): updates win over base rows on
  * the composite key, last-write-wins.
  *
  * The reference upserts row-batches over a connection; the Spark-native
  * shape is a single shuffle by key — union the two sides with a priority
  * tag and keep the top row per key via a ranking window. AQE handles skewed
  * keys; at 100 TB the same plan feeds a partitioned-overwrite or MERGE INTO
  * sink instead of `coalesce(1)` test output.
  */
object Upsert {

  /** Merge `updates` into `base` on `keys`. Columns are aligned to `base`'s
    * schema. Among multiple updates for one key, `versionCols` (descending)
    * break ties deterministically.
    *
    * The WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT specialization of
    * the unified [[Merge.merge]] (same single-shuffle plan). */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
            versionCols: Seq[String] = Nil): DataFrame =
    Merge.merge(base, updates, keys, versionCols = versionCols)
}
