package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture-driven incremental extract.
  *
  * The reference pages a changelog table (`etl_logger_voucher`) and issues a
  * per-key `SELECT * FROM source WHERE reference_no = ?`
  * (models/EtlLogger.js:6-17, services/etlService.js:446-449). At scale the
  * Spark shape is one `LEFT SEMI` join of the source against the *distinct*
  * non-null key set: no row multiplication, map-side partial-distinct, and
  * Catalyst broadcasts the key set when it fits — which CDC key sets
  * typically do even when the fact table is 100 TB.
  */
object Changelog {

  def extract(source: DataFrame, keyCol: String,
              changelog: DataFrame, logKeyCol: String): DataFrame = {
    val keyType = source.schema(keyCol).dataType
    val keys = changelog
      .select(col(logKeyCol).cast(keyType).as(keyCol))
      .where(col(keyCol).isNotNull)
      .distinct()
    source.join(keys, Seq(keyCol), "left_semi")
  }

  /** Multi-table changelog dispatch: one MIXED changelog whose `tableCol`
    * routes each key to its entity (the reference's changelog carries a
    * `table` column and is consumed per entity — models/EtlLogger.js:8-15,
    * services/etlService.js:446-449). Each entity's extract is the
    * `tableCol`-filtered changelog semi-joined against that entity's
    * source; the per-entity filters are partition-prunable predicates on
    * the SAME changelog scan, so a run over k entities reads the changelog
    * once per entity with pushed filters, never k full shuffles of it. */
  def dispatch(changelog: DataFrame, tableCol: String, logKeyCol: String,
               entities: Map[String, (DataFrame, String)]): Map[String, DataFrame] =
    entities.map { case (entity, (source, keyCol)) =>
      entity -> extract(source, keyCol,
        changelog.where(col(tableCol) === entity), logKeyCol)
    }
}
