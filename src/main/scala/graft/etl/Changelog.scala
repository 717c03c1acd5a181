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
}
