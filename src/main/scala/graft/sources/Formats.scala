package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit readers for the non-parquet source formats an ETL
  * boundary meets (the reference extracts from MySQL; file-based
  * interchange arrives as CSV/JSON lines).
  *
  * Schemas are always passed explicitly: inference reads the data twice
  * and can silently widen types between runs — both unacceptable at scale.
  * `columnNameOfCorruptRecord` rows are kept (PERMISSIVE) so the caller's
  * validation step (graft.etl.Quality) can count and quarantine them, the
  * same processed/skipped split the reference reports.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC — the other columnar interchange format a lakehouse boundary
    * meets (Hive-era warehouses export it). Schema-explicit like the
    * rest: ORC files carry their own schema, but pinning the expected
    * one fails fast on drift instead of silently widening downstream.
    * Predicate pushdown and column pruning work as with parquet. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
