package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Clause-by-clause pins for the unified MERGE INTO surface
  * (graft.etl.Merge) and its stored-table twin
  * (KeyedParquetSink.mergeInto). */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def target: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
  }

  private def rows(df: DataFrame): Set[(Long, String, Double)] = {
    import spark.implicits._
    df.select($"k", $"name", $"v").as[(Long, String, Double)].collect().toSet
  }

  test("default merge = upsert: matched rows updated, unmatched inserted") {
    import spark.implicits._
    val src = Seq((2L, "b2", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    assert(rows(Merge.merge(target, src, Seq("k"))) ==
      Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("updateMatched=false: insert-only merge preserves existing rows") {
    import spark.implicits._
    val src = Seq((2L, "CLOBBER", 0.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    assert(rows(Merge.merge(target, src, Seq("k"), updateMatched = false)) ==
      Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("insertUnmatched=false: update-only merge drops unknown source keys") {
    import spark.implicits._
    val src = Seq((2L, "b2", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    assert(rows(Merge.merge(target, src, Seq("k"), insertUnmatched = false)) ==
      Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
  }

  test("deleteCond drops matched keys; a delete for an absent key is a no-op") {
    import spark.implicits._
    // the CDC shape: source carries a `change` marker column the target
    // lacks — deleteCond reads it before column alignment
    val src = Seq((2L, "b", 20.0, "delete"), (4L, "d", 40.0, "insert"),
      (9L, "zz", 0.0, "delete")).toDF("k", "name", "v", "change")
    assert(rows(Merge.merge(target, src, Seq("k"),
        deleteCond = Some(col("change") === "delete"))) ==
      Set((1L, "a", 10.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("versionCols pick the winner among multiple source rows per key") {
    import spark.implicits._
    val src = Seq((2L, "old", 1.0), (2L, "new", 2.0)).toDF("k", "name", "v")
    assert(rows(Merge.merge(target, src, Seq("k"), versionCols = Seq("v")))
      .contains((2L, "new", 2.0)))
  }

  test("mergeInto drops a fully-deleted bucket — deleted keys cannot resurrect") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-mergedel").toString + "/t"
    // many buckets => each key is alone in its bucket, so deleting one
    // key empties its whole partition (the dynamic-overwrite blind spot)
    graft.sinks.KeyedParquetSink.write(target, path, Seq("k"), 64)
    val src = Seq((2L, "b", 20.0, "delete")).toDF("k", "name", "v", "change")
    graft.sinks.KeyedParquetSink.mergeInto(spark, path, src, Seq("k"), 64,
      deleteCond = Some(col("change") === "delete"))
    assert(rows(graft.sinks.KeyedParquetSink.read(spark, path)) ==
      Set((1L, "a", 10.0), (3L, "c", 30.0)))
  }

  test("mergeInto applies update+insert+delete to the stored keyed table") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-mergeinto").toString + "/t"
    graft.sinks.KeyedParquetSink.write(target, path, Seq("k"), 4)
    val src = Seq((1L, "a1", 11.0, "update"), (3L, "c", 30.0, "delete"),
      (5L, "e", 50.0, "insert")).toDF("k", "name", "v", "change")
    graft.sinks.KeyedParquetSink.mergeInto(spark, path, src, Seq("k"), 4,
      deleteCond = Some(col("change") === "delete"))
    assert(rows(graft.sinks.KeyedParquetSink.read(spark, path)) ==
      Set((1L, "a1", 11.0), (2L, "b", 20.0), (5L, "e", 50.0)))
  }
}
