package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Normalize.upperTrim uppercases and trims") {
    val out = Seq("  foo bar ", "BAZ", null).toDF("s")
      .select(Normalize.upperTrim($"s").as("u")).as[String].collect()
    assert(out.toSeq == Seq("FOO BAR", "BAZ", null))
  }

  test("Normalize.enumOrNull whitelists") {
    val out = Seq("male", " FEMALE ", "x", null).toDF("s")
      .select(Normalize.enumOrNull($"s", Seq("MALE", "FEMALE")).as("u"))
      .as[String].collect()
    assert(out.toSeq == Seq("MALE", "FEMALE", null, null))
  }

  test("Normalize.numOrNull mirrors parseFloat-or-null incl. 0→NULL") {
    val out = Seq("1.5", "abc", "0", null).toDF("s")
      .select(Normalize.numOrNull($"s").as("d")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.5), None, None, None))
  }

  test("Normalize.isoDateOrNull emits yyyy-MM-dd or null") {
    val out = Seq("2024-03-05 10:11:12", "not a date", null).toDF("s")
      .select(Normalize.isoDateOrNull($"s").as("d")).as[String].collect()
    assert(out.toSeq == Seq("2024-03-05", null, null))
  }

  test("Normalize.flag01 and bool01") {
    val f = Seq("1", "0", "yes", null).toDF("s")
      .select(Normalize.flag01($"s").as("f")).as[String].collect()
    assert(f.toSeq == Seq("1", "0", "0", "0"))
    val b = Seq(true, false).toDF("b")
      .select(Normalize.bool01($"b").as("i")).as[Int].collect()
    assert(b.toSeq == Seq(1, 0))
  }

  test("Upsert.merge: updates win, base rows survive, no dup keys") {
    val base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "v", "x")
    val updates = Seq((2, "B2", 21.0), (4, "d", 40.0)).toDF("k", "v", "x")
    val got = Upsert.merge(base, updates, Seq("k")).orderBy("k")
      .as[(Int, String, Double)].collect().toSeq
    assert(got == Seq((1, "a", 10.0), (2, "B2", 21.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("Upsert.merge: versionCols break ties among updates") {
    val base = Seq((1, "old", 0)).toDF("k", "v", "ver")
    val updates = Seq((1, "v1", 1), (1, "v2", 2)).toDF("k", "v", "ver")
    val got = Upsert.merge(base, updates, Seq("k"), versionCols = Seq("ver"))
      .as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "v2", 2)))
  }

  test("Changelog.extract semi-joins distinct non-null keys with cast") {
    val src = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val log = Seq(Some(2), Some(2), Some(3), None).toDF("ref")
    val got = Changelog.extract(src, "id", log, "ref")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "y"), (3L, "z")))
  }

  test("Changelog.dispatch routes a mixed changelog per entity") {
    val cust = Seq((1L, "a"), (2L, "b")).toDF("cid", "name")
    val ord = Seq((10L, 1L), (11L, 2L), (12L, 9L)).toDF("oid", "ocust")
    val log = Seq(("customer", 2L), ("orders", 1L), ("orders", 2L),
      ("voucher", 99L)).toDF("table", "ref")
    val out = Changelog.dispatch(log, "table", "ref", Map(
      "customer" -> ((cust, "cid")), "orders" -> ((ord, "ocust"))))
    assert(out("customer").select("cid", "name")
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    assert(out("orders").select("oid", "ocust").orderBy("oid")
      .as[(Long, Long)].collect().toSeq == Seq((10L, 1L), (11L, 2L)))
    // entities not configured are simply not dispatched
    assert(out.keySet == Set("customer", "orders"))
  }

  test("Quality.keyReport counts processed vs skipped") {
    val df = Seq((Some(1), 5.0), (None, 6.0), (Some(3), -1.0)).toDF("k", "v")
    val r = Quality.keyReport(df, "t", Quality.keysPresent(Seq("k")) && $"v" > 0)
      .as[(String, Long, Long, Long)].collect().head
    assert(r == (("t", 3L, 1L, 2L)))
  }

  test("SnapshotDiff.changes classifies insert/update/delete, drops unchanged") {
    val prev = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "v", "x")
    val curr = Seq((1, "a", 10.0), (2, "B2", 20.0), (4, "d", 40.0)).toDF("k", "v", "x")
    val got = SnapshotDiff.changes(prev, curr, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getString(3))).toSeq
    // key 1 unchanged → absent; 2 updated; 3 deleted (values NULL); 4 inserted
    assert(got == Seq((2, Some("B2"), "update"), (3, None, "delete"), (4, Some("d"), "insert")))
  }

  test("SnapshotDiff.changes treats NULL→NULL as unchanged (null-safe compare)") {
    val prev = Seq((1, None: Option[String]), (2, Some("x"))).toDF("k", "v")
    val curr = Seq((1, None: Option[String]), (2, None: Option[String])).toDF("k", "v")
    val got = SnapshotDiff.changes(prev, curr, Seq("k"))
      .select("k", "change").as[(Int, String)].collect().toSeq
    assert(got == Seq((2, "update")))
  }

  test("SnapshotDiff.applyChanges rebuilds curr in one pass, deletes included") {
    val prev = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val curr = Seq((2, "B2"), (3, "c"), (4, "d")).toDF("k", "v")
    val ch = SnapshotDiff.changes(prev, curr, Seq("k"))
    val rebuilt = SnapshotDiff.applyChanges(prev, ch, Seq("k"))
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(rebuilt == Seq((2, "B2"), (3, "c"), (4, "d")))
  }

  test("SnapshotDiff round-trips through Upsert: applying changes rebuilds curr") {
    val prev = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val curr = Seq((2, "B2"), (3, "c"), (4, "d")).toDF("k", "v")
    val ch = SnapshotDiff.changes(prev, curr, Seq("k")).cache()
    val upserts = ch.where($"change" =!= "delete").select("k", "v")
    val deletes = ch.where($"change" === "delete").select("k")
    val rebuilt = Upsert.merge(prev, upserts, Seq("k"))
      .join(deletes, Seq("k"), "left_anti")
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(rebuilt == Seq((2, "B2"), (3, "c"), (4, "d")))
  }
}
