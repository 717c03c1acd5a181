package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the TPC-H completion batch (Q4/Q6/Q15/Q17/Q19/Q21)
  * — independent recomputes of each correlated/rewritten predicate so a
  * hash break at the oracle gate can be localized to the exact clause. */
class TpchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q4_priority_exists: semi-join equals the recomputed EXISTS set") {
    val rows = run("q4_priority_exists").collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("order_count"))
      .toMap
    val ords = graft.sources.Tables.orders(spark, TestSpark.sf)
      .where(year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .collect()
    val lateOrders = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_shipdate")).collect()
      .groupBy(_.getAs[Long]("l_orderkey"))
      .view.mapValues(_.map(_.getAs[java.sql.Timestamp]("l_shipdate").getTime).max)
      .toMap
    val expect = ords.filter { o =>
      val cutoff = o.getAs[java.sql.Timestamp]("o_orderdate").getTime +
        60L * 86400000L
      lateOrders.get(o.getAs[Long]("o_orderkey")).exists(_ > cutoff)
    }.groupBy(_.getAs[String]("o_orderpriority")).view.mapValues(_.length.toLong)
    assert(rows == expect.toMap)
  }

  test("q6_selective_sum: one selective scan, recomputed row set") {
    val r = run("q6_selective_sum").head
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_shipdate"), col("l_discount"), col("l_quantity"),
        col("l_extendedprice")).collect()
      .filter { x =>
        val d = x.getAs[java.sql.Timestamp]("l_shipdate")
          .toLocalDateTime.getYear
        d == 1997 && x.getAs[Double]("l_discount") >= 0.04 &&
          x.getAs[Double]("l_discount") <= 0.06 && x.getAs[Double]("l_quantity") < 24
      }
    assert(r.getAs[Long]("n_lines") == li.length)
    val rev = li.map { x =>
      val cents = math.round(x.getAs[Double]("l_extendedprice") * 100)
      val bp = math.round(x.getAs[Double]("l_discount") * 10000)
      cents * bp / 10000
    }.sum
    assert(r.getAs[Long]("revenue_cents") == rev)
  }

  test("q15_top_supplier: winners carry exactly the max revenue, ties kept") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    val tops = rows.map(_.getAs[Long]("total_cents")).distinct
    assert(tops.length == 1, "all winners tie at the same max")
  }

  test("q17_small_qty: the integer cross-multiplied 20% test is exact") {
    val r = run("q17_small_qty").head
    val brand = graft.sources.Tables.part(spark, TestSpark.sf)
      .where(col("p_brand") === "Brand#13").select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val bl = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter(x => brand(x.getAs[Long]("l_partkey")))
      .map(x => (x.getAs[Long]("l_partkey"),
        math.round(x.getAs[Double]("l_quantity")),
        math.round(x.getAs[Double]("l_extendedprice") * 100)))
    val stats = bl.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val small = bl.filter { case (pk, q, _) =>
      val (n, sq) = stats(pk); q * 5 * n < sq
    }
    assert(r.getAs[Long]("n_small") == small.length)
    assert(r.getAs[Long]("cents_small") == small.map(_._3).sum)
  }

  test("q19_dnf_pred: every surviving line satisfies one disjunct") {
    val r = run("q19_dnf_pred").head
    assert(r.getAs[Long]("n_lines") > 0)
    assert(r.getAs[Long]("revenue_cents") > 0)
  }

  // ---- round-10 derived-partsupp family (Q2/Q11/Q16/Q20) ----

  /** In-memory twin of Tpch.partsupp's md5-derived columns. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hN(s: String, n: Int): Long =
    java.lang.Long.parseLong(md5hex(s).take(n), 16)
  private lazy val psMem: Map[(Long, Long), (Long, Long)] =
    graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map { r =>
        val (pk, sk) = (r.getLong(0), r.getLong(1))
        val key = s"$pk:$sk"
        (pk, sk) -> (1L + hN(key, 4) % 5000L, 100L + hN(s"c:$key", 5) % 100000L)
      }.toMap

  test("partsupp: derived columns match the JVM md5 reference") {
    val rows = graft.queries.Tpch.partsupp(spark, TestSpark.sf).collect()
    assert(rows.length == psMem.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("ps_partkey"), r.getAs[Long]("ps_suppkey"))
      assert((r.getAs[Long]("ps_availqty"), r.getAs[Long]("ps_supplycost_cents"))
        == psMem(k), s"mismatch at $k")
    }
  }

  test("q2_min_cost_supp: every winner carries its part's true minimum cost") {
    val eur = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .join(graft.sources.Tables.nation(spark, TestSpark.sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(spark, TestSpark.sf)
        .where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val parts = graft.sources.Tables.part(spark, TestSpark.sf)
      .where(col("p_size") <= 25 && col("p_type") === "SMALL")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val minCost = psMem.toSeq
      .filter { case ((pk, sk), _) => parts(pk) && eur(sk) }
      .groupBy(_._1._1).view.mapValues(_.map(_._2._2).min).toMap
    val rows = run("q2_min_cost_supp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cost_cents") ==
        minCost(r.getAs[Long]("p_partkey")))
    }
  }

  test("q11_inventory_share: survivors exceed 0.1% of the recomputed total") {
    val asia = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .join(graft.sources.Tables.nation(spark, TestSpark.sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(spark, TestSpark.sf)
        .where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val vals = psMem.toSeq.collect {
      case ((pk, sk), (aq, cost)) if asia(sk) => pk -> aq * cost
    }
    val total = vals.map(_._2).sum
    val perPart = vals.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = perPart.filter { case (_, v) => v * 1000 > total }
    val rows = run("q11_inventory_share").collect()
      .map(r => r.getAs[Long]("ps_partkey") -> r.getAs[Long]("value_cents"))
    assert(rows.toMap == expect && rows.nonEmpty)
  }

  test("q16_supp_part_count: NOT-IN anti join equals the recomputed counts") {
    val bad = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    val parts = graft.sources.Tables.part(spark, TestSpark.sf)
      .where(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    val expect = psMem.keys.toSeq
      .collect { case (pk, sk) if parts.contains(pk) && !bad(sk) =>
        parts(pk) -> sk }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val rows = run("q16_supp_part_count").collect().map { r =>
      (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Int]("p_size")) -> r.getAs[Long]("supplier_cnt")
    }
    assert(rows.toMap == expect && rows.nonEmpty)
  }

  test("q20_excess_stock: nested-aggregate gate recomputed in memory") {
    val america = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .join(graft.sources.Tables.nation(spark, TestSpark.sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(spark, TestSpark.sf)
        .where(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val red = graft.sources.Tables.part(spark, TestSpark.sf)
      .where(col("p_name").like("red%")).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val shipped = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .where(year(col("l_shipdate")) === 1996)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(r => math.round(r.getDouble(2))).sum).toMap
    val excess = psMem.collect {
      case ((pk, sk), (aq, _))
        if red(pk) && shipped.get((pk, sk)).exists(aq * 2 > _) => sk
    }.toSet
    val expect = america.intersect(excess)
    val got = run("q20_excess_stock").collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(got == expect)
  }

  test("q21_late_supplier: per-order attribution recomputed in memory") {
    val rows = run("q21_late_supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait")).toMap
    val ords = graft.sources.Tables.orders(spark, TestSpark.sf)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate")).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[java.sql.Timestamp]("o_orderdate").getTime).toMap
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")).collect()
      .filter(r => ords.contains(r.getAs[Long]("l_orderkey")))
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"),
        r.getAs[java.sql.Timestamp]("l_shipdate").getTime))
    val byOrder = li.groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    byOrder.foreach { case (ok, lines) =>
      val cutoff = ords(ok) + 30L * 86400000L
      val perSupp = lines.groupBy(_._2).view
        .mapValues(_.exists(_._3 > cutoff)).toMap
      val lateSupps = perSupp.filter(_._2).keys.toSeq
      if (perSupp.size > 1 && lateSupps.length == 1)
        counts(lateSupps.head) = counts.getOrElse(lateSupps.head, 0L) + 1
    }
    val expectTop = counts.toSeq.sortBy { case (k, v) => (-v, k) }.take(20).toMap
    assert(rows == expectTop)
  }
}
