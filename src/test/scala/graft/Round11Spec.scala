package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_opq_rotate: rotation beats the serpentine baseline; energy conserved") {
    val rows = run("sim_opq_rotate").collect()
      .map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("min_energy"), r.getAs[Long]("max_energy"),
          r.getAs[Long]("total_var"), r.getAs[Long]("imbalance_bp")))).toMap
    assert(rows.keySet == Set("rotated", "serpentine"))
    val (rot, ser) = (rows("rotated"), rows("serpentine"))
    // the point of the capstone: rotate-then-serpentine must balance
    // subspace energy at least as well as the permutation alone
    // (angle 0 = identity guarantees it can never lose to pairing)
    assert(rot._4 <= ser._4,
      s"rotated imbalance ${rot._4} bp > serpentine ${ser._4} bp")
    // a near-orthogonal rotation preserves total energy: the 7-angle
    // table's worst c²+s² error is 237 ppm, plus ≤1 truncation per dim
    val drift = math.abs(rot._3 - ser._3).toDouble / ser._3.toDouble
    assert(drift < 0.01, s"total energy drifted ${drift * 100}% under rotation")
    // sanity: both layouts partition all 64 dims (8 subspaces, min ≤ max)
    assert(rot._1 <= rot._2 && ser._1 <= ser._2)
  }

  test("sim_opq_rotate: per-pair equalization really narrows the variance spread") {
    // JVM twin of the pairing+rotation stage at the variance level:
    // after pairing rank k with rank 63-k and equalizing within pairs,
    // the max/min spread over dim variances can only shrink
    val q = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(graft.ops.Similarity.milliQuant(col("embedding")).as("mq"))
    val n = q.count()
    val moments = q.select(posexplode(col("mq")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .collect().map(r => (r.getAs[Int]("d"),
        n * r.getAs[Long]("sxx") - r.getAs[Long]("sx") * r.getAs[Long]("sx")))
    val vars = moments.sortBy(m => (-m._2, m._1)).map(_._2)
    val pairMeans = (0 until 32).map(k => (vars(k) + vars(63 - k)) / 2)
    assert(pairMeans.max - pairMeans.min <= vars.max - vars.min,
      "hi-lo pairing narrows the energy spread")
    // and the registered query's rotated energies live inside the
    // original variance envelope (no pair can exceed its own extremes)
    val imb = run("sim_opq_rotate").collect()
      .map(r => r.getAs[String]("layout") -> r.getAs[Long]("imbalance_bp")).toMap
    assert(imb("rotated") >= 10000L, "imbalance is max/min ≥ 1")
  }
}
