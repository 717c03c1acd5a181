package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_kmv_set_ops: sketch estimates bracket the exact set algebra") {
    val r = run("q_kmv_set_ops").collect().head
    val (ka, kb) = (r.getAs[Long]("ka"), r.getAs[Long]("kb"))
    assert(ka <= 64 && kb <= 64, "retained hash counts bounded by k")
    assert(r.getAs[Long]("n_match") <= math.min(ka, kb),
      "matches are a subset of both retained sets")
    // unsaturated sketches degenerate to exact sets: estimates == exact
    if (ka < 64 && kb < 64 && r.getAs[Long]("theta") == 4294967296L) {
      assert(r.getAs[Long]("est_inter") == r.getAs[Long]("exact_inter"),
        "θ = 2³² means the sketch IS the set — intersection must be exact")
    }
    // jaccard relations: inter ≤ union on both the exact and est sides
    assert(r.getAs[Long]("exact_inter") <= r.getAs[Long]("exact_union"))
    assert(r.getAs[Long]("jaccard_exact_bp") <= 10000L)
    assert(r.getAs[Long]("est_inter") >= 0 && r.getAs[Long]("est_union") >= 0)
  }

  test("dedup_pr_audit: confusion-matrix identities hold against the kernels") {
    val r = run("dedup_pr_audit").collect().head
    val (nc, nt, tp) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"),
      r.getAs[Long]("tp"))
    assert(tp <= nc && tp <= nt)
    assert(r.getAs[Long]("fp") == nc - tp && r.getAs[Long]("fn") == nt - tp)
    assert(r.getAs[Long]("precision_bp") <= 10000L &&
      r.getAs[Long]("recall_bp") <= 10000L)
    // the truth side is the shared t=0.5 pair index — count must agree
    val truth = graft.queries.TextDedup.sharedPairs05(spark, TestSpark.sf)
      .count()
    assert(nt == truth, "n_truth drifted from the shared pair index")
    // every truth pair is an exact-Jaccard ≥ 0.5 pair; the 8-seed,
    // 4-row banding recalls 4285 bp on the sf0.001 fixture and 7200 bp
    // at sf0.01 — the audit exists to surface exactly that number, so
    // the spec pins only a collapse floor
    assert(tp * 10000 / math.max(nt, 1) >= 2000,
      "LSH recall collapsed below 20% of the t=0.5 truth pairs")
  }

  test("sim_ivfpq_recall: cell recall dominates global recall") {
    val r = run("sim_ivfpq_recall").collect().head
    assert(r.getAs[Long]("n_ann") == 10)
    val (g, c) = (r.getAs[Long]("n_hits"), r.getAs[Long]("n_hits_cell"))
    assert(g >= 0 && g <= 10 && c >= 0 && c <= 10)
    // the ANN candidates all live in the query's cell, so they can only
    // match the in-cell exact list at least as often as the global one
    // when the global exact list is partly outside the cell
    assert(c >= g,
      "in-cell recall must not trail global recall on a cell-pruned search")
    assert(r.getAs[Long]("recall_bp") == g * 1000 &&
      r.getAs[Long]("cell_recall_bp") == c * 1000)
  }
}
