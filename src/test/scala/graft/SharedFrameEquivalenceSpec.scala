package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-17 equivalence pins for the kernel splits behind the new
  * session-shared frames: each refactor claimed bit-equality with the
  * shape it replaced — these tests hold that claim against the ORIGINAL
  * formulations, re-implemented inline, on sf0.001 data (the oracle
  * gates check the same thing against DuckDB; this spec keeps the
  * equivalence red-at-commit-time without a DuckDB round trip). */
class SharedFrameEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, TestSpark.sf)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("allPairCountsFromArrays ≡ the posting-stream all-pairs form") {
    import graft.ops.Dedup
    val arrs = Dedup.docShingleArrays(docs, "doc_id", "text", 3)
    val fromArrays = Dedup.jaccardFromCounts(
      Dedup.allPairCountsFromArrays(arrs), 0.1)
    // the pre-round-17 shape: ngramJaccardPairs at t=0.1 (< 0.3 → the
    // posting-stream self-join with re-aggregated sizes)
    val original = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1)
    assert(sortedRows(fromArrays) == sortedRows(original))
  }

  test("linkPredPairs: pair set + inter ≡ projectionPairs; weights ≡ the per-entry builds") {
    import graft.ops.Graph
    val sp = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
      .distinct()
    val spc = Graph.cappedVia(sp, "sk", "pk", 64)
    val shared = Graph.linkPredPairs(spc, "sk", "pk")
    assert(sortedRows(shared.select(col("s1"), col("s2"), col("inter")))
      == sortedRows(Graph.projectionPairs(spc, "sk", "pk")))
    // RA reference: the pre-round-17 per-entry build
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val pd = spc.groupBy(col("pk")).agg(count(lit(1)).as("pd"))
    val ra = spc.join(pd, Seq("pk"))
      .select(col("pk"), col("sk").as("s1"), idiv(lit(1000000L), col("pd")).as("w"))
      .join(spc.select(col("pk"), col("sk").as("s2")), Seq("pk"))
      .where(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(sum(col("w")).as("ra_ppm"))
    assert(sortedRows(shared.select(col("s1"), col("s2"), col("ra_ppm")))
      == sortedRows(ra))
    // AA reference, including its pd >= 2 pre-filter
    val pd2 = pd.where(col("pd") >= 2)
    val aa = spc.join(pd2, Seq("pk"))
      .select(col("pk"), col("sk").as("s1"),
        idiv(lit(1000000L), (length(bin(col("pd"))) - 1).cast("long")).as("w"))
      .join(spc.select(col("pk"), col("sk").as("s2")), Seq("pk"))
      .where(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(sum(col("w")).as("aa_ppm"))
    assert(sortedRows(shared.select(col("s1"), col("s2"), col("aa_ppm")))
      == sortedRows(aa))
  }

  test("tf-frame rollups ≡ the explode-based first aggregates") {
    import graft.ops.{TextAnalysis => TA}
    // occurrence counts per token
    val viaTf = graft.queries.TokShared.tf(spark, TestSpark.sf)
      .groupBy(col("tok")).agg(sum(col("tf")).as("n"))
    val direct = docs.select(explode(TA.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    assert(sortedRows(viaTf) == sortedRows(direct))
    // the nonblank flag ≡ the doc-level blank-text guard: per-doc
    // occurrence totals over nonblank docs only
    val viaFlag = graft.queries.TokShared.tf(spark, TestSpark.sf)
      .where(col("nonblank"))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("n"))
    val directGuard = docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(sortedRows(viaFlag) == sortedRows(directGuard))
  }

  test("events_sliding_users island form ≡ the 24x-explode form") {
    val q = graft.SparkEntry.queries("events_sliding_users")(spark, TestSpark.sf)
    val uh = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct()
    val spine = uh.select(col("h").as("sh")).distinct()
    val original = uh.select(col("user_id"),
        explode(sequence(col("h"), col("h") + 23)).as("sh"))
      .join(spine, Seq("sh"), "left_semi")
      .groupBy(col("sh"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_user_hours"))
    assert(sortedRows(q) == sortedRows(original))
  }

  test("q_percentile_disc value-grain form ≡ the row_number form") {
    val q = graft.SparkEntry.queries("q_percentile_disc")(spark, TestSpark.sf)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val n = Window.partitionBy(col("l_returnflag"))
    val original = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(n))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") <= expr("(n + 1) div 2"), col("l_quantity"))).as("p50_disc"),
        max(when(col("rn") <= expr("(9 * n + 9) div 10"), col("l_quantity"))).as("p90_disc"))
    assert(sortedRows(q) == sortedRows(original))
  }
}
