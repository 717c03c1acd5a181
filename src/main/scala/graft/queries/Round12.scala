package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Similarity

/** Round-12 additions: scale-adaptive ANN index builds.
  *
  * The reference (etlService.js:416-591) sizes its batches statically
  * (100k rows, concurrency 4); the engine-side lesson at 100 TB is that
  * index parameters must scale with the data instead — this file holds
  * the operators whose *knobs* are computed from corpus statistics.
  */
object Round12 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Scale-adaptive IVF: cells = autoCells(n) ≈ √n (power of two),
    // centroids trained with one Lloyd round on a deterministic hash
    // SAMPLE of 8·cells vectors (constant per cell at any corpus size),
    // full corpus assigned once against the broadcast trained centroids.
    // At sf0.01 n=500 → 32 cells from a 256-vector sample — the sampled
    // path is genuinely exercised (sample ⊂ corpus).
    "sim_ivf_auto" -> ((s, dir) =>
      Similarity.ivfAutoStats(Tables.embeddings(s, dir),
        "vec_id", "embedding")),

    // HLL register vector via the NATIVE TypedImperativeAggregate
    // (functions/SketchAggregates): the buffer IS the 256-byte sketch,
    // merged element-wise max — no explode, one ObjectHashAggregate
    // partial/final pair, shuffle rows = partitions. Emitted rows are
    // bit-equal to the composed Sketch.hllRegisters kernel (spec-pinned)
    // so the oracle is the same register SQL.
    "q_hll_native" -> ((s, dir) =>
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .agg(graft.functions.SketchAggregates
          .hllRegistersAgg(col("user_id")).as("regs"))
        .select(posexplode(col("regs")).as(Seq("bucket", "m")))
        .where(col("m") > 0)
        .select(col("bucket").cast("long").as("bucket"), col("m"))
        .orderBy(col("bucket"))),

    // CMS 4×1024 counter grid via the native aggregate: buffer = the
    // 4096-cell long array, merged element-wise add. The composed
    // explode form scans ×4 and shuffles up to cells × partitions rows;
    // this shuffles ONE buffer per partition.
    "q_cms_native" -> ((s, dir) =>
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .agg(graft.functions.SketchAggregates
          .cmsSketchAgg(col("user_id")).as("cells"))
        .select(posexplode(col("cells")).as(Seq("i", "cnt")))
        .where(col("cnt") > 0)
        .select(idiv(col("i").cast("long"), lit(1024L)).as("r"),
          pmod(col("i").cast("long"), lit(1024L)).as("bucket"), col("cnt"))
        .orderBy(col("r"), col("bucket")))
  )

  import SimMm.{milliNormCte, cosBpSql, dotmSql}

  val oracle: Map[String, String] = Map(

    "sim_ivf_auto" ->
      s"""WITH $milliNormCte,
         |nrow AS (SELECT count(*) AS n FROM embeddings),
         |cellsc AS (
         |  SELECT coalesce(min(CAST(1 AS BIGINT) << p) FILTER (
         |      WHERE (CAST(1 AS BIGINT) << (2 * p)) >= n), 4096) AS c
         |  FROM (SELECT CAST(r.range AS INTEGER) AS p FROM range(2, 13) r),
         |    nrow),
         |ranked AS (
         |  SELECT vec_id, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
         |  FROM embeddings),
         |samp AS (SELECT vec_id FROM ranked, cellsc WHERE rk <= c * 8),
         |seeds2 AS (SELECT vec_id AS seed_id FROM ranked, cellsc
         |           WHERE rk <= c),
         |sv2 AS (SELECT s.seed_id, m.mq AS smq, m.nsq AS snsq
         |        FROM seeds2 s JOIN miln m ON m.vec_id = s.seed_id),
         |a0 AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, s.seed_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosBpSql(dotmSql("e.mq", "s.smq"), "e.nsq", "s.snsq")} DESC,
         |          s.seed_id) AS rn
         |    FROM (SELECT m.* FROM miln m JOIN samp USING (vec_id)) e
         |    CROSS JOIN sv2 s) t
         |  WHERE rn = 1),
         |comp2 AS (
         |  SELECT vec_id, CAST(d.range AS INTEGER) AS d,
         |    CAST(CAST(round(CAST(embedding[CAST(d.range AS INTEGER) + 1] AS DOUBLE), 3)
         |      AS DECIMAL(7,3)) * 1000 AS BIGINT) AS xq
         |  FROM embeddings CROSS JOIN range(64) d),
         |cent AS (
         |  SELECT cell, d, sum(xq) // count(*) AS cq
         |  FROM a0 JOIN comp2 USING (vec_id) GROUP BY cell, d),
         |dcc AS (SELECT cell, sum(cq * cq) AS dcc FROM cent GROUP BY cell),
         |dxx AS (SELECT vec_id, sum(xq * xq) AS dxx FROM comp2
         |        GROUP BY vec_id),
         |dxc AS (
         |  SELECT c.vec_id, t.cell, sum(c.xq * t.cq) AS dxc
         |  FROM comp2 c JOIN cent t USING (d) GROUP BY c.vec_id, t.cell),
         |af AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT x.vec_id, x.cell, row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY ${cosBpSql("x.dxc", "v.dxx", "k.dcc")} DESC, x.cell) AS rn
         |    FROM dxc x JOIN dxx v USING (vec_id) JOIN dcc k USING (cell)) t
         |  WHERE rn = 1)
         |SELECT f.cell, count(*) AS n, min(f.vec_id) AS min_id,
         |  CAST(floor(sqrt(CAST(k.dcc AS DOUBLE))) AS BIGINT) AS c_norm_milli,
         |  CAST(cc.c AS BIGINT) AS n_cells
         |FROM af f JOIN dcc k USING (cell), cellsc cc
         |GROUP BY f.cell, k.dcc, cc.c ORDER BY f.cell""".stripMargin,

    "q_hll_native" ->
      """WITH h AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT h % 256 AS bucket, h // 256 AS rem FROM h)
        |SELECT bucket,
        |  CAST(max(CASE WHEN rem = 0 THEN 25
        |    ELSE 25 - length(bin(rem)) END) AS BIGINT) AS m
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_cms_native" ->
      s"""WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT CAST(range AS BIGINT) AS r FROM range(4)),
         |h AS (
         |  SELECT r,
         |    ${graft.ops.Sketch.h3Sql(
               "CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
         |      % 1024 AS bucket
         |  FROM ev CROSS JOIN r)
         |SELECT r, bucket, count(*) AS cnt FROM h
         |GROUP BY r, bucket ORDER BY r, bucket""".stripMargin
  )
}
