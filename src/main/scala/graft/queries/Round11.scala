package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Round-11 batch: the exact OPQ rotation capstone (Procrustes-lite
  * Jacobi pass over the checkpointed Gram matrix) promised by the
  * round-10 serpentine permutation. House conventions: integer-exact
  * emitted columns, bounded (≤64-row) ranking frames, a DuckDB oracle
  * twin per query, every idiv operand kept positive so trunc == floor
  * across engines.
  */
object Round11 {

  /** The sim_power_iteration Gram-build fragment: per-row upper-triangle
    * expansion of the milli-quantized vector — ONE O(n·d²) corpus pass,
    * 2080 output cells. */
  private val gramExpr =
    """flatten(transform(sequence(0, 63), i ->
      |  transform(sequence(i, 63), j ->
      |    struct(CAST(i AS BIGINT) AS d1, CAST(j AS BIGINT) AS d2,
      |           mq[i] * mq[j] AS xy))))""".stripMargin

  val queries: Map[String, Q] = Map(

    // OPQ rotation (Procrustes-lite): pair the variance-ranked dims
    // hi↔lo (rank k with rank 63−k — the pairing that minimizes the
    // spread of pair energies), then for each pair apply the best 2×2
    // Givens rotation from a LITERAL 7-angle table (milli cos/sin), the
    // one that most nearly EQUALIZES the pair's rotated variances —
    // var'_a = (c²·v_hi + 2cs·cov + s²·v_lo) div 10⁶ — all integer, so
    // the oracle replays every step bit-exactly (no sqrt, no trig at
    // query time). The rotated dims re-rank and deal serpentine to the
    // 8 PQ subspaces; output = the sim_opq_gain audit shape (per-layout
    // min/max/total energy + imbalance bp) for serpentine-only vs
    // rotate-then-serpentine, so the gain IS the emitted comparison.
    // Scale shape: ONE O(n·d²) Gram pass + one per-dim moment pass
    // (both checkpointed); everything after runs on ≤64-row frames.
    // Angle 0 is the identity, so the rotated layout can never lose to
    // pairing alone; the spec asserts it beats the serpentine baseline.
    "sim_opq_rotate" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir)
        .select(Similarity.milliQuant(col("embedding")).as("mq"))
      val tri = q.select(explode(expr(gramExpr)).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(sum(col("p.xy")).as("sxy"))
        .localCheckpoint(true)
      val sums = q.select(posexplode(col("mq")).as(Seq("d", "x")))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .select(col("d").cast("long").as("d"), col("n"), col("sx"))
        .localCheckpoint(true)
      val vars = tri.where(col("d1") === col("d2"))
        .select(col("d1").as("d"), col("sxy").as("sxx"))
        .join(sums, Seq("d"))
        .select(col("d"), col("n"), col("sx"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("var_n"))
      val ranked = vars
        .withColumn("r",
          (row_number().over(Window.orderBy(col("var_n").desc, col("d"))) - 1)
            .cast("long"))
      val hi = ranked.where(col("r") < 32)
        .select(col("r").as("k"), col("d").as("d_hi"),
          col("var_n").as("v_hi"), col("sx").as("sx_hi"), col("n"))
      val lo = ranked.where(col("r") >= 32)
        .select((lit(63L) - col("r")).as("k"), col("d").as("d_lo"),
          col("var_n").as("v_lo"), col("sx").as("sx_lo"))
      val pr = hi.join(lo, Seq("k"))
        .join(tri,
          least(col("d_hi"), col("d_lo")) === col("d1") &&
            greatest(col("d_hi"), col("d_lo")) === col("d2"))
        .select(col("k"), col("d_hi"), col("d_lo"), col("v_hi"), col("v_lo"),
          (col("n") * col("sxy") - col("sx_hi") * col("sx_lo")).as("c_n"))
      val ang = pr.select(col("*"),
        explode(expr(
          """transform(array(struct(0L, 1000L, 0L), struct(1L, 966L, 259L),
            |  struct(2L, 866L, 500L), struct(3L, 707L, 707L),
            |  struct(4L, 500L, 866L), struct(5L, 259L, 966L),
            |  struct(6L, 0L, 1000L)),
            |  t -> struct(t.col1 AS aid, t.col2 AS c, t.col3 AS s))"""
            .stripMargin)).as("a"))
        .select(col("k"), col("d_hi"), col("d_lo"), col("a.aid").as("aid"),
          idiv(col("a.c") * col("a.c") * col("v_hi")
            + lit(2L) * col("a.c") * col("a.s") * col("c_n")
            + col("a.s") * col("a.s") * col("v_lo"), lit(1000000L)).as("va"),
          idiv(col("a.s") * col("a.s") * col("v_hi")
            - lit(2L) * col("a.c") * col("a.s") * col("c_n")
            + col("a.c") * col("a.c") * col("v_lo"), lit(1000000L)).as("vb"))
      val best = ang
        .withColumn("rn", row_number().over(Window.partitionBy(col("k"))
          .orderBy(abs(col("va") - col("vb")), col("aid"))))
        .where(col("rn") === 1)
      val rvars = best.select(col("d_hi").as("d"), col("va").as("var_n"))
        .unionAll(best.select(col("d_lo").as("d"), col("vb").as("var_n")))
      def serp(v: DataFrame, layout: String) = v
        .withColumn("r",
          (row_number().over(Window.orderBy(col("var_n").desc, col("d"))) - 1)
            .cast("long"))
        .withColumn("sub",
          when(idiv(col("r"), lit(8L)) % 2 === 0, col("r") % 8)
            .otherwise(lit(7L) - col("r") % 8))
        .groupBy(col("sub")).agg(sum(col("var_n")).as("e"))
        .withColumn("layout", lit(layout))
      serp(vars.select(col("d"), col("var_n")), "serpentine")
        .unionByName(serp(rvars, "rotated"))
        .groupBy(col("layout"))
        .agg(min(col("e")).as("min_energy"), max(col("e")).as("max_energy"),
          sum(col("e")).as("total_var"))
        .withColumn("imbalance_bp",
          idiv(col("max_energy") * 10000, col("min_energy")))
        .orderBy(col("layout"))
    }))

  val oracle: Map[String, String] = Map(

    "sim_opq_rotate" ->
      """WITH mil AS (SELECT list_transform(embedding,
        |    x -> CAST(CAST(round(CAST(x AS DOUBLE), 3) AS DECIMAL(7,3)) * 1000 AS BIGINT)) AS mq
        |  FROM embeddings),
        |p AS (
        |  SELECT CAST(i.range AS BIGINT) AS d1, CAST(j.range AS BIGINT) AS d2,
        |    mq[CAST(i.range AS INTEGER) + 1] * mq[CAST(j.range AS INTEGER) + 1] AS xy
        |  FROM mil CROSS JOIN range(64) i CROSS JOIN range(64) j
        |  WHERE j.range >= i.range),
        |tri AS (SELECT d1, d2, CAST(sum(xy) AS BIGINT) AS sxy
        |        FROM p GROUP BY d1, d2),
        |sums AS (SELECT CAST(d.range AS BIGINT) AS d, count(*) AS n,
        |    CAST(sum(mq[CAST(d.range AS INTEGER) + 1]) AS BIGINT) AS sx
        |  FROM mil CROSS JOIN range(64) d GROUP BY 1),
        |vars AS (SELECT s.d, s.n, s.sx,
        |    CAST(s.n * t.sxy - s.sx * s.sx AS BIGINT) AS var_n
        |  FROM sums s JOIN tri t ON t.d1 = s.d AND t.d2 = s.d),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY var_n DESC, d) - 1 AS BIGINT) AS r
        |  FROM vars),
        |hi AS (SELECT r AS k, d AS d_hi, var_n AS v_hi, sx AS sx_hi, n
        |       FROM ranked WHERE r < 32),
        |lo AS (SELECT 63 - r AS k, d AS d_lo, var_n AS v_lo, sx AS sx_lo
        |       FROM ranked WHERE r >= 32),
        |pr AS (SELECT hi.k, hi.d_hi, lo.d_lo, hi.v_hi, lo.v_lo,
        |    CAST(hi.n * t.sxy - hi.sx_hi * lo.sx_lo AS BIGINT) AS c_n
        |  FROM hi JOIN lo USING (k)
        |  JOIN tri t ON t.d1 = least(hi.d_hi, lo.d_lo)
        |            AND t.d2 = greatest(hi.d_hi, lo.d_lo)),
        |ang AS (SELECT CAST(aid AS BIGINT) AS aid, CAST(c AS BIGINT) AS c,
        |    CAST(s AS BIGINT) AS s
        |  FROM (VALUES (0, 1000, 0), (1, 966, 259), (2, 866, 500),
        |        (3, 707, 707), (4, 500, 866), (5, 259, 966),
        |        (6, 0, 1000)) a(aid, c, s)),
        |rot AS (SELECT k, d_hi, d_lo, aid,
        |    (c*c*v_hi + 2*c*s*c_n + s*s*v_lo) // 1000000 AS va,
        |    (s*s*v_hi - 2*c*s*c_n + c*c*v_lo) // 1000000 AS vb
        |  FROM pr CROSS JOIN ang),
        |best AS (SELECT * FROM (SELECT k, d_hi, d_lo, va, vb,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY abs(va - vb), aid) AS rn FROM rot) z WHERE rn = 1),
        |rvars AS (SELECT d_hi AS d, va AS var_n FROM best
        |          UNION ALL SELECT d_lo, vb FROM best),
        |rrank AS (SELECT var_n,
        |    row_number() OVER (ORDER BY var_n DESC, d) - 1 AS r FROM rvars),
        |rsub AS (SELECT var_n, CASE WHEN (r // 8) % 2 = 0 THEN r % 8
        |    ELSE 7 - r % 8 END AS sub FROM rrank),
        |ssub AS (SELECT var_n, CASE WHEN (r // 8) % 2 = 0 THEN r % 8
        |    ELSE 7 - r % 8 END AS sub FROM ranked),
        |u AS (SELECT 'rotated' AS layout, sub, sum(var_n) AS e
        |      FROM rsub GROUP BY 2
        |      UNION ALL SELECT 'serpentine', sub, sum(var_n)
        |      FROM ssub GROUP BY 2)
        |SELECT layout, CAST(min(e) AS BIGINT) AS min_energy,
        |  CAST(max(e) AS BIGINT) AS max_energy,
        |  CAST(sum(e) AS BIGINT) AS total_var,
        |  CAST(max(e) * 10000 // min(e) AS BIGINT) AS imbalance_bp
        |FROM u GROUP BY layout ORDER BY layout""".stripMargin)
}
