package graft

import java.nio.file.{Files, Paths}

/** Machine-checked steady-state benchmark bar (BENCH_LOCAL.md as DATA).
  *
  * The per-query warm reference lives in `tools/bench_ref.json`
  * (committed), regenerated at each round lock on a quiet box via
  * `runMain graft.BenchCheck --write-ref`. `BenchCheck` (no args) then
  * re-runs the two-run protocol and FAILS (exit 1) when a reproducible
  * regression exceeds the documented noise band — red at commit time
  * instead of judge-time prose diffing.
  *
  * Noise model (BENCH_LOCAL.md): per-query jitter on a quiet box is
  * ±0.5 s for scan-bound queries and proportional (up to ~20%) for the
  * iteration-latency-bound graph kernels, so the per-query band is
  * max(0.5 s, 0.2·ref). The whole-registry band is ±15 s. Queries not
  * yet in the reference get the absolute steady-state ceiling: nothing
  * is allowed above 5 s warm (the slowest steady kernels sit at
  * 4.2–5.0 s by design — iteration count × job latency).
  *
  * The checked (and recorded) number is the BEST of the two runs: a
  * single run's tail jitter false-reds ~0.5% of a 434-query registry
  * (measured: one kernel read 0.86 s then 1.44 s back-to-back on an
  * idle box), while a genuine regression inflates BOTH runs — best-of-2
  * keeps the red reproducible without widening the band.
  */
object BenchGuard {
  final case class Violation(name: String, msg: String)

  /** Per-query noise band around the recorded warm reference. */
  def band(ref: Double): Double = math.max(0.5, 0.2 * ref)

  /** The absolute warm ceiling for queries with no reference entry. */
  val Ceiling = 5.0

  /** Whole-registry noise band (seconds) over reference-covered queries. */
  val TotalBand = 15.0

  def check(run2: Map[String, Double],
            ref: Map[String, Double]): Seq[Violation] = {
    val perQuery = run2.toSeq.sortBy(_._1).flatMap { case (n, t) =>
      ref.get(n) match {
        case Some(r) if t > r + band(r) =>
          Some(Violation(n,
            f"warm $t%.2f s exceeds ref $r%.2f s + band ${band(r)}%.2f s"))
        case None if t > Ceiling =>
          Some(Violation(n,
            f"new query warm $t%.2f s exceeds the $Ceiling%.1f s ceiling"))
        case _ => None
      }
    }
    val covered = run2.filter { case (n, _) => ref.contains(n) }
    val total = covered.valuesIterator.sum
    val refTotal = covered.keysIterator.map(ref).sum
    val totalViolation =
      if (covered.nonEmpty && total > refTotal + TotalBand)
        Seq(Violation("TOTAL",
          f"warm total $total%.1f s exceeds ref total $refTotal%.1f s " +
            f"+ $TotalBand%.0f s over ${covered.size} covered queries"))
      else Nil
    perQuery ++ totalViolation
  }

  // --- flat {"name": seconds} JSON I/O (no external deps) ---------------

  def render(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${OracleJson.quote(k)}: $v" }
      .mkString("{\n", ",\n", "\n}\n")

  private val Entry = """"((?:[^"\\]|\\.)*)"\s*:\s*([-0-9.eE+]+)""".r

  def parse(s: String): Map[String, Double] =
    Entry.findAllMatchIn(s)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        -> m.group(2).toDouble)
      .toMap

  def load(path: String): Map[String, Double] =
    parse(Files.readString(Paths.get(path)))

  def write(path: String, m: Map[String, Double]): Unit =
    Files.writeString(Paths.get(path), render(m))
}

/** The bench regression gate: two-run steady-state timing of every
  * registered query against the committed reference, red on anything
  * outside the noise band.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchCheck"                 # check vs ref
  *     sbt "runMain graft.BenchCheck --write-ref"     # regenerate ref
  *     sbt "runMain graft.BenchCheck q1_agg q_topk"   # subset check
  *
  * Self-test hook: SPARK_GRAFT_INJECT_SLOW=<query> sleeps one extra
  * reference-duration after each timed run of that query (a synthetic
  * 2× slowdown) — the documented proof that a real regression goes red.
  */
object BenchCheck {
  val RefPath = "tools/bench_ref.json"

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val writeRef = args.contains("--write-ref")
    val names0 = args.filterNot(_.startsWith("--")).toSeq
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ref =
      if (writeRef) Map.empty[String, Double] else BenchGuard.load(RefPath)
    val injectSlow = sys.env.get("SPARK_GRAFT_INJECT_SLOW")
    val names =
      if (names0.nonEmpty) names0 else SparkEntry.queries.keys.toSeq.sorted

    // same warm-up discipline as graft.Bench: absorb session init and the
    // shared pair index so run1 of the first family member isn't charged
    def materialize(q: String): Unit = {
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Caches.sweep(spark)
    }
    try { materialize("q_topk"); materialize("q3_join_agg") }
    catch { case _: Throwable => () }
    try graft.queries.TextDedup.warmSharedIndex(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.SimIvf.warmSharedIndex(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.GraphShared.warmShared(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.SimMm.warmKnnEdges(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.WinnowShared.warmShared(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.SimShared.warmShared(spark, dir)
    catch { case _: Throwable => () }
    try graft.queries.SnmShared.warmShared(spark, dir)
    catch { case _: Throwable => () }

    val run2 = names.map { q =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        materialize(q)
        if (injectSlow.contains(q))
          Thread.sleep((ref.getOrElse(q, 1.0) * 1000).toLong)
        (System.nanoTime() - t0) / 1e9
      }
      val (cold, warm) = (timed(), timed())
      println(f"TIMING $q $cold%.2f $warm%.2f")
      // best-of-2: robust to single-run tail jitter, still red on a real
      // regression (which inflates both runs — the injection hook does)
      q -> math.min(cold, warm)
    }.toMap
    spark.stop()

    if (writeRef) {
      BenchGuard.write(RefPath, run2)
      println(s"BENCHCHECK wrote ${run2.size} reference entries to $RefPath")
    } else {
      val violations = BenchGuard.check(run2, ref)
      if (violations.isEmpty) {
        val covered = run2.keysIterator.count(ref.contains)
        println(s"BENCHCHECK PASS ${run2.size} queries " +
          s"($covered vs ref, ${run2.size - covered} new under ceiling)")
      } else {
        violations.foreach(v => println(s"BENCHCHECK FAIL ${v.name}: ${v.msg}"))
        sys.exit(1)
      }
    }
  }
}
