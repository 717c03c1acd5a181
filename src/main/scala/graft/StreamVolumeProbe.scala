package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{CdcOp, PitEvent, StreamOps}

/** Volume stress for the stateful streaming operators — the streaming
  * twin of ScaleProbe: drives asofStream / bitmapDistinctStream /
  * bandJoinStream at `SPARK_GRAFT_SCALE_MULT`× the sf0.1 event volume
  * and MEASURES throughput (rows/s) and the state-store footprint
  * (max rows / bytes across progress events), so the bounded-state
  * claims in SURVEY §5 are numbers, not prose.
  *
  * Growth shapes mirror the batch probes:
  *  - asofStream: users are SALTED (more users, constant per-user
  *    activity — the realistic firehose shape); total state grows with
  *    live users but the PER-USER footprint must stay flat.
  *  - bitmapDistinctStream: keys salted; the per-day bitmap is ≤width
  *    bits NO MATTER the key volume — total state must stay FLAT.
  *  - bandJoinStream: replicas are span-shifted (constant event density
  *    per hour), so in-horizon state must stay FLAT while output pairs
  *    grow ∝ mult.
  */
object StreamVolumeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.getOrElse("SPARK_GRAFT_SCALE_CASES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    def enabled(tag: String): Boolean = only.isEmpty || only(tag)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    def footprint(q: StreamingQuery): (Long, Long) = {
      val sos = q.recentProgress.flatMap(_.stateOperators)
      if (sos.isEmpty) (0L, 0L)
      else (sos.map(_.numRowsTotal).max, sos.map(_.memoryUsedBytes).max)
    }

    // base events (ms-epoch longs on the driver; ~40k label/feat rows at
    // sf0.1) — each case expands chunks lazily so only one expanded
    // chunk is resident at a time
    val base = graft.sources.Tables.events(spark, dir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._3)
    val spanMs = (base.last._3 - base.head._3) / 1000L + 1L
    println(s"STREAMVOL mult=$mult base_rows=${base.length} span_ms=$spanMs")

    // --- asofStream: salted users, time-chunked feed ------------------
    if (enabled("asof")) {
      val pit = base.filter(e => e._4 == "click" || e._4 == "purchase")
      val input = MemoryStream[PitEvent]
      val q = StreamOps.asofStream(input.toDF(), watermark = "1 hour")
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_pit").start()
      val t0 = System.nanoTime()
      var fed = 0L
      pit.grouped(pit.length / 16 + 1).foreach { chunk =>
        val expanded = chunk.flatMap { case (id, u, us, et, cents) =>
          (0 until mult).map { r =>
            PitEvent(u * mult + r, new java.sql.Timestamp(us / 1000L),
              if (et == "purchase") "label" else "feat", id * mult + r, cents)
          }
        }
        fed += expanded.length
        input.addData(expanded)
        q.processAllAvailable()
      }
      input.addData(PitEvent(-1L,
        new java.sql.Timestamp(base.last._3 / 1000L + 86400000L),
        "feat", -1L, 0L))
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val outRows = spark.table("vol_pit").count()
      q.stop()
      val users = pit.map(_._2).distinct.length.toLong * mult
      println(f"STREAMVOL asof rows=$fed out=$outRows $sec%.1f s " +
        f"${fed / sec}%.0f rows/s state_rows=$srows state_bytes=$sbytes " +
        f"bytes_per_user=${sbytes / math.max(users, 1L)}")
    }

    // --- cdcAnomalyStream: salted keys, time-chunked feed -------------
    // State is ONE carried op per key after its buffer drains, so
    // state_rows must track live-key cardinality (× mult) while
    // bytes/key stays ~constant — the O(live keys) claim, measured.
    if (enabled("cdc")) {
      val ops = base.filter(e =>
        e._4 == "signup" || e._4 == "purchase" || e._4 == "error")
      val input = MemoryStream[CdcOp]
      val q = StreamOps.cdcAnomalyStream(input.toDF(), watermark = "1 hour")
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_cdc").start()
      val t0 = System.nanoTime()
      var fed = 0L
      ops.grouped(ops.length / 16 + 1).foreach { chunk =>
        val expanded = chunk.flatMap { case (id, u, us, et, _) =>
          (0 until mult).map { r =>
            CdcOp(u * mult + r, new java.sql.Timestamp(us / 1000L),
              id * mult + r,
              if (et == "signup") "i" else if (et == "purchase") "u" else "d")
          }
        }
        fed += expanded.length
        input.addData(expanded)
        q.processAllAvailable()
      }
      input.addData(CdcOp(-1L,
        new java.sql.Timestamp(base.last._3 / 1000L + 86400000L), -1L, "i"))
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val outRows = spark.table("vol_cdc").count()
      q.stop()
      val keys = ops.map(_._2).distinct.length.toLong * mult
      println(f"STREAMVOL cdc rows=$fed out=$outRows $sec%.1f s " +
        f"${fed / sec}%.0f rows/s state_rows=$srows state_bytes=$sbytes " +
        f"keys=$keys bytes_per_key=${sbytes / math.max(keys, 1L)}")
    }

    // --- asofStream + idleTtlSec: churning user base ------------------
    // Each replica is a DISJOINT user cohort active for one span, then
    // silent forever — the churn shape where the default (dominant
    // feature row lives forever) grows state ∝ users EVER seen. With
    // the TTL at one span, cohort r evicts while cohort r+2 streams:
    // state must PLATEAU near two cohorts, with evictions surfaced as
    // label_id = -1 sentinels (never silent).
    if (enabled("asof_ttl")) {
      val pit = base.filter(e => e._4 == "click" || e._4 == "purchase")
      val ttlSec = spanMs / 1000L
      val input = MemoryStream[PitEvent]
      val q = StreamOps.asofStream(input.toDF(), watermark = "1 hour",
          idleTtlSec = Some(ttlSec))
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_pit_ttl").start()
      val t0 = System.nanoTime()
      var fed = 0L
      var firstRows = 0L; var lastRows = 0L
      (0 until mult).foreach { r =>
        val shift = r.toLong * spanMs
        pit.grouped(pit.length / 4 + 1).foreach { chunk =>
          val cohort = chunk.map { case (id, u, us, et, cents) =>
            PitEvent(u * mult + r,
              new java.sql.Timestamp(us / 1000L + shift),
              if (et == "purchase") "label" else "feat", id * mult + r, cents)
          }
          fed += cohort.length
          input.addData(cohort)
          q.processAllAvailable()
        }
        val rows = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsTotal).lastOption.getOrElse(0L)
        if (r == 0) firstRows = rows
        lastRows = rows
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val evicted = spark.table("vol_pit_ttl")
        .where(col("label_id") === -1L).count()
      val outRows = spark.table("vol_pit_ttl")
        .where(col("label_id") =!= -1L).count()
      q.stop()
      println(f"STREAMVOL asof_ttl rows=$fed out=$outRows evicted=$evicted " +
        f"$sec%.1f s ${fed / sec}%.0f rows/s state_rows_max=$srows " +
        f"state_bytes_max=$sbytes state_rows_rep1=$firstRows " +
        f"state_rows_repN=$lastRows")
    }

    // --- cdcAnomalyStream + idleTtlSec: churning key domain -----------
    // Each replica is a DISJOINT key cohort active for one span, then
    // silent forever — the churn shape where the default (carried op
    // per key forever) grows state ∝ keys EVER seen. With the TTL at
    // one span, cohort r evicts while cohort r+2 streams: state must
    // PLATEAU near two cohorts, evictions surfaced as state_evicted
    // sentinels (never silent).
    if (enabled("cdc_ttl")) {
      val ops = base.filter(e =>
        e._4 == "signup" || e._4 == "purchase" || e._4 == "error")
      val ttlSec = spanMs / 1000L
      val input = MemoryStream[CdcOp]
      val q = StreamOps.cdcAnomalyStream(input.toDF(), watermark = "1 hour",
          idleTtlSec = Some(ttlSec))
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_cdc_ttl").start()
      val t0 = System.nanoTime()
      var fed = 0L
      var firstRows = 0L; var lastRows = 0L
      (0 until mult).foreach { r =>
        val shift = r.toLong * spanMs
        ops.grouped(ops.length / 4 + 1).foreach { chunk =>
          val cohort = chunk.map { case (id, u, us, et, _) =>
            CdcOp(u * mult + r,
              new java.sql.Timestamp(us / 1000L + shift), id * mult + r,
              if (et == "signup") "i" else if (et == "purchase") "u" else "d")
          }
          fed += cohort.length
          input.addData(cohort)
          q.processAllAvailable()
        }
        val rows = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsTotal).lastOption.getOrElse(0L)
        if (r == 0) firstRows = rows
        lastRows = rows
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val evicted = spark.table("vol_cdc_ttl")
        .where(col("violation") === "state_evicted").count()
      val outRows = spark.table("vol_cdc_ttl")
        .where(col("violation") =!= "state_evicted").count()
      q.stop()
      println(f"STREAMVOL cdc_ttl rows=$fed out=$outRows evicted=$evicted " +
        f"$sec%.1f s ${fed / sec}%.0f rows/s state_rows_max=$srows " +
        f"state_bytes_max=$sbytes state_rows_rep1=$firstRows " +
        f"state_rows_repN=$lastRows")
    }

    // --- bitmapDistinctStream: salted keys, rep-ordered feed ----------
    if (enabled("bitmap")) {
      val input = MemoryStream[(java.sql.Timestamp, Long)]
      val q = StreamOps.bitmapDistinctStream(input.toDF().toDF("ts", "k"), "ts", "k")
        .writeStream.outputMode("update").format("memory")
        .queryName("vol_bmd").start()
      val t0 = System.nanoTime()
      var fed = 0L
      (0 until mult).foreach { r =>
        val chunk = base.map { case (_, u, us, _, _) =>
          (new java.sql.Timestamp(us / 1000L), u * mult + r)
        }
        fed += chunk.length
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      q.stop()
      println(f"STREAMVOL bitmap rows=$fed $sec%.1f s ${fed / sec}%.0f rows/s " +
        s"state_rows=$srows state_bytes=$sbytes")
    }

    // --- bandJoinStream: span-shifted replicas, rep-ordered feed ------
    if (enabled("band")) {
      val la = MemoryStream[(Long, java.sql.Timestamp)]
      val lb = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val errs = base.filter(_._4 == "error")
      val purch = base.filter(_._4 == "purchase")
      val q = StreamOps.bandJoinStream(
          la.toDF().toDF("event_id", "ts"),
          lb.toDF().toDF("event_id", "user_id", "ts"), 600L)
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_band").start()
      val t0 = System.nanoTime()
      var fed = 0L
      (0 until mult).foreach { r =>
        val shift = r.toLong * spanMs
        val ca = errs.map { case (id, _, us, _, _) =>
          (id * mult + r, new java.sql.Timestamp(us / 1000L + shift)) }
        val cb = purch.map { case (id, u, us, _, _) =>
          (id * mult + r, u, new java.sql.Timestamp(us / 1000L + shift)) }
        fed += ca.length + cb.length
        la.addData(ca.toIndexedSeq); lb.addData(cb.toIndexedSeq)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val pairs = spark.table("vol_band").count()
      q.stop()
      println(f"STREAMVOL band rows=$fed pairs=$pairs $sec%.1f s " +
        f"${fed / sec}%.0f rows/s state_rows=$srows state_bytes=$sbytes")
    }

    // --- upsertSink: mult× bootstrap, then bucket-local increments -----
    // The sink's footprint claim is BUCKET-driven write amplification:
    // an incremental batch whose keys hash into ONE of 64 buckets reads
    // and rewrites ~1/64 of the table, however big the table grows.
    if (enabled("sink")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft_volsink").toString
      val nb = 64
      val input = MemoryStream[(Long, Long, Long)]
      val q = StreamOps.upsertSink(
        input.toDF().toDF("event_id", "user_id", "cents"),
        s"$root/table", Seq("event_id"), nb, s"$root/ckpt")
      // bootstrap: the full mult× corpus in one batch
      val t0 = System.nanoTime()
      var fed = 0L
      (0 until mult).foreach { r =>
        val chunk = base.map { case (id, u, _, _, c) =>
          (id * mult + r, u, c) }
        fed += chunk.length
        input.addData(chunk.toIndexedSeq)
      }
      q.processAllAvailable()
      val bootSec = (System.nanoTime() - t0) / 1e9
      // bucket map for replica-0 ids through the sink's own hash
      val octant = base.map(_._1).toSeq.toDF("event_id")
        .withColumn("b", pmod(xxhash64(
          concat_ws("\u0000", (col("event_id") * mult).cast("string"))),
          lit(nb)).cast("int"))
        .as[(Long, Int)].collect().toMap
      // 4 increments, each re-keying ONE bucket's residents
      val t1 = System.nanoTime()
      var incRows = 0L
      (0 until 4).foreach { b =>
        val chunk = base.filter(e => octant(e._1) == b)
          .map { case (id, u, _, _, c) => (id * mult, u, c + 1L) }
        incRows += chunk.length
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val incSec = (System.nanoTime() - t1) / 1e9 / 4.0
      q.stop()
      val stats = graft.sinks.Compaction.partitionStats(spark, s"$root/table")
      val tableRows = graft.sinks.KeyedParquetSink
        .read(spark, s"$root/table").count()
      println(f"STREAMVOL sink rows=$fed bootstrap=$bootSec%.1f s " +
        f"incr_mean=$incSec%.2f s incr_rows=${incRows / 4} " +
        f"table_rows=$tableRows files=${stats.map(_.nFiles.toLong).sum} " +
        f"bytes=${stats.map(_.bytes).sum}")
    }

    // --- nearDedupStream: span-shifted doc replicas --------------------
    // Bounded-state claim: live state ∝ band keys inside the eviction
    // horizon (3600 s at ~1 doc/s ⇒ a few thousand keys), NOT document
    // history — replica N must hold the same state as replica 1.
    if (enabled("neardedup")) {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val spanMs = docs.length.toLong * 1000L
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = StreamOps.nearDedupStream(
          input.toDF().toDF("doc_id", "ts", "text"),
          "doc_id", "text", "ts")
        .writeStream.outputMode("append").format("memory")
        .queryName("vol_ndup").start()
      val t0 = System.nanoTime()
      var fed = 0L
      var firstRows = 0L; var lastRows = 0L
      (0 until mult).foreach { r =>
        val shift = r.toLong * spanMs
        docs.zipWithIndex.grouped(docs.length / 4 + 1).foreach { g =>
          val chunk = g.map { case ((id, text), i) =>
            (id * mult + r,
              new java.sql.Timestamp(i.toLong * 1000L + shift), text)
          }
          fed += chunk.length
          input.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
        val rows = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsTotal).lastOption.getOrElse(0L)
        if (r == 0) firstRows = rows
        lastRows = rows
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (srows, sbytes) = footprint(q)
      val verdicts = spark.table("vol_ndup").count()
      q.stop()
      println(f"STREAMVOL neardedup rows=$fed verdicts=$verdicts $sec%.1f s " +
        f"${fed / sec}%.0f rows/s state_rows_max=$srows " +
        f"state_bytes_max=$sbytes state_rows_rep1=$firstRows " +
        f"state_rows_repN=$lastRows")
    }
    // --- ingestSink: fixed batch vs a mult×-bigger artifact store ------
    // Bounded-cost claim: one ingest tick prices the BATCH, not the
    // store — the dedup verdicts are bucket-keyed point reads + capped
    // band joins against the stored index and the ANN fold is a
    // broadcast-centroid map stage, so the SAME batch must cost ~flat
    // wall against a mult×-bigger artifact set (the upsertSink
    // increment-line shape).
    if (enabled("ingest")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft_volingest").toString
      // mult×-replicated history: distinct ids AND texts (suffix), so
      // the stored index grows ∝ mult with realistic spread
      val hist = graft.sources.Tables.documents(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          concat(col("text"), lit(" r"), col("rep")).as("text"))
        .localCheckpoint(true)
      val embM = graft.sources.Tables.embeddings(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") * mult + col("rep")).as("vec_id"),
          col("embedding"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      graft.ops.IncrementalDedup.buildIndex(hist, "doc_id", "text",
        s"$root/dedup")
      graft.ops.TokenizerModel.save(spark,
        Seq(("the", 1L, 10L)).toDF("token", "token_id", "n"),
        Seq((1L, "t h")).toDF("round", "pair"), s"$root/bpe")
      graft.ops.IvfIndex.build(spark, embM, "vec_id", "embedding",
        s"$root/ivf", numBuckets = 64)
      val bootSec = (System.nanoTime() - t0) / 1e9
      // the FIXED ingest batch: base-corpus-sized, fresh texts + real
      // embedding payloads under fresh ids
      val baseDocs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val vecs = graft.sources.Tables.embeddings(spark, dir)
        .select(col("embedding")).as[Seq[Float]].collect()
      def batchOf(tag: Int): Seq[(Long, String, Seq[Float])] =
        baseDocs.zipWithIndex.map { case ((id, text), i) =>
          (900000000L + tag.toLong * 1000000L + id,
            s"$text fresh$tag", vecs(i % vecs.length))
        }.toIndexedSeq
      val input = MemoryStream[(Long, String, Seq[Float])]
      val q = StreamOps.ingestSink(
        input.toDF().toDF("doc_id", "text", "embedding"),
        s"$root/dedup", s"$root/bpe", s"$root/ivf", s"$root/report",
        s"$root/ckpt", ivfBuckets = 64)
      // 3 fresh batches (full fold path), then batch 0's TEXTS
      // re-delivered under new ids (the dup-gate-only path)
      val t1 = System.nanoTime()
      (1 to 3).foreach { b => input.addData(batchOf(b)); q.processAllAvailable() }
      val freshSec = (System.nanoTime() - t1) / 1e9 / 3.0
      val t2 = System.nanoTime()
      input.addData(batchOf(1).map { case (id, text, v) =>
        (id + 500000L, text, v) })
      q.processAllAvailable()
      val dupSec = (System.nanoTime() - t2) / 1e9
      q.stop()
      val rep = spark.read.parquet(s"$root/report")
        .orderBy(col("batch_id"))
        .select(col("uniques"), col("vectors_appended"))
        .as[(Long, Long)].collect().toSeq
      println(f"STREAMVOL ingest batch_rows=${baseDocs.length} " +
        f"boot=$bootSec%.1f s fresh_mean=$freshSec%.1f s dup_batch=$dupSec%.1f s " +
        s"report=${rep.mkString(",")}")
    }
    spark.stop()
  }
}
