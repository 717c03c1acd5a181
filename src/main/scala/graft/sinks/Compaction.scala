package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet tables — the table-
  * maintenance half of a continuous load. Every micro-batch upsert or
  * streaming append writes at least one file per touched partition, so a
  * 100 TB table fed by a minutely pipeline accretes millions of tiny
  * files; scan cost then becomes file-open dominated (footer reads +
  * task-per-file scheduling) long before byte volume matters.
  *
  * The planner is driver-side METADATA work only: one filesystem listing
  * (the same listing any scan performs), a pure sizing pass over (partition,
  * file count, bytes), and a bounded rewrite list. Data movement happens
  * per planned partition: read dir → coalesce to ceil(bytes/target) →
  * rewrite. Partitions already at their target file count are untouched,
  * so steady-state maintenance cost tracks the churn rate, not table
  * size.
  *
  * Durability caveat (documented, not hidden): plain parquet directories
  * have no commit protocol, so the per-partition swap (write tmp →
  * retire old → rename tmp) is crash-safe only to the extent directory
  * renames are atomic on the filesystem (HDFS: yes; object stores: no —
  * there a table format with a transaction log is the right tool).
  */
object Compaction {

  /** Listing row for one leaf partition directory. */
  final case class PartitionFiles(partition: String, nFiles: Int, bytes: Long)

  /** One partition's rewrite decision. */
  final case class CompactionPlan(partition: String, nFiles: Int, bytes: Long,
                                  targetFiles: Int)

  /** List each immediate child partition directory of `path` with its
    * data-file count and byte total (dot/underscore-prefixed entries are
    * filesystem/commit metadata, not data). */
  def partitionStats(spark: SparkSession, path: String): Seq[PartitionFiles] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq
      .filter { s =>
        val n = s.getPath.getName
        // Hive-style partition dirs are `col=value` — that includes
        // underscore-named columns like `_bucket=0`, so metadata is
        // excluded by name (dot-prefixed, _temporary, _spark_metadata),
        // not by a blanket underscore test
        s.isDirectory && !n.startsWith(".") &&
          (n.contains("=") || (n != "_temporary" && n != "_spark_metadata" && !n.startsWith("_")))
      }
      .map { dir =>
        val files = fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".")
            && !f.getPath.getName.startsWith("_"))
        PartitionFiles(dir.getPath.getName, files.size, files.map(_.getLen).sum)
      }
  }

  /** Pure planning step: a partition is rewritten iff that strictly
    * reduces its file count — targetFiles = ceil(bytes / targetBytes),
    * floor 1. Empty or already-compact partitions drop out, so the
    * rewrite list is exactly the work worth doing. */
  def plan(stats: Seq[PartitionFiles], targetBytes: Long): Seq[CompactionPlan] = {
    require(targetBytes > 0, "Compaction.plan: targetBytes must be positive")
    stats
      .filter(s => s.nFiles > 1)
      .map { s =>
        val t = math.max(1L, (s.bytes + targetBytes - 1) / targetBytes)
        CompactionPlan(s.partition, s.nFiles, s.bytes, math.min(t, s.nFiles.toLong).toInt)
      }
      .filter(p => p.targetFiles < p.nFiles)
      .sortBy(_.partition)
  }

  /** Execute the plan: each listed partition directory is rewritten at
    * its target file count. Per partition: write the coalesced copy to a
    * sibling tmp dir, retire the original (rename to `.old`), promote the
    * tmp, drop the retired copy — the narrowest swap a raw-parquet layout
    * allows. Returns the executed plan (empty = nothing to do).
    *
    * `sortCols` turns the merge into a LAYOUT rewrite: rows are sorted
    * within each output file (e.g. by a [[graft.ops.Layout.mortonKey]]
    * column for two-dimensional min/max pruning, or by the filter key) —
    * compaction is the natural moment to pay for clustering, since the
    * data is being rewritten anyway. */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
              sortCols: Seq[String] = Nil): Seq[CompactionPlan] = {
    val plans = plan(partitionStats(spark, path), targetBytes)
    if (plans.isEmpty) return plans
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    plans.foreach { p =>
      val dir = new Path(path, p.partition)
      val tmp = new Path(path, s".compact_tmp_${p.partition}")
      val old = new Path(path, s".compact_old_${p.partition}")
      val merged = spark.read.parquet(dir.toString).coalesce(p.targetFiles)
      (if (sortCols.nonEmpty)
         merged.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
       else merged)
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(dir, old))
        throw new java.io.IOException(s"compaction: cannot retire $dir")
      if (!fs.rename(tmp, dir)) {
        // roll back so the table is never left without the partition
        fs.rename(old, dir)
        throw new java.io.IOException(s"compaction: cannot promote $tmp")
      }
      fs.delete(old, true)
    }
    plans
  }
}
