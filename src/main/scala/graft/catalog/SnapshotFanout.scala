package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.util.SerializableConfiguration

/** Partition-annotated data write OUTSIDE the V2 write exec — what
  * maintenance rewrites (compact/OPTIMIZE) use: the SAME executor-side
  * fanout machinery the catalog INSERT path runs
  * ([[SnapshotFanoutWriterFactory]], tuples rendered by the exact
  * [[PartitionSpec]] functions the read-side pruning compares with), so a
  * compaction of a days()/bucket()/multi-item-partitioned table re-emits
  * every file WITH its partition tuple — pruning and storage-partitioned
  * joins keep their power through OPTIMIZE, in one annotation dialect.
  *
  * Returns (published path, encoded partition tuple) pairs; files are NOT
  * yet visible — only a manifest commit publishes them (callers render
  * the pairs as `part=` lines). */
object SnapshotFanout {

  def write(spark: SparkSession, root: String, df: DataFrame,
      bound: Seq[BoundPartItem], tag: String): Seq[(String, String)] = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val staging = new org.apache.hadoop.fs.Path(rootP, s"_graft_stage_fan_$run")
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job,
      Map.empty[String, String], df.schema)
    val factory = new SnapshotFanoutWriterFactory(staging.toString, df.schema,
      bound, owf, new SerializableConfiguration(job.getConfiguration))
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // the physical rows of the plan, written through the fanout
      // DataWriter exactly as the V2 exec would drive it (write rows as
      // they stream, commit per task)
      val msgs = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          // taskId must be UNIQUE PER ATTEMPT: a retried/speculative
          // attempt reusing the original's id would stage the same file
          // path, letting a zombie first attempt corrupt the winner's
          // staged bytes before the driver renames them
          val w = factory.createWriter(pid,
            org.apache.spark.TaskContext.get().taskAttemptId())
          var ok = false
          try {
            it.foreach(w.write)
            val m = w.commit(); ok = true
            Iterator.single(m)
          } finally if (!ok) w.abort()
        }
      }.collect()
      val staged = msgs.collect { case c: CompositePartStaged => c.files }
        .flatten.sortBy(_.path)
      staged.zipWithIndex.map { case (p, i) =>
        val dst = new org.apache.hadoop.fs.Path(rootP,
          s"${tag}_${run}_$i.parquet")
        require(f.rename(new org.apache.hadoop.fs.Path(p.path), dst),
          s"fanout stage publish failed: ${p.path} -> $dst")
        (dst.toString, p.value)
      }.toSeq
    } finally f.delete(staging, true)
  }
}
