package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-bounded memo for expensive checkpointed intermediates shared by
  * several registered queries (the q55 cluster map, the q103 span index,
  * the MinHash signature table, the winnowed fingerprint index, the sign-LSH
  * band index). One named cache per intermediate; entries are keyed by
  * (session, sf dir) and evicted when the owning SparkContext stops, so the
  * maps are bounded by live sessions and checkpointed RDDs stay collectable.
  * `Bench` clears everything between passes (via `Dedup.clearCcCache`) so a
  * warm pass re-pays the compute. The eviction listener installs once per
  * session, not once per miss. */
private[queries] object Memo {

  private val caches = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]]()

  private val evictionHooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def apply(name: String, spark: SparkSession, dir: String)
      (compute: => DataFrame): DataFrame = {
    val cache = caches.computeIfAbsent(name,
      _ => new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]())
    cache.computeIfAbsent((spark, dir), { _ =>
      if (evictionHooked.add(spark))
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = {
              caches.values.forEach(_.keySet.removeIf(_._1 eq spark))
              // drop the hook-registry entry too, or the stopped session
              // object stays strongly referenced for the JVM's lifetime
              evictionHooked.remove(spark)
            }
          })
      compute
    })
  }

  def clearAll(): Unit = caches.values.forEach(_.clear())
}
