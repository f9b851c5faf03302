package graft

import org.apache.spark.sql.SparkSession

/** Session-construction helpers shared by the engine's mains ([[Verify]],
  * [[Bench]], [[Driver]]).
  *
  * The point of the master override is the EXECUTOR BOUNDARY: every run of
  * this engine before round 9 was `local[*]` — one JVM, where closure
  * serialization, connector commit messages, and broadcasts never cross a
  * process. `SPARK_GRAFT_MASTER=local-cluster[2,4,2048]` runs the same
  * mains against separate executor JVMs launched from SPARK_HOME (the
  * standalone-worker path Spark's own tests use), which is the closest a
  * single machine gets to the 1000-executor deployment the engine is
  * designed for. `tools/cluster_smoke.sh` drives the oracle gate through
  * it.
  */
object Sessions {

  /** Resolve a main's master: `SPARK_GRAFT_MASTER` overrides the default
    * `local[...]` so the same entry point runs single-JVM or across a real
    * executor boundary without code changes. */
  def master(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", default)

  /** Executors spawned by a `local-cluster` master get SPARK_HOME's jars,
    * NOT the launching JVM's classpath — ship the engine's own compiled
    * classes explicitly. (`spark-submit` does this with the application
    * jar; an sbt-launched main only has a classes directory, so it rides
    * `spark.executor.extraClassPath`.) No-op for in-process masters.
    *
    * `extraJars` must include any CLIENT jar whose classes appear inside
    * task closures (the [[Driver]] CLI's manifest-Main-Class jar): a
    * closure graph whose capturing classes resolve through the executor's
    * parent classpath but whose CAPTURED objects resolve only through the
    * fetched-jars child loader fails `SerializedLambda` resolution
    * ("cannot assign SerializedLambda to field ... func", measured on
    * local-cluster). Under `spark-submit --jars` every application class
    * rides the ONE fetched-jars loader, so the mixed-loader topology is
    * specific to classes-dir launches; keeping engine and client on the
    * same parent classpath here restores the single-loader invariant. */
  def forMaster(b: SparkSession.Builder, master: String,
      extraJars: Seq[String] = Nil): SparkSession.Builder =
    if (master.startsWith("local-cluster")) {
      val here = getClass.getProtectionDomain.getCodeSource.getLocation.getPath
      b.config("spark.executor.extraClassPath",
        (here +: extraJars).mkString(java.io.File.pathSeparator))
    } else b

  /** A PER-PROCESS warehouse sandbox: every warehouse-mutating registry
    * query (the store commits, q213/q215 refresh/compaction, the matview
    * family) writes fixed-name tables, which is correct under the
    * registry's serial execution but racy if two graft PROCESSES share
    * one warehouse directory (the in-memory catalog is per-JVM; only the
    * directory is shared — a concurrent `resetTable` would delete files
    * the other process is mid-read on). Each main therefore gets its own
    * warehouse under java.io.tmpdir, exactly as two production jobs own
    * separate schemas; two concurrent Verify/Bench runs can never
    * interfere. `SPARK_GRAFT_WAREHOUSE` overrides for workflows that
    * WANT a shared, durable warehouse (the matview attach()-across-JVMs
    * path), accepting the one-writer-at-a-time contract that implies. */
  def warehouseDir(): String =
    sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", {
      val d = java.nio.file.Files.createTempDirectory("graft_wh")
      d.toFile.deleteOnExit()
      d.toString
    })

  /** `SPARK_GRAFT_CONF="k=v;k2=v2"`: session-conf pins for measurement and
    * smoke runs (e.g. `graft.graph.triangleImpl=wedge` to force the
    * shuffle-only triangle path). Fails loudly naming a malformed
    * segment. */
  def applyEnvConf(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      if (kv.trim.nonEmpty) kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => throw new IllegalArgumentException(
          s"SPARK_GRAFT_CONF: segment '$kv' is not key=value")
      }
    })
}
