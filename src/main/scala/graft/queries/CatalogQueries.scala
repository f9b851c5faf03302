package graft.queries

import graft.QueryDef
import graft.catalog.GraftCatalog
import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The V2 `TableCatalog` registry entries — the q308/q309/q311/q314/q315
  * family re-expressed as PURE `spark.sql` TEXT against `graft.<t>`:
  * Spark's OWN analyzer resolves the catalog, its OWN group-based rewrite
  * rules plan the copy-on-write MERGE/UPDATE/DELETE, its OWN runtime group
  * filter prunes the rewrite to matched files, and publication is the
  * snapshot layer's atomic manifest commit ([[graft.catalog.GraftCatalog]]).
  * No name→root maps, no plan substitution, no interpreter.
  *
  * TWIN DISCIPLINE: each entry is graded by the SAME DuckDB oracle as its
  * snapshot-native counterpart (q308's merge model, q311's delete, q314's
  * update, q315's three-version time travel), so ANY divergence between
  * the catalog path and the `mutateSnapshot`/`SqlDml` paths — a lost
  * carry-over row, a half-applied clause, a wrong version resolved — is a
  * hash mismatch, not a unit-test opinion. The `pruned` flag is computed
  * from the REAL manifest diff (replaced ⊂ all files), so it grades that
  * Spark's runtime group filtering actually narrowed the rewrite.
  */
object CatalogQueries {

  /** (v1 files, v2 files, pruned) of the last commit under `root`:
    * pruned = the rewrite replaced a strict, non-empty subset. */
  private def prunedOf(spark: SparkSession, root: String,
      from: Int, to: Int): Boolean = {
    val a = SnapshotStore.files(spark, root, from).map(Lakehouse.normPath).toSet
    val b = SnapshotStore.files(spark, root, to).map(Lakehouse.normPath).toSet
    val replaced = a -- b
    replaced.nonEmpty && replaced.size < a.size
  }

  /** The q308-model change source for the [lo, hi] decile, registered as
    * temp view `name`: matched keys %3∈{0,1} pass through; %3=2 re-keys
    * out of domain (the INSERT rows). */
  private def changesView(spark: SparkSession, root: String, lo: Long,
      hi: Long, name: String): Unit = {
    val t1 = SnapshotStore.read(spark, root)
    val inRange = t1.where(col("o_orderkey").between(lo, hi)).localCheckpoint()
    inRange.where(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 3 === 1)
      .unionByName(inRange.where(col("o_orderkey") % 3 === 2)
        .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")))
      .createOrReplaceTempView(name)
  }

  private val MergeSql =
    """MERGE INTO graft.%s t USING %s s
      |ON t.o_orderkey = s.o_orderkey
      |WHEN MATCHED AND s.o_orderkey %% 3 = 0 THEN UPDATE SET
      |  o_totalprice = t.o_totalprice + 1.0, o_orderpriority = 'MERGED'
      |WHEN MATCHED AND s.o_orderkey %% 3 = 1 THEN DELETE
      |WHEN NOT MATCHED THEN INSERT
      |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |   o_orderpriority)
      |  VALUES (s.o_orderkey, s.o_custkey, 'N', s.o_totalprice,
      |   s.o_orderdate, s.o_orderpriority)""".stripMargin

  /** q319: `MERGE INTO graft.t` — the exact q308/q309 three-way merge as
    * catalog SQL through Spark's `RewriteMergeIntoTable` + runtime group
    * filtering + manifest commit; graded by [[Lakehouse.mergeGrade]]
    * against q308's oracle (merged table, manifest-diff change feed, v1
    * re-read, pruning — one result). */
  def catMerge(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_m", root)
    val lo = mx / 2; val hi = lo + mx / 10
    changesView(spark, root, lo, hi, "cat_changes_m")
    spark.sql(MergeSql.format("cat_orders_m", "cat_changes_m"))
    val v2 = SnapshotStore.currentVersion(spark, root)
    Lakehouse.mergeGrade(spark, dir, root, v2, prunedOf(spark, root, 1, v2))
  }

  /** q320: `DELETE FROM graft.t WHERE key BETWEEN` — q311's retention
    * delete as catalog SQL; time travel re-proves v1, the oracle the
    * surviving content, `pruned` that the runtime group filter narrowed
    * the rewrite to the covering files. */
  def catDelete(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_d", root)
    val lo = mx / 10; val hi = lo + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_d WHERE o_orderkey BETWEEN $lo AND $hi")
    val v2 = SnapshotStore.currentVersion(spark, root)
    val ttOk = v1MatchesOrders(spark, dir, root)
    spark.sql("SELECT o_orderstatus, o_totalprice FROM graft.cat_orders_d")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(prunedOf(spark, root, 1, v2)).as("pruned"),
        lit(ttOk).as("time_travel_ok"))
  }

  /** q321: `UPDATE graft.t SET ... WHERE` — q314's predicate update as
    * catalog SQL; the assignment references the target
    * (`o_totalprice + 1.0`), so Spark's aligned-assignment rewrite — not
    * constant replacement — is under the oracle. */
  def catUpdate(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_u", root)
    val lo = mx / 3; val hi = lo + mx / 20
    spark.sql(
      s"""UPDATE graft.cat_orders_u
         |SET o_totalprice = o_totalprice + 1.0, o_orderpriority = 'UPD'
         |WHERE o_orderkey BETWEEN $lo AND $hi""".stripMargin)
    val v2 = SnapshotStore.currentVersion(spark, root)
    val ttOk = v1MatchesOrders(spark, dir, root)
    spark.table("graft.cat_orders_u")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"),
        sum(when(col("o_orderpriority") === "UPD", lit(1L))
          .otherwise(lit(0L))).as("n_upd"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        col("n_upd"), lit(prunedOf(spark, root, 1, v2)).as("pruned"),
        lit(ttOk).as("time_travel_ok"))
  }

  /** v1 (read via native `VERSION AS OF 1`) still reproduces the original
    * orders table agg-for-agg — the time-travel gate shared by the delete
    * and update entries. */
  private def v1MatchesOrders(spark: SparkSession, dir: String,
      root: String): Boolean = {
    def aggOf(df: DataFrame) = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("c"),
        graft.Exact.dsum2(col("o_totalprice")).as("t"))
    aggOf(SnapshotStore.read(spark, root, 1))
      .join(aggOf(graft.Tables(spark, dir, "orders"))
          .withColumnRenamed("c", "c2").withColumnRenamed("t", "t2"),
        Seq("o_orderstatus"), "full")
      .where(col("c").isNull || col("c2").isNull ||
        col("c") =!= col("c2") || col("t") =!= col("t2"))
      .isEmpty
  }

  /** q322: NATIVE TIME TRAVEL over a catalog-mutated store — v2 = the
    * q308-model MERGE, v3 = the q311-model range DELETE, BOTH as catalog
    * SQL statements chained on one table (each loads the other's commit);
    * the three versions then read back via `VERSION AS OF` in one pure-SQL
    * UNION. The oracle (q315's) recomputes every version from the change
    * model, so a wrong manifest resolved — or a later version's rows
    * leaking backwards — hash-fails. */
  def catTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_tt", root)
    val lo = mx / 2; val hi = lo + mx / 10
    changesView(spark, root, lo, hi, "cat_changes_tt")
    spark.sql(MergeSql.format("cat_orders_tt", "cat_changes_tt"))
    val lo2 = mx / 10; val hi2 = lo2 + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_tt WHERE o_orderkey BETWEEN $lo2 AND $hi2")
    spark.sql((1 to 3).map { v =>
      s"""SELECT CAST($v AS BIGINT) AS version, o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_price
         |FROM graft.cat_orders_tt VERSION AS OF $v
         |GROUP BY o_orderstatus""".stripMargin
    }.mkString("\nUNION ALL\n"))
  }

  /** q329: MERGE-ON-READ THROUGH THE CATALOG — the two round-13 halves
    * composed: a delete-vector commit tombstones one key range
    * merge-on-read (no file rewritten), then a catalog SQL UPDATE
    * rewrites a disjoint range copy-on-write. The catalog scan applies
    * the vectors per-file (ordinal pointer walk inside the reader), the
    * UPDATE's rewrite reads only LIVE rows (a replaced file's tombstones
    * cannot resurrect), and untouched files keep their vectors applying —
    * all three graded in one result: the oracle recomputes the survivors
    * + update from the change model, `tt_ok` pins `VERSION AS OF 1` as
    * the pre-mutation table. At 100 TB this is the production shape:
    * retention deletes land as cheap vectors, point updates as localized
    * rewrites, every reader — SQL or DataFrame — sees one live table. */
  def catMorRead(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_mor", root)
    val lo = mx / 10; val hi = lo + mx / 20
    val dv = SnapshotStore.writeData(spark, root,
      SnapshotStore.tombstonesWhere(spark, root,
        col("o_orderkey").between(lo, hi)).coalesce(1), "dv")
    SnapshotStore.commit(spark, root,
      SnapshotStore.files(spark, root) ++ dv.map(SnapshotStore.dvLine), 1)
    val lo2 = mx / 2; val hi2 = lo2 + mx / 20
    spark.sql(
      s"""UPDATE graft.cat_orders_mor
         |SET o_totalprice = o_totalprice + 1.0, o_orderpriority = 'MU'
         |WHERE o_orderkey BETWEEN $lo2 AND $hi2""".stripMargin)
    val ttOk = v1MatchesOrders(spark, dir, root)
    spark.table("graft.cat_orders_mor")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"),
        sum(when(col("o_orderpriority") === "MU", lit(1L))
          .otherwise(lit(0L))).as("n_mu"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        col("n_mu"), lit(ttOk).as("tt_ok"))
  }

  private val catMorReadSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 10) AS lo,
       |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS hi,
       |         (max(o_orderkey) // 2) AS lo2,
       |         (max(o_orderkey) // 2) + (max(o_orderkey) // 20) AS hi2
       |  FROM orders)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("CASE WHEN o_orderkey BETWEEN lo2 AND hi2 " +
      "THEN o_totalprice + 1.0 ELSE o_totalprice END")} AS total_price,
       |  CAST(count(*) FILTER (WHERE o_orderkey BETWEEN lo2 AND hi2)
       |    AS BIGINT) AS n_mu,
       |  TRUE AS tt_ok
       |FROM orders, rng
       |WHERE o_orderkey NOT BETWEEN lo AND hi
       |GROUP BY 1""".stripMargin

  /** A fresh warehouse root for DDL-created tables (one per invocation —
    * entries must be re-runnable in one session: Bench runs each twice),
    * with the catalog installed. `DROP TABLE IF EXISTS` then clears any
    * prior run's registration AND its on-disk root through the catalog's
    * own drop path. */
  private def freshWarehouse(spark: SparkSession): String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat_wh")
    graft.streaming.EventStreams.deleteTreeOnExit(wh)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh.toString)
    wh.toString
  }

  /** q330: SQL DDL LIFECYCLE through the catalog — CREATE TABLE (empty,
    * schema-only manifest), INSERT INTO as commits, ALTER TABLE ADD COLUMN
    * as a pure-metadata schema-evolution commit (old files null-fill the
    * new column inside the scan), and DROP TABLE removing root +
    * registration. The oracle recomputes the final table from the change
    * model; `drop_ok` pins the drop round-trip and `schema_versioned` that
    * the pre-evolution version still reads under ITS OWN schema — time
    * travel travels the schema too. */
  def catDdl(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ddl_orders")
    spark.sql(
      """CREATE TABLE graft.ddl_orders
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        |""".stripMargin)
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("ddl_src")
    spark.sql(
      """INSERT INTO graft.ddl_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM ddl_src WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.ddl_orders ADD COLUMN src STRING")
    spark.sql(
      """INSERT INTO graft.ddl_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'B'
        |FROM ddl_src WHERE o_orderkey % 2 = 1""".stripMargin)
    // the pre-evolution version (v2 = first insert) has no src column
    val schemaVersioned = !spark
      .sql("SELECT * FROM graft.ddl_orders VERSION AS OF 2")
      .columns.contains("src")
    // drop round-trip on a scratch table: analyzer declines after, root gone
    spark.sql("DROP TABLE IF EXISTS graft.ddl_scratch")
    spark.sql("CREATE TABLE graft.ddl_scratch (x BIGINT)")
    spark.sql("INSERT INTO graft.ddl_scratch VALUES (1)")
    spark.sql("DROP TABLE graft.ddl_scratch")
    val dropOk =
      scala.util.Try(spark.table("graft.ddl_scratch").count()).isFailure &&
        !java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$wh/ddl_scratch"))
    spark.table("graft.ddl_orders")
      .groupBy(col("o_orderstatus"),
        coalesce(col("src"), lit("A")).as("src"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("src"), col("n"), col("total_price"),
        lit(dropOk).as("drop_ok"),
        lit(schemaVersioned).as("schema_versioned"))
  }

  private val catDdlSql =
    """SELECT o_orderstatus,
      |  CASE WHEN o_orderkey % 2 = 1 THEN 'B' ELSE 'A' END AS src,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS drop_ok, TRUE AS schema_versioned
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** q331: CTAS + INSERT OVERWRITE — `CREATE TABLE AS SELECT` plans
    * through the catalog's create-then-append path (v1 schema-only, v2 the
    * select), and the OVERWRITE truncates by commit: data lines and
    * vectors go, the schema meta line and ALL HISTORY stay. Both states
    * read back via version travel in one result, so a torn CTAS, an
    * overwrite that leaked old rows, or lost history all hash-fail. */
  def catCtas(spark: SparkSession, dir: String): DataFrame = {
    freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ctas_cust")
    graft.Tables(spark, dir, "customer").createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE graft.ctas_cust AS
        |SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM ctas_src WHERE c_custkey % 3 = 0""".stripMargin)
    spark.sql(
      """INSERT OVERWRITE graft.ctas_cust
        |SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM ctas_src WHERE c_custkey % 3 = 1""".stripMargin)
    def agg(df: DataFrame, tag: String) = df
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("c_acctbal")).as("acctbal"))
      .select(lit(tag).as("snap"), col("c_mktsegment"), col("n"),
        col("acctbal"))
    agg(spark.sql("SELECT * FROM graft.ctas_cust VERSION AS OF 2"), "ctas")
      .unionByName(agg(spark.table("graft.ctas_cust"), "overwrite"))
  }

  private val catCtasSql =
    """SELECT 'ctas' AS snap, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
      |FROM customer WHERE c_custkey % 3 = 0 GROUP BY 2
      |UNION ALL
      |SELECT 'overwrite' AS snap, c_mktsegment, CAST(count(*) AS BIGINT),
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |FROM customer WHERE c_custkey % 3 = 1 GROUP BY 2""".stripMargin

  /** q332: NATIVE `TIMESTAMP AS OF` — the catalog resolves an instant to
    * the latest version committed at-or-before it (manifest mtimes, the
    * clock every table format's timestamp travel reads). Three versions —
    * base, catalog DELETE, catalog UPDATE — get PINNED commit times an
    * hour apart (determinism; production keeps natural publication times),
    * and the query reads between-commits instants: each must resolve to
    * the version preceding it, recomputed whole by the oracle. */
  def catTimestampTravel(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_tsq", root)
    val dlo = mx / 10; val dhi = dlo + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_tsq WHERE o_orderkey BETWEEN $dlo AND $dhi")
    val ulo = mx / 3; val uhi = ulo + mx / 20
    spark.sql(
      s"""UPDATE graft.cat_orders_tsq
         |SET o_totalprice = o_totalprice + 1.0
         |WHERE o_orderkey BETWEEN $ulo AND $uhi""".stripMargin)
    val tz = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    def ms(h: Int) = java.time.LocalDateTime.of(2026, 1, 1, h, 0)
      .atZone(tz).toInstant.toEpochMilli
    (1 to 3).foreach(v =>
      SnapshotStore.setCommitTime(spark, root, v, ms((v - 1) * 2)))
    spark.sql((1 to 3).map { v =>
      val at = f"2026-01-01 0${(v - 1) * 2 + 1}%d:00:00"
      s"""SELECT CAST($v AS BIGINT) AS snap, o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_price
         |FROM graft.cat_orders_tsq TIMESTAMP AS OF '$at'
         |GROUP BY o_orderstatus""".stripMargin
    }.mkString("\nUNION ALL\n"))
  }

  private val catTimestampSql =
    """WITH rng AS (
      |  SELECT (max(o_orderkey) // 10) AS dlo,
      |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS dhi,
      |         (max(o_orderkey) // 3) AS ulo,
      |         (max(o_orderkey) // 3) + (max(o_orderkey) // 20) AS uhi
      |  FROM orders),
      |snaps AS (
      |  SELECT 1 AS snap, o_orderstatus, o_totalprice FROM orders
      |  UNION ALL
      |  SELECT 2, o_orderstatus, o_totalprice FROM orders, rng
      |  WHERE o_orderkey NOT BETWEEN dlo AND dhi
      |  UNION ALL
      |  SELECT 3, o_orderstatus,
      |    CASE WHEN o_orderkey BETWEEN ulo AND uhi
      |      THEN o_totalprice + 1.0 ELSE o_totalprice END
      |  FROM orders, rng WHERE o_orderkey NOT BETWEEN dlo AND dhi)
      |SELECT CAST(snap AS BIGINT) AS snap, o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM snaps GROUP BY 1, 2""".stripMargin

  /** q333: STREAMING WRITE THROUGH THE CATALOG —
    * `writeStream.toTable("graft.t")`: the events table arrives as
    * micro-batches (file source, one file per trigger) and every epoch
    * lands as ONE manifest commit stamped with the epoch high-water mark
    * ([[graft.catalog.SnapshotStreamingWrite]]): mid-stream readers only
    * ever see whole epochs, and a redelivered epoch is a manifest no-op —
    * exactly-once from at-least-once, with no foreachBatch in user code
    * (q324's contract, catalog edition). `prefix_ok` gates that every
    * committed version reads as a monotone prefix of the stream;
    * `multi_epoch` that the run actually exercised >1 epoch commit. */
  def catStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ev_sink")
    spark.sql(
      """CREATE TABLE graft.ev_sink
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)
        |""".stripMargin)
    val in = java.nio.file.Files.createTempDirectory("graft_cat_stream_in")
    graft.streaming.EventStreams.deleteTreeOnExit(in)
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.repartition(4).write.mode("overwrite").parquet(in.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat_stream_ck")
    graft.streaming.EventStreams.deleteTreeOnExit(ckpt)
    val q = spark.readStream
      .schema(spark.read.parquet(in.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .toTable("graft.ev_sink")
    q.awaitTermination()
    val root = s"$wh/ev_sink"
    val versions = SnapshotStore.versions(spark, root)
    val counts = versions.map(v => SnapshotStore.read(spark, root, v).count())
    val prefixOk = counts == counts.sorted && counts.last == ev.count()
    val multiEpoch = versions.size >= 3 // create + >=2 data epochs
    spark.table("graft.ev_sink")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.Exact.dsum2(col("value")).as("total_value"))
      .select(col("event_type"), col("n"), col("n_users"), col("total_value"),
        lit(prefixOk).as("prefix_ok"), lit(multiEpoch).as("multi_epoch"))
  }

  private val catStreamSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  TRUE AS prefix_ok, TRUE AS multi_epoch
      |FROM events GROUP BY 1""".stripMargin

  /** q334: MERGE-ON-READ DML — the q329 composition with ZERO manual
    * vector plumbing: the table opts into `meta:writemode=mor` and plain
    * catalog SQL does the rest. `DELETE` plans through Spark's delta
    * rewrite ([[graft.catalog.SnapshotDeltaOperation]]) and lands as
    * tombstone vectors — `mor_ok` pins that NO data file was rewritten;
    * `UPDATE` lands as (tombstone, insert-file) pairs via
    * delete-and-insert. Cost ∝ changed rows — the production shape for
    * scattered mutations at 100 TB, where copy-on-write's
    * rewrite-the-covering-file amplification dominates. The oracle
    * recomputes survivors + updates from the change model; `tt_ok` pins v1
    * as the pre-mutation table. */
  def catMorDml(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    SnapshotStore.setWriteMode(spark, root, "mor")
    GraftCatalog.register(spark, "cat_orders_mdml", root)
    val dataBefore = SnapshotStore.files(spark, root)
      .map(Lakehouse.normPath).toSet
    val lo = mx / 10; val hi = lo + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_mdml WHERE o_orderkey BETWEEN $lo AND $hi")
    val lo2 = mx / 2; val hi2 = lo2 + mx / 20
    spark.sql(
      s"""UPDATE graft.cat_orders_mdml
         |SET o_totalprice = o_totalprice + 1.0, o_orderpriority = 'MU'
         |WHERE o_orderkey BETWEEN $lo2 AND $hi2""".stripMargin)
    val dataAfter = SnapshotStore.files(spark, root)
      .map(Lakehouse.normPath).toSet
    // merge-on-read proof: every original data file still in the manifest
    // (nothing rewritten), vectors present, the update added insert files
    val morOk = dataBefore.subsetOf(dataAfter) &&
      SnapshotStore.deleteVectors(spark, root).nonEmpty &&
      (dataAfter -- dataBefore).nonEmpty
    val ttOk = v1MatchesOrders(spark, dir, root)
    spark.table("graft.cat_orders_mdml")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"),
        sum(when(col("o_orderpriority") === "MU", lit(1L))
          .otherwise(lit(0L))).as("n_mu"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        col("n_mu"), lit(morOk).as("mor_ok"), lit(ttOk).as("tt_ok"))
  }

  private val catMorDmlSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 10) AS lo,
       |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS hi,
       |         (max(o_orderkey) // 2) AS lo2,
       |         (max(o_orderkey) // 2) + (max(o_orderkey) // 20) AS hi2
       |  FROM orders)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("CASE WHEN o_orderkey BETWEEN lo2 AND hi2 " +
      "THEN o_totalprice + 1.0 ELSE o_totalprice END")} AS total_price,
       |  CAST(count(*) FILTER (WHERE o_orderkey BETWEEN lo2 AND hi2)
       |    AS BIGINT) AS n_mu,
       |  TRUE AS mor_ok, TRUE AS tt_ok
       |FROM orders, rng
       |WHERE o_orderkey NOT BETWEEN lo AND hi
       |GROUP BY 1""".stripMargin

  /** q335: MAINTENANCE PROCEDURES through Spark's own `CALL` — the
    * operational lifecycle as four SQL statements: `set_write_mode` flips
    * the table to merge-on-read, DELETE lands as vectors, `compact`
    * re-clusters the live rows and RECONCILES the vectors away (the
    * OPTIMIZE every format ships; meta lines carry, so the mode survives),
    * `analyze` builds + attaches the zone-stats sidecar, `vacuum` GCs
    * every expired version and unreferenced file. Gates pin each step's
    * result row (files_after, vectors_reconciled, attached version,
    * removed counts) and that exactly the final version survives; the
    * oracle recomputes the surviving content. At 100 TB this is the
    * nightly maintenance pass — one clustered rewrite of live rows,
    * manifest-scale vacuum/analyze. */
  def catProcedures(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_proc", root)
    spark.sql("CALL graft.set_write_mode('cat_orders_proc', 'mor')")
    val lo = mx / 10; val hi = lo + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_proc WHERE o_orderkey BETWEEN $lo AND $hi")
    val c = spark.sql(
      """CALL graft.compact(table => 'cat_orders_proc', buckets => 4,
        |cluster_col => 'o_orderkey')""".stripMargin).head()
    val compactOk = c.getInt(2) == 4 && c.getInt(3) >= 1 &&
      SnapshotStore.deleteVectors(spark, root).isEmpty
    val a = spark.sql("CALL graft.analyze('cat_orders_proc', 'o_orderkey')")
      .head()
    val analyzeOk = a.getInt(0) == SnapshotStore.currentVersion(spark, root) &&
      a.getLong(1) == 4L
    val v = spark.sql("CALL graft.vacuum('cat_orders_proc', 1)").head()
    val vacuumOk = v.getInt(1) == 3 &&
      SnapshotStore.versions(spark, root).size == 1
    SnapshotStore.dropSkipping(spark, root) // session tidiness
    spark.table("graft.cat_orders_proc")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(compactOk).as("compact_ok"), lit(analyzeOk).as("analyze_ok"),
        lit(vacuumOk).as("vacuum_ok"))
  }

  private val catProceduresSql =
    """WITH rng AS (
      |  SELECT (max(o_orderkey) // 10) AS lo,
      |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS hi
      |  FROM orders)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS compact_ok, TRUE AS analyze_ok, TRUE AS vacuum_ok
      |FROM orders, rng
      |WHERE o_orderkey NOT BETWEEN lo AND hi
      |GROUP BY 1""".stripMargin

  /** q336: STREAMING READ of a catalog table
    * (`readStream.table("graft.t")`) — the manifest AS the log
    * ([[graft.catalog.SnapshotMicroBatchStream]]): offsets are committed
    * versions, the first micro-batch is the stream-start snapshot, every
    * later batch is exactly one INSERT's manifest diff. Three slices of
    * events land by catalog INSERT with the stream draining between
    * commits; `batches_ok` pins exactly three non-empty batches (snapshot
    * + two appends — no re-emits, no torn versions), and the oracle
    * recomputes the full content. At 100 TB: per-trigger planning is two
    * manifest reads, the data read only the appended files — the
    * table-tailing shape every CDC/ingest pipeline runs on. */
  def catStreamRead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ev_tail")
    spark.sql(
      """CREATE TABLE graft.ev_tail
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)
        |""".stripMargin)
    graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .createOrReplaceTempView("tail_src")
    def ins(r: Int): Unit = spark.sql(
      s"""INSERT INTO graft.ev_tail
         |SELECT event_id, user_id, event_type, value
         |FROM tail_src WHERE event_id % 3 = $r""".stripMargin)
    ins(0)
    val out = java.nio.file.Files.createTempDirectory("graft_tail_out")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tail_ck")
    graft.streaming.EventStreams.deleteTreeOnExit(ckpt)
    val q = spark.readStream.table("graft.ev_tail")
      .writeStream
      .foreachBatch(graft.streaming.EventStreams.batchSink(out, "append"))
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      ins(1); q.processAllAvailable()
      ins(2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.option("recursiveFileLookup", "true")
      .parquet(out.toString)
    val batches = Option(out.toFile.listFiles()).getOrElse(Array.empty)
      .count(d => !spark.read.parquet(d.toString).isEmpty)
    got.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.Exact.dsum2(col("value")).as("total_value"))
      .select(col("event_type"), col("n"), col("n_users"),
        col("total_value"), lit(batches == 3).as("batches_ok"))
  }

  private val catStreamReadSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  TRUE AS batches_ok
      |FROM events GROUP BY 1""".stripMargin

  /** q337: OPTIMIZE ZORDER — `CALL graft.compact(..., cluster_col =>
    * 'a,b')` interleaves the (min-max normalized) keys into a Morton
    * value and range-clusters on it, and `CALL graft.analyze(..., 'a,b')`
    * persists BOTH dimensions' per-file bounds in one multi-key sidecar —
    * the catalog scan then intersects pruning across every constrained
    * key ([[graft.catalog.SnapshotZones]]). Gates pin the layout theorem
    * on real data: the LINEAR orderkey-clustered layout is provably blind
    * to a custkey slice (`linear_blind` — every file spans the whole
    * custkey domain), the z-ordered layout prunes on EITHER key
    * (`z_prunes_both`), and the graded content is the custkey-slice
    * aggregate read THROUGH the pruned catalog scan. At 100 TB this is
    * the difference between scanning everything and scanning ~√fraction
    * for second-dimension predicates — q125's cell theorem made an
    * operational layout. */
  def catZorder(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_z", root)
    val mxc = spark.table("graft.cat_orders_z")
      .agg(max(col("o_custkey"))).head().getLong(0)
    val (cLo, cHi) = (mxc / 4, mxc / 4 + mxc / 8)
    def admitted(key: String, lo: Long, hi: Long): Int =
      graft.catalog.SnapshotZones.prune(spark, root,
        SnapshotStore.currentVersion(spark, root),
        Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(key, lo),
          org.apache.spark.sql.sources.LessThanOrEqual(key, hi)),
        SnapshotStore.files(spark, root)).size
    spark.sql("CALL graft.analyze('cat_orders_z', 'o_orderkey,o_custkey')")
    // linear layout: clustered by orderkey, so a custkey slice admits ALL
    val linearBlind =
      admitted("o_custkey", cLo, cHi) == SnapshotStore.files(spark, root).size
    spark.sql(
      """CALL graft.compact(table => 'cat_orders_z', buckets => 16,
        |cluster_col => 'o_orderkey,o_custkey')""".stripMargin)
    spark.sql("CALL graft.analyze('cat_orders_z', 'o_orderkey,o_custkey')")
    val total = SnapshotStore.files(spark, root).size
    val zOk = admitted("o_orderkey", mx / 4, mx / 4 + mx / 8) < total &&
      admitted("o_custkey", cLo, cHi) < total
    SnapshotStore.dropSkipping(spark, root)
    spark.sql(
      s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_price
         |FROM graft.cat_orders_z
         |WHERE o_custkey BETWEEN $cLo AND $cHi
         |GROUP BY o_orderstatus""".stripMargin)
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(linearBlind).as("linear_blind"), lit(zOk).as("z_prunes_both"))
  }

  private val catZorderSql =
    """WITH rng AS (
      |  SELECT (max(o_custkey) // 4) AS lo,
      |         (max(o_custkey) // 4) + (max(o_custkey) // 8) AS hi
      |  FROM orders)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS linear_blind, TRUE AS z_prunes_both
      |FROM orders, rng
      |WHERE o_custkey BETWEEN lo AND hi
      |GROUP BY 1""".stripMargin

  /** q338: PARTITIONED CATALOG WRITES — `CREATE TABLE ... PARTITIONED BY`
    * then a plain `INSERT INTO`: the write requests clustering on the
    * partition column (Spark's V2 write-distribution contract) and the
    * fanout writer stages one file per (task, value) with the value
    * riding the commit message, so the manifest annotates EVERY new file
    * with its partition tuple ([[graft.catalog.SnapshotFanoutBatchWrite]])
    * — catalog writes keep partition pruning power, closing the "new
    * files land unannotated" decline. `annotated` pins full coverage,
    * `pruned_ok` that a one-status probe admits a strict subset whose
    * content equals the catalog read. At 100 TB this is hive-grain
    * partitioning as pure SQL: INSERT routes, the manifest prunes. */
  def catPartitionWrite(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.part_orders")
    spark.sql(
      """CREATE TABLE graft.part_orders
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        |PARTITIONED BY (o_orderstatus)""".stripMargin)
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("part_src")
    spark.sql(
      """INSERT INTO graft.part_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM part_src
        |""".stripMargin)
    val root = s"$wh/part_orders"
    val files = SnapshotStore.files(spark, root)
    val pv = SnapshotStore.partitionValuesOf(spark, root)
    val annotated = files.nonEmpty &&
      files.forall(f => pv.contains(SnapshotStore.uriPath(f)))
    val pruned = SnapshotStore.filesWherePartition(spark, root,
      "o_orderstatus", "F")
    val prunedOk = pruned.nonEmpty && pruned.size < files.size &&
      spark.read.parquet(pruned: _*)
        .where(col("o_orderstatus") === "F").count() ==
      spark.table("graft.part_orders")
        .where(col("o_orderstatus") === "F").count()
    spark.table("graft.part_orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(annotated).as("annotated"), lit(prunedOk).as("pruned_ok"))
  }

  private val catPartitionWriteSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS annotated, TRUE AS pruned_ok
      |FROM orders GROUP BY 1""".stripMargin

  /** Planned input-partition count of the (single) V2 snapshot scan in
    * `df`'s optimized plan — how the partition-pruning gates read what
    * the scan ACTUALLY plans, not what a helper would prune. */
  private def plannedParts(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.catalog.SnapshotScan]
          .planInputPartitions().length
    }.sum

  /** q339: TIME PARTITIONING — `PARTITIONED BY (days(ts))`: the INSERT
    * shuffles on the catalog-resolved `days` function (every UTC day
    * lands whole in one task), the fanout writer stages one file per day
    * with the day number annotated in the manifest, and a one-day probe
    * plans ONLY that day's file(s) ([[graft.catalog.SnapshotPartitions]]).
    * `annotated` pins full tuple coverage, `pruned_ok` that the probe's
    * planned scan admits a strict subset. At 100 TB this is the ingest
    * layout every events table wants: retention, backfill, and probe all
    * become day-file operations. */
  def catDaysPartition(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ev_days")
    spark.sql(
      """CREATE TABLE graft.ev_days
        |  (event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)
        |PARTITIONED BY (days(ts))""".stripMargin)
    graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .createOrReplaceTempView("evdays_src")
    spark.sql(
      """INSERT INTO graft.ev_days
        |SELECT event_id, ts, event_type, value FROM evdays_src""".stripMargin)
    val root = s"$wh/ev_days"
    val files = SnapshotStore.files(spark, root)
    val pv = SnapshotStore.partitionValuesOf(spark, root)
    val annotated = files.nonEmpty &&
      files.forall(f => pv.contains(SnapshotStore.uriPath(f)))
    // probe the corpus's first UTC day — bounds derived the same way the
    // oracle derives them, so the slices agree exactly
    val minTs = spark.table("graft.ev_days").agg(min(col("ts")))
      .head().getTimestamp(0)
    val d0 = java.time.Instant.ofEpochMilli(minTs.getTime)
      .truncatedTo(java.time.temporal.ChronoUnit.DAYS)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val probe = spark.sql(
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM graft.ev_days
         |WHERE ts >= TIMESTAMP '${fmt.format(d0)}'
         |  AND ts < TIMESTAMP '${fmt.format(d0.plus(java.time.Duration.ofDays(1)))}'
         |GROUP BY event_type""".stripMargin)
    val planned = plannedParts(probe)
    val prunedOk = planned >= 1 && planned < files.size
    probe.select(col("event_type"), col("n"), col("total_value"),
      lit(annotated).as("annotated"), lit(prunedOk).as("pruned_ok"))
  }

  private val catDaysPartitionSql =
    """WITH d0 AS (SELECT date_trunc('day', min(ts)) AS lo FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  TRUE AS annotated, TRUE AS pruned_ok
      |FROM events, d0
      |WHERE ts >= lo AND ts < lo + INTERVAL 1 DAY
      |GROUP BY 1""".stripMargin

  /** q340: MULTI-ITEM + HASH-BUCKET PARTITIONING — `PARTITIONED BY
    * (event_type, bucket(4, user_id))`: identity and bucket transforms
    * compose in one spec (the per-file annotation is the URL-encoded
    * tuple), the INSERT clusters on BOTH transform values, and a point
    * probe on `user_id` prunes to the matching bucket's files across
    * types — 1/n of the table without any sort order on the key.
    * `annotated` pins tuple coverage, `pruned_ok` that the probe planned
    * a strict subset. The 100 TB shape for high-cardinality point
    * lookups (user histories, doc ids) where range clustering buys
    * nothing. */
  def catBucketPartition(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ev_bkt")
    spark.sql(
      """CREATE TABLE graft.ev_bkt
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)
        |PARTITIONED BY (event_type, bucket(4, user_id))""".stripMargin)
    graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .createOrReplaceTempView("evbkt_src")
    spark.sql(
      """INSERT INTO graft.ev_bkt
        |SELECT event_id, user_id, event_type, value FROM evbkt_src""".stripMargin)
    val root = s"$wh/ev_bkt"
    val files = SnapshotStore.files(spark, root)
    val pv = SnapshotStore.partitionValuesOf(spark, root)
    val annotated = files.nonEmpty &&
      files.forall(f => pv.contains(SnapshotStore.uriPath(f)))
    val probeUser = spark.table("graft.ev_bkt").agg(min(col("user_id")))
      .head().getLong(0)
    val probe = spark.sql(
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM graft.ev_bkt WHERE user_id = $probeUser
         |GROUP BY event_type""".stripMargin)
    val planned = plannedParts(probe)
    val prunedOk = planned >= 1 && planned < files.size
    probe.select(col("event_type"), col("n"), col("total_value"),
      lit(annotated).as("annotated"), lit(prunedOk).as("pruned_ok"))
  }

  private val catBucketPartitionSql =
    """WITH u AS (SELECT min(user_id) AS probe_u FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  TRUE AS annotated, TRUE AS pruned_ok
      |FROM events, u
      |WHERE user_id = probe_u
      |GROUP BY 1""".stripMargin

  /** q341: OPTIMIZE ZORDER over THREE keys — `compact(cluster_col =>
    * 'l_orderkey,l_partkey,l_suppkey')` interleaves three min-max
    * normalized dimensions into one Morton value
    * ([[graft.queries.Layout.zValueN]]: bit b of dim j → position 3b+j,
    * so every file bounds ALL THREE keys), and one multi-key analyze
    * persists all three bounds. Gates pin the layout theorem at k=3: the
    * linear orderkey layout is blind to partkey AND suppkey slices
    * (`linear_blind`), the z-ordered layout prunes on EVERY key
    * (`z_prunes_all`), and the graded content is a suppkey-slice
    * aggregate read through the pruned catalog scan. At 100 TB: one
    * layout serves three access paths at ~∛fraction scan cost each,
    * instead of three sorted copies. */
  private val z3StageMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[(String, Long, Long)]), (String, Long, Long, Long)]()

  def catZorder3(spark: SparkSession, dir: String): DataFrame = {
    // staged-lineitem fixture template, cloned per run (the initStore
    // discipline): the linear-clustered base commit + the three key
    // maxima are pure functions of the input files, and re-staging them
    // per run was half this entry's wall time. The compact/analyze/probe
    // chain under measurement runs fully on the clone every time.
    val (src, mo, mp, ms) = z3StageMemo.computeIfAbsent(
      (dir, graft.Tables.fingerprint(spark, s"$dir/lineitem.parquet")), _ => {
        val out = java.nio.file.Files.createTempDirectory("graft_cat_z3t")
        graft.streaming.EventStreams.deleteTreeOnExit(out)
        val tmpl = s"$out/t"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmpl))
        val li = graft.Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_returnflag"))
        SnapshotStore.commit(spark, tmpl, SnapshotStore.writeData(spark, tmpl,
          li.repartitionByRange(16, col("l_orderkey")), "base"), 0)
        val mx = li.agg(max(col("l_orderkey")), max(col("l_partkey")),
          max(col("l_suppkey"))).head()
        (tmpl, mx.getLong(0), mx.getLong(1), mx.getLong(2))
      })
    val root = Lakehouse.freshRoot()
    SnapshotStore.cloneRoot(spark, src, root)
    GraftCatalog.register(spark, "cat_li_z3", root)
    def slice(m: Long) = (m / 4, m / 4 + m / 8)
    val keys = Seq("l_orderkey" -> slice(mo),
      "l_partkey" -> slice(mp), "l_suppkey" -> slice(ms))
    def admitted(key: String, lo: Long, hi: Long): Int =
      graft.catalog.SnapshotZones.prune(spark, root,
        SnapshotStore.currentVersion(spark, root),
        Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(key, lo),
          org.apache.spark.sql.sources.LessThanOrEqual(key, hi)),
        SnapshotStore.files(spark, root)).size
    spark.sql(
      "CALL graft.analyze('cat_li_z3', 'l_orderkey,l_partkey,l_suppkey')")
    // the linear layout bounds only its sort key
    val linearBlind = keys.tail.forall { case (k, (lo, hi)) =>
      admitted(k, lo, hi) == SnapshotStore.files(spark, root).size
    }
    spark.sql(
      """CALL graft.compact(table => 'cat_li_z3', buckets => 64,
        |cluster_col => 'l_orderkey,l_partkey,l_suppkey')""".stripMargin)
    spark.sql(
      "CALL graft.analyze('cat_li_z3', 'l_orderkey,l_partkey,l_suppkey')")
    val total = SnapshotStore.files(spark, root).size
    val zOk = keys.forall { case (k, (lo, hi)) => admitted(k, lo, hi) < total }
    SnapshotStore.dropSkipping(spark, root)
    val (sLo, sHi) = slice(ms)
    spark.sql(
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_qty
         |FROM graft.cat_li_z3
         |WHERE l_suppkey BETWEEN $sLo AND $sHi
         |GROUP BY l_returnflag""".stripMargin)
      .select(col("l_returnflag"), col("n"), col("total_qty"),
        lit(linearBlind).as("linear_blind"), lit(zOk).as("z_prunes_all"))
  }

  private val catZorder3Sql =
    """WITH rng AS (
      |  SELECT (max(l_suppkey) // 4) AS lo,
      |         (max(l_suppkey) // 4) + (max(l_suppkey) // 8) AS hi
      |  FROM lineitem)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_qty,
      |  TRUE AS linear_blind, TRUE AS z_prunes_all
      |FROM lineitem, rng
      |WHERE l_suppkey BETWEEN lo AND hi
      |GROUP BY 1""".stripMargin

  /** q343: RENAME/DROP COLUMN as pure metadata commits — the field-id
    * problem solved manifest-side ([[graft.sources.SchemaEvo]]): every
    * data line carries its write-epoch schema version (`sv=`), every
    * schema field its name history, and the scan reads each file under
    * the names it was WRITTEN with. The entry: half of orders lands
    * under `o_totalprice`, the column is renamed to `price` (zero files
    * touched — `files_stable`), the other half lands under `price`, and
    * the graded aggregate sums `price` across BOTH epochs — a lost
    * old-epoch resolution would halve the totals and hash-fail.
    * `schema_versioned` pins that time travel resolves the pre-rename
    * version under its own name. At 100 TB a rename is one manifest
    * line, not a table rewrite. */
  def catRename(spark: SparkSession, dir: String): DataFrame = {
    freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.rn_orders")
    spark.sql(
      """CREATE TABLE graft.rn_orders
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        |""".stripMargin)
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("rn_src")
    spark.sql(
      """INSERT INTO graft.rn_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM rn_src WHERE o_orderkey % 2 = 0""".stripMargin)
    val root =
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/rn_orders"
    val before = SnapshotStore.files(spark, root).map(Lakehouse.normPath).toSet
    spark.sql("ALTER TABLE graft.rn_orders RENAME COLUMN o_totalprice TO price")
    val filesStable =
      SnapshotStore.files(spark, root).map(Lakehouse.normPath).toSet == before
    spark.sql(
      """INSERT INTO graft.rn_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice AS price
        |FROM rn_src WHERE o_orderkey % 2 = 1""".stripMargin)
    val schemaVersioned =
      spark.sql("SELECT * FROM graft.rn_orders VERSION AS OF 2")
        .columns.toSeq == Seq("o_orderkey", "o_orderstatus", "o_totalprice") &&
      spark.table("graft.rn_orders").columns
        .toSeq == Seq("o_orderkey", "o_orderstatus", "price")
    spark.table("graft.rn_orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("price")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(filesStable).as("files_stable"),
        lit(schemaVersioned).as("schema_versioned"))
  }

  private val catRenameSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS files_stable, TRUE AS schema_versioned
      |FROM orders GROUP BY 1""".stripMargin

  /** q344: STORAGE-PARTITIONED JOIN — the flagship shuffle-elimination
    * of modern table formats: two tables `PARTITIONED BY (bucket(8,
    * key))` on their join keys report `KeyGroupedPartitioning` from the
    * manifest tuples ([[graft.catalog.SnapshotScan]]:
    * `SupportsReportPartitioning` + per-split `HasPartitionKey`), and
    * Spark plans the fact-fact join with ZERO exchange on either side —
    * rows of bucket b meet rows of bucket b where they already sit.
    * `spj_ok` pins the plan (no hash exchange on either join key, no
    * broadcast — the threshold is disabled for the statement); the
    * oracle recomputes the join from the raw tables. At 100 TB this is
    * THE fact-fact join strategy: co-located by layout, no sort order
    * maintained, no shuffle paid per query. */
  def catSpj(spark: SparkSession, dir: String): DataFrame = {
    freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.spj_orders")
    spark.sql("DROP TABLE IF EXISTS graft.spj_cust")
    spark.sql(
      """CREATE TABLE graft.spj_orders
        |  (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
    spark.sql(
      """CREATE TABLE graft.spj_cust
        |  (c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE)
        |PARTITIONED BY (bucket(8, c_custkey))""".stripMargin)
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("spj_o_src")
    graft.Tables(spark, dir, "customer").createOrReplaceTempView("spj_c_src")
    spark.sql(
      """INSERT INTO graft.spj_orders
        |SELECT o_orderkey, o_custkey, o_totalprice FROM spj_o_src""".stripMargin)
    spark.sql(
      """INSERT INTO graft.spj_cust
        |SELECT c_custkey, c_mktsegment, c_acctbal FROM spj_c_src""".stripMargin)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = spark.sql(
        s"""SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           |  ${graft.Exact.sqlSum2("o.o_totalprice")} AS total_price
           |FROM graft.spj_orders o JOIN graft.spj_cust c
           |  ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_mktsegment""".stripMargin)
      val p = j.queryExecution.executedPlan.toString
      // the JOIN pays no exchange on either key and no broadcast; the
      // final GROUP BY's one exchange on mktsegment is expected
      val spjOk = !p.contains("Exchange hashpartitioning(o_custkey") &&
        !p.contains("Exchange hashpartitioning(c_custkey") &&
        !p.contains("BroadcastExchange")
      j.localCheckpoint()
        .select(col("c_mktsegment"), col("n"), col("total_price"),
          lit(spjOk).as("spj_ok"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val catSpjSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS spj_ok
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** q345: METADATA-ONLY AGGREGATES — `SELECT count(*), min(k), max(k)
    * FROM graft.t` pushes completely into the scan builder
    * (`SupportsPushDownAggregates`) and answers as ONE driver-local row:
    * the count summed from the manifest's commit-time footer counts
    * (`rows=`), MIN/MAX from the analyze procedure's per-file exact
    * zone-stats sidecar — zero data bytes read at any table size (the
    * Iceberg/Delta metadata-aggregate contract). `meta_only` pins the
    * plan (a LocalTableScan, no BatchScan); filters, grouping, delete
    * vectors, un-analyzed keys, or un-counted legacy files all decline
    * to the ordinary scan — metadata answers are EXACT or not given. */
  def catMetaCount(spark: SparkSession, dir: String): DataFrame = {
    val (root, _) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_cnt", root)
    // MIN/MAX ride the zone-stats sidecar the analyze procedure builds
    spark.sql("CALL graft.analyze('cat_orders_cnt', 'o_orderkey')")
    SnapshotStore.dropSkipping(spark, root) // session tidiness
    val df = spark.sql(
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |FROM graft.cat_orders_cnt""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    val metaOnly = p.contains("LocalTableScan") && !p.contains("BatchScan")
    df.select(col("n"), col("lo"), col("hi"), lit(metaOnly).as("meta_only"))
  }

  private val catMetaCountSql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  min(o_orderkey) AS lo, max(o_orderkey) AS hi, TRUE AS meta_only
      |FROM orders""".stripMargin

  /** q346: TYPED ZONE STATS — `CALL graft.analyze(t, 'ts')` over a
    * TIMESTAMP key: the sidecar stores per-file bounds as epoch MICROS
    * (the Iceberg typed-bound model; [[SnapshotStore.canonicalBounds]]),
    * and a pushed ts-range probe converts its Timestamp literals into the
    * same domain and plans ONLY the admissible files
    * ([[graft.catalog.SnapshotZones]]). This kills the engine's oldest
    * pruning restriction — integer-keyed-only zone stats — on THE most
    * common real pruning key (`events.ts`). `pruned_ok` pins that the
    * probe's planned scan admitted a strict non-empty subset of the
    * 8-way ts-clustered layout; the oracle re-derives the slice from the
    * raw corpus. */
  def catTsZones(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_tszones")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val root = s"$out/table"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val base = graft.Tables(spark, dir, "events")
      .repartitionByRange(8, col("ts"))
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeData(spark, root, base, "base"), 0)
    GraftCatalog.register(spark, "cat_events_z", root)
    spark.sql("CALL graft.analyze('cat_events_z', 'ts')")
    SnapshotStore.dropSkipping(spark, root) // session tidiness
    val probe = spark.sql(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(event_id) AS lo_id, max(event_id) AS hi_id
        |FROM graft.cat_events_z
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY event_type""".stripMargin)
    val planned = plannedParts(probe)
    val files = SnapshotStore.files(spark, root)
    val prunedOk = planned >= 1 && planned < files.size
    probe.select(col("event_type"), col("n"), col("lo_id"), col("hi_id"),
      lit(prunedOk).as("pruned_ok"))
  }

  private val catTsZonesSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  min(event_id) AS lo_id, max(event_id) AS hi_id, TRUE AS pruned_ok
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
      |GROUP BY 1""".stripMargin

  /** q347: TYPED METADATA MIN/MAX — `SELECT count(*), min(ts), max(ts),
    * min(event_type), max(event_type)` answers as ONE driver-local row
    * from the manifest + typed sidecar: timestamp bounds decode from
    * micros, string bounds compare in UTF8 binary order (exact only —
    * truncated long-string bounds decline the pushdown). `meta_only`
    * pins the plan read zero data bytes; the oracle recomputes the same
    * extrema from the raw corpus. */
  def catMetaTyped(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_metatyped")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val root = s"$out/table"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val base = graft.Tables(spark, dir, "events")
      .repartitionByRange(8, col("ts"))
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeData(spark, root, base, "base"), 0)
    GraftCatalog.register(spark, "cat_events_mm", root)
    spark.sql("CALL graft.analyze('cat_events_mm', 'ts,event_type')")
    SnapshotStore.dropSkipping(spark, root)
    val df = spark.sql(
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  min(ts) AS ts_lo, max(ts) AS ts_hi,
        |  min(event_type) AS et_lo, max(event_type) AS et_hi
        |FROM graft.cat_events_mm""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    val metaOnly = p.contains("LocalTableScan") && !p.contains("BatchScan")
    df.select(col("n"), col("ts_lo"), col("ts_hi"), col("et_lo"),
      col("et_hi"), lit(metaOnly).as("meta_only"))
  }

  private val catMetaTypedSql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  min(ts) AS ts_lo, max(ts) AS ts_hi,
      |  min(event_type) AS et_lo, max(event_type) AS et_hi,
      |  TRUE AS meta_only
      |FROM events""".stripMargin

  /** q348: TYPE-WIDENING SCHEMA EVOLUTION — `ALTER TABLE ... ALTER COLUMN
    * k TYPE BIGINT` as a pure metadata commit: pre-widen files keep their
    * INT32 parquet pages and the reader up-casts them in place (Spark 4's
    * widening reads), post-widen inserts land 64-bit — the graded
    * aggregate SPANS both epochs and a pushed long filter crosses the
    * widen. The most common safe evolution in production lakehouses
    * (Iceberg V1 promotions), previously a loud decline. */
  def catWiden(spark: SparkSession, dir: String): DataFrame = {
    freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.wd_t")
    spark.sql(
      "CREATE TABLE graft.wd_t (k INT, status STRING, price DECIMAL(18,2))")
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("wd_src")
    spark.sql(
      """INSERT INTO graft.wd_t
        |SELECT CAST(o_orderkey AS INT), o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(18,2)) FROM wd_src""".stripMargin)
    spark.sql("ALTER TABLE graft.wd_t ALTER COLUMN k TYPE BIGINT")
    // rows only a 64-bit key can hold — impossible before the widen
    spark.sql(
      """INSERT INTO graft.wd_t
        |SELECT o_orderkey + 3000000000, o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(18,2))
        |FROM wd_src WHERE o_orderkey % 3 = 0""".stripMargin)
    spark.sql(
      """SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS s, CAST(sum(price) AS DOUBLE) AS total
        |FROM (SELECT k, status, price FROM graft.wd_t WHERE k >= 10)
        |GROUP BY status""".stripMargin)
  }

  private val catWidenSql =
    """WITH w AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 3000000000, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS s, CAST(sum(price) AS DOUBLE) AS total
      |FROM w WHERE k >= 10 GROUP BY 1""".stripMargin

  /** q350: WRITE-AUDIT-PUBLISH — the quarantined-ingestion pattern every
    * production lakehouse pipeline runs, as named refs
    * (`meta:ref=<name>=<version|tip>`): `CALL graft.branch(t, 'audit')`
    * pins `main` at the current version (bare readers keep seeing it),
    * the staged INSERT lands on the floating branch tip, the audit gate
    * reads `VERSION AS OF 'audit'`, and `CALL graft.publish(t, 'audit')`
    * fast-forwards — one metadata commit makes the audited rows visible.
    * `isolated` pins that a bare read DURING staging saw zero staged
    * rows; `audit_saw` that the branch read saw exactly the staged
    * count; the oracle recomputes the published table from the change
    * model. */
  def catWap(spark: SparkSession, dir: String): DataFrame = {
    val (root, _) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_wap", root)
    val baseCount = spark.table("graft.cat_orders_wap").count()
    spark.sql("CALL graft.branch('cat_orders_wap', 'audit')")
    // stage: quarantined rows (status 'W') appended to the branch tip
    graft.Tables(spark, dir, "orders")
      .where(col("o_orderkey") % 5 === 0)
      .select((col("o_orderkey") + lit(900000000L)).as("o_orderkey"),
        col("o_custkey"), lit("W").as("o_orderstatus"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .createOrReplaceTempView("wap_staged")
    val stagedCount = spark.table("wap_staged").count()
    spark.sql("INSERT INTO graft.cat_orders_wap SELECT * FROM wap_staged")
    // ISOLATION: a bare read mid-staging resolves the pinned main
    val during = spark.table("graft.cat_orders_wap")
    val isolated = during.count() == baseCount &&
      during.where(col("o_orderstatus") === "W").isEmpty
    // AUDIT GATE: the branch read sees exactly the staged rows
    val auditSaw = spark.sql(
      """SELECT count(*) AS n FROM graft.cat_orders_wap VERSION AS OF 'audit'
        |WHERE o_orderstatus = 'W'""".stripMargin)
      .head().getLong(0) == stagedCount
    spark.sql("CALL graft.publish('cat_orders_wap', 'audit')")
    spark.table("graft.cat_orders_wap")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(isolated).as("isolated"), lit(auditSaw).as("audit_saw"))
  }

  private val catWapSql =
    """WITH pub AS (
      |  SELECT o_orderstatus, o_totalprice FROM orders
      |  UNION ALL
      |  SELECT 'W', o_totalprice + 1.0 FROM orders WHERE o_orderkey % 5 = 0)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price,
      |  TRUE AS isolated, TRUE AS audit_saw
      |FROM pub GROUP BY 1""".stripMargin

  /** q351: CHANGE FEED OVER A MERGE-ON-READ COMMIT — q303's manifest-diff
    * CDC extended to `dv:` lines: a MoR MERGE commits insert files +
    * tombstone vectors (no data file removed), so the feed's PRE-IMAGES
    * are the rows the NEW vectors tombstone (read by joining the
    * decompressed (file, pos) tombstones back against their files' native
    * row ids — cost ∝ tombstones, never table) and the POST-IMAGES the
    * added files' rows; a full-outer join on the key classifies
    * update/delete/insert exactly as q303 does for COW. SAME oracle as
    * q303 (the q308 change model) — the feed must be identical no matter
    * which write mode produced the commit. */
  def catMorFeed(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_mfd", root)
    spark.sql("CALL graft.set_write_mode('cat_orders_mfd', 'mor')")
    val lo = mx / 2; val hi = lo + mx / 10
    changesView(spark, root, lo, hi, "mor_feed_changes")
    spark.sql(MergeSql.format("cat_orders_mfd", "mor_feed_changes"))
    val to = SnapshotStore.currentVersion(spark, root)
    val from = to - 1
    // pre-images: rows tombstoned by the vectors ADDED in (from, to]
    val newDvs = SnapshotStore.deleteVectors(spark, root, to)
      .filterNot(SnapshotStore.deleteVectors(spark, root, from).toSet)
    val tomb = SnapshotStore.tombstoneFrame(spark, newDvs)
      .select(SnapshotStore.normCol(col("file")).as("__t_file"),
        col("pos").as("__t_pos"))
    val pre = SnapshotStore.readWithRowId(spark, root, from)
      .join(tomb,
        SnapshotStore.normCol(col("__row_file")) === col("__t_file") &&
          col("__row_pos") === col("__t_pos"), "left_semi")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("pre_price"),
        col("o_orderpriority").as("pre_prio"))
    // post-images: the added data files' rows
    val before = SnapshotStore.files(spark, root, from)
      .map(Lakehouse.normPath).toSet
    val added = SnapshotStore.files(spark, root, to)
      .filterNot(f => before(Lakehouse.normPath(f)))
    val post = spark.read.parquet(added: _*)
      .select(col("o_orderkey").as("k2"), col("o_totalprice").as("post_price"),
        col("o_orderpriority").as("post_prio"))
    pre.join(post, col("k") === col("k2"), "full")
      .withColumn("op",
        when(col("k").isNull, lit("insert"))
          .when(col("k2").isNull, lit("delete"))
          .when(col("pre_price") =!= col("post_price") ||
            col("pre_prio") =!= col("post_prio"), lit("update"))
          .otherwise(lit("none")))
      .where(col("op") =!= "none")
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("pre_price")).as("pre_total"),
        graft.Exact.dsum2(col("post_price")).as("post_total"))
  }

  /** q352: ROLLBACK — `CALL graft.rollback(t, v)` restores a committed
    * version's state as a NEW commit (Iceberg's rollback_to_snapshot):
    * after a bad catalog DELETE, one metadata commit undoes it; the
    * table reads back EXACTLY the original (the oracle is the raw
    * corpus), the bad version stays time-travelable (`bad_visible`
    * pins it), and nothing is deleted (`history_intact`). */
  def catRollback(spark: SparkSession, dir: String): DataFrame = {
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_rb", root)
    val lo = mx / 10; val hi = lo + mx / 20
    spark.sql(
      s"DELETE FROM graft.cat_orders_rb WHERE o_orderkey BETWEEN $lo AND $hi")
    val badCount = spark.table("graft.cat_orders_rb").count()
    val r = spark.sql("CALL graft.rollback('cat_orders_rb', 1)").head()
    val restoredTo = r.getInt(0)
    // the bad version is still there, between the original and the undo
    val badVisible = spark.sql(
      s"""SELECT count(*) AS n FROM graft.cat_orders_rb
         |VERSION AS OF ${restoredTo - 1}""".stripMargin)
      .head().getLong(0) == badCount
    val historyIntact =
      SnapshotStore.versions(spark, root) == Seq(1, 2, 3)
    spark.table("graft.cat_orders_rb")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(badVisible).as("bad_visible"),
        lit(historyIntact).as("history_intact"))
  }

  private val catRollbackSql =
    s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("o_totalprice")} AS total_price,
       |  TRUE AS bad_visible, TRUE AS history_intact
       |FROM orders GROUP BY 1""".stripMargin

  /** q353: ORPHAN-FILE CLEANUP — `CALL graft.remove_orphans(t, grace)`:
    * a crashed writer that renamed its staged files into the root but
    * never committed leaks bytes no manifest references and no vacuum
    * can reach (vacuum GCs only manifest-referenced files). The
    * procedure deletes exactly the unreferenced-and-old files; the
    * table reads back unchanged under the oracle, the orphan is gone,
    * and every live file survives. */
  def catOrphans(spark: SparkSession, dir: String): DataFrame = {
    val (root, _) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_orph", root)
    // simulate the crash leak: an unreferenced parquet in the root
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = SnapshotStore.files(spark, root)
    val orphan = new org.apache.hadoop.fs.Path(root, "cat_dead0_0.parquet")
    org.apache.hadoop.fs.FileUtil.copy(f,
      new org.apache.hadoop.fs.Path(live.head), f, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    // age the orphan past any grace cutoff (a real leak is hours old)
    f.setTimes(orphan, System.currentTimeMillis() - 60000L, -1)
    val removed = spark.sql(
      "CALL graft.remove_orphans('cat_orders_orph', grace_ms => 0)")
      .head().getInt(0)
    val orphanGone = !f.exists(orphan)
    val liveIntact = live.forall(p =>
      f.exists(new org.apache.hadoop.fs.Path(p)))
    spark.table("graft.cat_orders_orph")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(removed == 1 && orphanGone).as("orphan_removed"),
        lit(liveIntact).as("live_intact"))
  }

  private val catOrphansSql =
    s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("o_totalprice")} AS total_price,
       |  TRUE AS orphan_removed, TRUE AS live_intact
       |FROM orders GROUP BY 1""".stripMargin

  /** q349: HOUR PARTITIONING — `PARTITIONED BY (hours(ts))`: the INSERT
    * shuffles on the catalog-resolved `hours` function, one file per UTC
    * hour lands annotated, and a one-hour probe plans ONLY that hour's
    * file(s) — the finest-grain edition of the days() ingest layout
    * (`pruned_ok` pins a strict planned subset). */
  def catHoursPartition(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ev_hours")
    spark.sql(
      """CREATE TABLE graft.ev_hours
        |  (event_id BIGINT, ts TIMESTAMP, event_type STRING)
        |PARTITIONED BY (hours(ts))""".stripMargin)
    graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .where(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
      .createOrReplaceTempView("evhours_src")
    spark.sql("INSERT INTO graft.ev_hours SELECT * FROM evhours_src")
    val root = s"$wh/ev_hours"
    val files = SnapshotStore.files(spark, root)
    val pv = SnapshotStore.partitionValuesOf(spark, root)
    val annotated = files.nonEmpty &&
      files.forall(f => pv.contains(SnapshotStore.uriPath(f)))
    val probe = spark.sql(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(event_id) AS lo_id, max(event_id) AS hi_id
        |FROM graft.ev_hours
        |WHERE ts >= TIMESTAMP '2024-01-01 05:00:00'
        |  AND ts < TIMESTAMP '2024-01-01 06:00:00'
        |GROUP BY event_type""".stripMargin)
    val planned = plannedParts(probe)
    val prunedOk = planned >= 1 && planned < files.size
    probe.select(col("event_type"), col("n"), col("lo_id"), col("hi_id"),
      lit(annotated).as("annotated"), lit(prunedOk).as("pruned_ok"))
  }

  private val catHoursPartitionSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  min(event_id) AS lo_id, max(event_id) AS hi_id,
      |  TRUE AS annotated, TRUE AS pruned_ok
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-01 05:00:00'
      |  AND ts < TIMESTAMP '2024-01-01 06:00:00'
      |GROUP BY 1""".stripMargin

  /** q354: SCOPED + BIN-PACKING COMPACTION — `CALL graft.compact(t,
    * buckets, cluster, where => '<pred>', min_files => n)`: the rewrite
    * admits files through the same manifest partition/zone pruning a scan
    * uses, so OPTIMIZE touches ONE partition's bytes at 100 TB, not the
    * table's. Here a status-partitioned, thrice-fragmented MoR orders
    * table takes per-partition deletes (vectors on 'F' and 'O'), then a
    * `where => status='F'` compaction: `untouched_ok` pins every
    * non-scoped partition's files byte-identical (path+len+mtime — the
    * q213 discipline), `scope_ok` that the F files were rewritten
    * bin-packed AND that a below-`min_files` call was a version-free
    * no-op, `vectors_ok` that exactly the F vectors reconciled while O's
    * survive. The oracle rebuilds the table from the change model. */
  def catScopedCompact(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshWarehouse(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ord_scomp")
    spark.sql(
      """CREATE TABLE graft.ord_scomp
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        |PARTITIONED BY (o_orderstatus)""".stripMargin)
    graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .createOrReplaceTempView("scomp_src")
    // fragment: three interleaved inserts -> >=3 files per partition
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO graft.ord_scomp SELECT * FROM scomp_src WHERE o_orderkey % 3 = $i"))
    val root = s"$wh/ord_scomp"
    SnapshotStore.setWriteMode(spark, root, "mor")
    spark.sql(
      "DELETE FROM graft.ord_scomp WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    spark.sql(
      "DELETE FROM graft.ord_scomp WHERE o_orderstatus = 'O' AND o_orderkey % 11 = 0")
    val before = SnapshotStore.files(spark, root)
    val pv = SnapshotStore.partitionValuesOf(spark, root)
    val scopedBefore = before.filter(f =>
      pv.get(SnapshotStore.uriPath(f)).contains("F")).toSet
    val untouched = before.toSet -- scopedBefore
    val cov = SnapshotStore.dvCoverage(spark, root)
    def dvsOf(files: Set[String]) = files.flatMap(f =>
      cov.getOrElse(SnapshotStore.uriPath(f), Nil)).map(SnapshotStore.uriPath)
    val (dvF, dvO) = (dvsOf(scopedBefore), dvsOf(untouched))
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamp(p: String) = {
      val st = fsys.getFileStatus(new org.apache.hadoop.fs.Path(p))
      (st.getLen, st.getModificationTime)
    }
    val stamps = untouched.map(f => f -> stamp(f)).toMap
    // below the bin-packing floor: a version-free no-op
    val v0 = SnapshotStore.currentVersion(spark, root)
    spark.sql("CALL graft.compact(table => 'ord_scomp', buckets => 1, " +
      "where => 'o_orderstatus = \\'F\\'', min_files => 1000)")
    val noopOk = SnapshotStore.currentVersion(spark, root) == v0
    spark.sql("CALL graft.compact(table => 'ord_scomp', buckets => 1, " +
      "cluster_col => 'o_orderkey', where => 'o_orderstatus = \\'F\\'', " +
      "min_files => 2)")
    val after = SnapshotStore.files(spark, root).toSet
    val untouchedOk = untouched.subsetOf(after) &&
      untouched.forall(f => stamp(f) == stamps(f))
    val scopeOk = noopOk && (after intersect scopedBefore).isEmpty &&
      (after -- untouched).size < scopedBefore.size
    val dvAfter = SnapshotStore.deleteVectors(spark, root)
      .map(SnapshotStore.uriPath).toSet
    val vectorsOk = dvAfter == dvO && (dvAfter intersect dvF).isEmpty
    spark.table("graft.ord_scomp")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(untouchedOk).as("untouched_ok"), lit(scopeOk).as("scope_ok"),
        lit(vectorsOk).as("vectors_ok"))
  }

  private val catScopedCompactSql =
    s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("o_totalprice")} AS total_price,
       |  TRUE AS untouched_ok, TRUE AS scope_ok, TRUE AS vectors_ok
       |FROM orders
       |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
       |  AND NOT (o_orderstatus = 'O' AND o_orderkey % 11 = 0)
       |GROUP BY 1""".stripMargin

  /** q355: EQUALITY-DELETE STREAMING UPSERT — the no-read-before-write
    * CDC path (q290's twin with the read half removed): each micro-batch
    * commits its rows as insert files PLUS one `eq:` key-tombstone file
    * ([[graft.catalog.GraftUpsert]]), sequenced to delete matching keys
    * only in EARLIER files; the target is NEVER scanned during the write
    * (`no_read_ok` pins the SnapshotScan construction counter flat across
    * the whole stream), a replayed epoch is a version-free no-op
    * (`replay_ok` — exactly-once from at-least-once), and the final
    * catalog read — the eq anti-probe inside the vectorized scan — is
    * graded by the same change-model oracle as the COW merge family. */
  def catEqUpsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val (root, mx) = Lakehouse.initStore(spark, dir)
    GraftCatalog.register(spark, "cat_orders_eq", root)
    val lo = mx / 2; val hi = lo + mx / 10
    val ch = SnapshotStore.read(spark, root)
      .where(col("o_orderkey").between(lo, hi)).localCheckpoint()
    val changes = ch.where(col("o_orderkey") % 3 <= 1)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("E").as("o_orderstatus"),
        (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
        col("o_orderdate"), lit("EQU").as("o_orderpriority"))
      .unionByName(ch.where(col("o_orderkey") % 3 === 2)
        .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))
    val stage = java.nio.file.Files.createTempDirectory("graft_equps")
    graft.streaming.EventStreams.deleteTreeOnExit(stage)
    changes.repartition(3).write.mode("overwrite").parquet(stage.toString)
    val ck = java.nio.file.Files.createTempDirectory("graft_equps_ck")
    graft.streaming.EventStreams.deleteTreeOnExit(ck)
    val scansBefore = graft.catalog.SnapshotScan.created.get()
    val qid = "equps_" + java.util.UUID.randomUUID().toString.take(8)
    val q = spark.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
      .writeStream.option("checkpointLocation", ck.toString)
      .foreachBatch((b: DataFrame, e: Long) => {
        graft.catalog.GraftUpsert.upsert(spark, root, b,
          Seq("o_orderkey"), qid, e)
        ()
      })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val noReadOk = graft.catalog.SnapshotScan.created.get() == scansBefore
    // replay: redelivering an already-stamped epoch commits NOTHING
    val vBefore = SnapshotStore.currentVersion(spark, root)
    graft.catalog.GraftUpsert.upsert(spark, root,
      spark.read.parquet(stage.toString), Seq("o_orderkey"), qid, 0L)
    val replayOk = SnapshotStore.currentVersion(spark, root) == vBefore &&
      vBefore > 1
    spark.table("graft.cat_orders_eq")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(noReadOk).as("no_read_ok"), lit(replayOk).as("replay_ok"))
  }

  private val catEqUpsertSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 2) AS lo,
       |         (max(o_orderkey) // 2) + (max(o_orderkey) // 10) AS hi
       |  FROM orders),
       |ch AS (SELECT o_orderkey, o_totalprice FROM orders, rng
       |       WHERE o_orderkey BETWEEN lo AND hi),
       |ups AS (
       |  SELECT 'E' AS o_orderstatus, o_totalprice + 1000.0 AS p
       |  FROM ch WHERE o_orderkey % 3 <= 1
       |  UNION ALL
       |  SELECT 'N', o_totalprice FROM ch WHERE o_orderkey % 3 = 2),
       |kept AS (
       |  SELECT o_orderstatus, o_totalprice AS p FROM orders, rng
       |  WHERE NOT (o_orderkey BETWEEN lo AND hi AND o_orderkey % 3 <= 1))
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("p")} AS total_price,
       |  TRUE AS no_read_ok, TRUE AS replay_ok
       |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ups)
       |GROUP BY 1""".stripMargin

  /** q356: STREAMING CHANGE-DATA-FEED READ — `readStream.table(
    * "graft.t.changes")` (Iceberg's changelog-table surface): manifest
    * versions are offsets and batch n is EXACTLY version n's classified
    * feed, so the change commits the plain table stream must fail/skip on
    * (COW rewrites, MoR vector deletes) arrive as `_change_type` +
    * `_commit_version` rows. The entry drains an INSERT → COW UPDATE →
    * MoR DELETE chain from genesis (`startingVersion=0`), net-classifies
    * per (key, version) — carry-over delete+insert pairs cancel — and is
    * graded by the change-model oracle; `batch_matches` pins that the
    * BATCH feed read returns the identical row multiset. */
  def catCdfStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val (root, mx) = Lakehouse.initStore(spark, dir) // v1
    GraftCatalog.register(spark, "cat_orders_cdf", root)
    graft.Tables(spark, dir, "orders").where(col("o_orderkey") % 5 === 0)
      .select((col("o_orderkey") + lit(900000000L)).as("o_orderkey"),
        col("o_custkey"), lit("C").as("o_orderstatus"),
        (col("o_totalprice") + lit(2.0)).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .createOrReplaceTempView("cdf_ins")
    spark.sql("INSERT INTO graft.cat_orders_cdf SELECT * FROM cdf_ins") // v2
    val lo = mx / 2; val hi = lo + mx / 20
    spark.sql(
      s"""UPDATE graft.cat_orders_cdf
         |SET o_totalprice = o_totalprice + 1.0, o_orderpriority = 'UPD'
         |WHERE o_orderkey BETWEEN $lo AND $hi""".stripMargin) // v3 (COW)
    spark.sql("CALL graft.set_write_mode('cat_orders_cdf', 'mor')") // v4
    val dlo = mx / 10; val dhi = dlo + mx / 20
    spark.sql(
      s"""DELETE FROM graft.cat_orders_cdf
         |WHERE o_orderkey BETWEEN $dlo AND $dhi""".stripMargin) // v5 (MoR)
    val out = java.nio.file.Files.createTempDirectory("graft_cdf_out")
    val ck = java.nio.file.Files.createTempDirectory("graft_cdf_ck")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    graft.streaming.EventStreams.deleteTreeOnExit(ck)
    val q = spark.readStream.option("startingVersion", "0")
      .table("graft.cat_orders_cdf.changes")
      .writeStream
      .foreachBatch(graft.streaming.EventStreams.batchSink(out, "append"))
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feed = spark.read.option("recursiveFileLookup", "true")
      .parquet(out.toString).localCheckpoint()
    val batchMatches =
      spark.table("graft.cat_orders_cdf.changes").count() == feed.count()
    val pre = feed.where(col("_change_type") === "delete")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("pre_price"),
        col("o_orderpriority").as("pre_prio"), col("_commit_version").as("v"))
    val post = feed.where(col("_change_type") === "insert")
      .select(col("o_orderkey").as("k2"),
        col("o_totalprice").as("post_price"),
        col("o_orderpriority").as("post_prio"),
        col("_commit_version").as("v2"))
    pre.join(post, col("k") === col("k2") && col("v") === col("v2"), "full")
      .withColumn("op",
        when(col("k").isNull, lit("insert"))
          .when(col("k2").isNull, lit("delete"))
          .when(col("pre_price") =!= col("post_price") ||
            col("pre_prio") =!= col("post_prio"), lit("update"))
          .otherwise(lit("none")))
      .where(col("op") =!= "none")
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum2(col("pre_price")).as("pre_total"),
        graft.Exact.dsum2(col("post_price")).as("post_total"))
      .select(col("op"), col("n"), col("pre_total"), col("post_total"),
        lit(batchMatches).as("batch_matches"))
  }

  private val catCdfStreamSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 2) AS lo,
       |         (max(o_orderkey) // 2) + (max(o_orderkey) // 20) AS hi,
       |         (max(o_orderkey) // 10) AS dlo,
       |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS dhi
       |  FROM orders),
       |ivals AS (
       |  SELECT o_totalprice AS p FROM orders
       |  UNION ALL
       |  SELECT o_totalprice + 2.0 FROM orders WHERE o_orderkey % 5 = 0),
       |upd AS (SELECT o_totalprice AS p FROM orders, rng
       |        WHERE o_orderkey BETWEEN lo AND hi),
       |del AS (SELECT o_totalprice AS p FROM orders, rng
       |        WHERE o_orderkey BETWEEN dlo AND dhi)
       |SELECT 'insert' AS op, CAST(count(*) AS BIGINT) AS n,
       |  CAST(NULL AS DOUBLE) AS pre_total,
       |  ${graft.Exact.sqlSum2("p")} AS post_total, TRUE AS batch_matches
       |FROM ivals
       |UNION ALL
       |SELECT 'update', count(*), ${graft.Exact.sqlSum2("p")},
       |  ${graft.Exact.sqlSum2("p + 1.0")}, TRUE
       |FROM upd
       |UNION ALL
       |SELECT 'delete', count(*), ${graft.Exact.sqlSum2("p")},
       |  CAST(NULL AS DOUBLE), TRUE
       |FROM del""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q319_cat_merge", catMerge, Some(Lakehouse.snapMergeSql)),
    QueryDef("q320_cat_delete", catDelete, Some(SqlDml.sqlDeleteSql)),
    QueryDef("q321_cat_update", catUpdate, Some(SqlDml.sqlUpdateSql)),
    QueryDef("q322_cat_time_travel", catTimeTravel,
      Some(SqlDml.sqlTimeTravelSql)),
    QueryDef("q329_cat_mor", catMorRead, Some(catMorReadSql)),
    QueryDef("q330_cat_ddl", catDdl, Some(catDdlSql)),
    QueryDef("q331_cat_ctas", catCtas, Some(catCtasSql)),
    QueryDef("q332_cat_timestamp", catTimestampTravel, Some(catTimestampSql)),
    QueryDef("q333_cat_stream", catStream, Some(catStreamSql)),
    QueryDef("q334_cat_mor_dml", catMorDml, Some(catMorDmlSql)),
    QueryDef("q335_cat_procedures", catProcedures, Some(catProceduresSql)),
    QueryDef("q336_cat_stream_read", catStreamRead, Some(catStreamReadSql)),
    QueryDef("q337_cat_zorder", catZorder, Some(catZorderSql)),
    QueryDef("q338_cat_partition_insert", catPartitionWrite,
      Some(catPartitionWriteSql)),
    QueryDef("q339_cat_days_partition", catDaysPartition,
      Some(catDaysPartitionSql)),
    QueryDef("q340_cat_bucket_partition", catBucketPartition,
      Some(catBucketPartitionSql)),
    QueryDef("q341_cat_zorder3", catZorder3, Some(catZorder3Sql)),
    QueryDef("q343_cat_rename", catRename, Some(catRenameSql)),
    QueryDef("q344_cat_spj", catSpj, Some(catSpjSql)),
    QueryDef("q345_cat_meta_count", catMetaCount, Some(catMetaCountSql)),
    QueryDef("q346_cat_ts_zones", catTsZones, Some(catTsZonesSql)),
    QueryDef("q347_cat_meta_typed", catMetaTyped, Some(catMetaTypedSql)),
    QueryDef("q348_cat_widen", catWiden, Some(catWidenSql)),
    QueryDef("q349_cat_hours", catHoursPartition,
      Some(catHoursPartitionSql)),
    QueryDef("q350_cat_wap", catWap, Some(catWapSql)),
    QueryDef("q351_mor_feed", catMorFeed, Some(Lakehouse.changeFeedSql)),
    QueryDef("q352_cat_rollback", catRollback, Some(catRollbackSql)),
    QueryDef("q353_cat_orphans", catOrphans, Some(catOrphansSql)),
    QueryDef("q354_scoped_compact", catScopedCompact,
      Some(catScopedCompactSql)),
    QueryDef("q355_eq_upsert", catEqUpsert, Some(catEqUpsertSql)),
    QueryDef("q356_cdf_stream", catCdfStream, Some(catCdfStreamSql)))
}
