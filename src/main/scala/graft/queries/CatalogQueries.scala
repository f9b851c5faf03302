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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q319_cat_merge", catMerge, Some(Lakehouse.snapMergeSql)),
    QueryDef("q320_cat_delete", catDelete, Some(SqlDml.sqlDeleteSql)),
    QueryDef("q321_cat_update", catUpdate, Some(SqlDml.sqlUpdateSql)),
    QueryDef("q322_cat_time_travel", catTimeTravel,
      Some(SqlDml.sqlTimeTravelSql)),
    QueryDef("q329_cat_mor", catMorRead, Some(catMorReadSql)))
}
