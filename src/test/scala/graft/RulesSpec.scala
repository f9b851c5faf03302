package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must rewrite naive levenshtein range
  * predicates to the banded form without changing results. */
class RulesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("levenshtein <= k is rewritten to the banded threshold form") {
    val p = Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val naive = p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
      .select(col("a.p_partkey"), col("b.p_partkey"))

    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein(") && optimized.contains("Some(3)"),
      optimized.take(800))

    // Same rows as the explicitly-banded q76 form.
    assert(naive.count() ==
      SparkEntry.queries("q76_edit_distance")(spark, sf).count())
  }

  test("array_contains join is rewritten to an exploded equi join") {
    import spark.implicits._
    val probes = Seq(
      (1L, Seq(2, 3)), (2L, Seq(3, 3, 9)), // duplicate element: one pair
      (3L, Seq.empty[Int]), (4L, null)     // empty + null arrays: no pairs
    ).toDF("qid", "buckets")
    val corpus = Seq((10L, 2), (11L, 3), (12L, 7)).toDF("vid", "bucket")

    val joined = corpus.join(probes,
      array_contains(col("buckets"), col("bucket")))
      .select(col("qid"), col("vid"))

    // logical: the Generate(explode) replaced the non-equi predicate
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("Generate explode"), opt.take(800))
    // physical: a hash join, not a nested loop
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(800))

    val got = joined.as[(Long, Long)].collect().toSet
    // reference semantics, computed driver-side
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L)), got)

    // an existing cross-side equi key suppresses the rewrite (hash join on
    // it + post-filter beats exploding the build side)
    val keyed = corpus.join(probes,
      col("vid") === col("qid") * 5L &&
        array_contains(col("buckets"), col("bucket")))
    assert(!keyed.queryExecution.optimizedPlan.toString
      .contains("Generate explode"))
    // qid=2 -> vid=10 is the only equi match, but bucket 2 is not in
    // [3,3,9], so the post-filter drops it: empty result in both forms
    assert(keyed.count() == 0L)
  }

  test("vector folds rewrite to the native dot_d / l2sq_l expressions") {
    import spark.implicits._
    // arrays built from non-nullable columns -> containsNull = false,
    // the schema proof the rule requires
    val base = spark.range(100)
      .select(col("id"),
        array(col("id").cast("double"), lit(2.0), (col("id") * 3).cast("double")).as("a"),
        array(lit(1.0), col("id").cast("double"), lit(0.5)).as("b"),
        array(col("id"), lit(2L)).as("la"),
        array(lit(7L), col("id") * 2).as("lb"))
    val dotFold =
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)"
    val l2Fold =
      "aggregate(zip_with(la, lb, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)"
    val df = base.select(col("id"),
      expr(dotFold).as("dot"), expr(l2Fold).as("l2"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("dot_d("), opt.take(800))
    assert(opt.contains("l2sq_l("), opt.take(800))
    assert(!opt.contains("aggregate("), opt.take(800))
    // values identical to the un-rewritten folds (computed via the
    // natives directly, which FunctionsSpec already pins to the folds)
    val got = df.orderBy("id").collect()
    val want = base.orderBy("id")
      .select(graft.functions.dot_d($"a", $"b"), graft.functions.l2sq_l($"la", $"lb"))
      .collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getDouble(1) == w.getDouble(0) && g.getLong(2) == w.getLong(1))
    }
    // NOT rewritten when the schema cannot prove non-null elements: a
    // parquet-read array keeps containsNull = true
    val emb = Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (s, v2) -> s + v2)"))
    val embOpt = emb.queryExecution.optimizedPlan.toString
    assert(embOpt.contains("aggregate("), embOpt.take(800))
    // unequal lengths stay null after the rewrite (zip_with pad parity)
    val uneq = spark.range(1)
      .select(array(lit(1.0), lit(2.0)).as("a"), array(lit(3.0)).as("b"))
      .select(expr(dotFold))
    assert(uneq.head.isNullAt(0))
  }

  test("rewrite preserves semantics on random string pairs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Reference implementation: textbook DP edit distance.
    def edit(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val pairs = (1L to 200L).flatMap { seed =>
      for {
        a <- strGen(Gen.Parameters.default, Seed(seed))
        b <- strGen(Gen.Parameters.default, Seed(seed + 10000))
      } yield (a, b)
    }
    val df = spark.createDataFrame(pairs).toDF("l", "r")
    for (k <- Seq(0, 1, 3)) {
      val got = df.where(levenshtein(col("l"), col("r")) <= k)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = pairs.filter { case (a, b) => edit(a, b) <= k }.toSet
      assert(got == want, s"k=$k")
    }
  }

  test("rewrite preserves levenshtein semantics on edge cases") {
    val df = spark.createDataFrame(Seq(
      ("", ""), ("abc", "abc"), ("abc", "abd"), ("abc", "xyz"),
      ("a", "abcde"), ("kitten", "sitting"))).toDF("l", "r")
    val got = df.where(levenshtein(col("l"), col("r")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("", ""), ("abc", "abc"), ("abc", "abd")))
  }

  test("materialized-view rule substitutes the defining subplan exactly") {
    def defining = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "" && length(col("t")) >= 7) // unique to this test
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    def consumer = defining.orderBy(col("cnt").desc, col("t")).limit(5)
    // control: no registration -> the consumer plans the full pipeline
    val before = consumer.queryExecution.executedPlan.toString
    assert(before.contains("Generate explode"), before.take(600))
    val baseline = consumer.collect().map(r => (r.getString(0), r.getLong(1)))
    try {
      graft.plans.MatViewRule.register(spark, defining, "graft_mv_rulespec")
      val after = consumer.queryExecution.executedPlan.toString
      assert(after.contains("graft_mv_rulespec"), after.take(600))
      assert(!after.contains("Generate explode"), after.take(600))
      // substitution is invisible to results
      val got = consumer.collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.sameElements(baseline))
      // containment: a consumer with ITS OWN filter above the view subtree
      // still rewrites — the Project restores the defining plan's exprIds,
      // so the outer filter's references resolve against the table scan
      val filtered = defining.where(col("cnt") >= 2)
      val fPlan = filtered.queryExecution.executedPlan.toString
      assert(fPlan.contains("graft_mv_rulespec") &&
        !fPlan.contains("Generate explode"), fPlan.take(600))
      // a DIFFERENT aggregate over the same source must NOT be rewritten
      val other = Tables(spark, sf, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .where(col("t") =!= "" && length(col("t")) >= 7)
        .groupBy(col("t")).agg(sum(length(col("t"))).as("chars"))
      val otherPlan = other.queryExecution.executedPlan.toString
      assert(!otherPlan.contains("graft_mv_rulespec"), otherPlan.take(600))
    } finally graft.plans.MatViewRule.clear()
  }

  test("matview roll-up: a coarser grain is answered from the finer view; non-re-aggregables decline") {
    import graft.plans.MatViewRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("rollupspec")
    (1L to 100L).map(k => (k % 10, k % 3, k, k * 1.5))
      .toDF("g1", "g2", "x", "y").write.parquet(s"$out/base.parquet")
    def base = spark.read.parquet(s"$out/base.parquet")
    def scansView(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("graft_mv_rollupspec")
    val defining = base.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("c"), count(col("x")).as("cx"),
        sum(col("x")).as("sx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"))
    try {
      MatViewRule.register(spark, defining, "graft_mv_rollupspec")
      // coarser grain: every aggregate re-aggregates from the view
      def coarse = base.groupBy(col("g1"))
        .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"),
          min(col("y")).as("mny"), max(col("y")).as("mxy"))
      assert(scansView(coarse), coarse.queryExecution.optimizedPlan)
      val got = coarse.orderBy(col("g1")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))
      // a grouping EXPRESSION over view keys rolls up too (week-from-day)
      val exprGrain = base.groupBy((col("g1") % 2).as("parity"))
        .agg(sum(col("x")).as("sx"))
      assert(scansView(exprGrain), exprGrain.queryExecution.optimizedPlan)
      val gotExpr = exprGrain.orderBy(col("parity")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // AVG rolls up from the stored (sum_x, count_x) partials — exact
      // here: integral x, integer-valued double sums below 2^53
      def avgC = base.groupBy(col("g1")).agg(avg(col("x")).as("a"))
      assert(scansView(avgC), avgC.queryExecution.optimizedPlan)
      val gotAvg = avgC.orderBy(col("g1")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      // COUNT(DISTINCT k) over a VIEW KEY rolls up exactly (the view
      // holds every distinct key combination)
      def cdC = base.groupBy(col("g1"))
        .agg(countDistinct(col("g2")).as("d"))
      assert(scansView(cdC), cdC.queryExecution.optimizedPlan)
      val gotCd = cdC.orderBy(col("g1")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // declines — each keeps the from-scratch plan, never fails:
      // COUNT(DISTINCT measure) cannot roll up (x is not a view key;
      // the view's sum partial cannot recover x's distinct values)
      assert(!scansView(base.groupBy(col("g1"))
        .agg(countDistinct(col("x")).as("d"))))
      // AVG of a column with no stored count-of-x partial declines when
      // the column is nullable (parquet) — count(*) would miscount NULLs
      assert(!scansView(base.groupBy(col("g1")).agg(avg(col("y")).as("a"))))
      // a grouping key that is NOT a view key (a measure) declines
      assert(!scansView(base.groupBy(col("x")).agg(count(lit(1)).as("c"))))
      // an aggregate over a column the view never stored declines
      assert(!scansView(base.groupBy(col("g1"))
        .agg(sum(col("y")).as("sy"))))
      // ground truth: rolled-up results equal the from-scratch ones
      MatViewRule.clear()
      val expected = coarse.orderBy(col("g1")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))
      assert(got.sameElements(expected))
      MatViewRule.register(spark, defining, "graft_mv_rollupspec")
      assert(gotExpr.sameElements(base.groupBy((col("g1") % 2).as("parity"))
        .agg(sum(col("x")).as("sx")).orderBy(col("parity")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))))
      // ground truth for the AVG and COUNT DISTINCT roll-ups
      MatViewRule.clear()
      assert(gotAvg.sameElements(
        base.groupBy(col("g1")).agg(avg(col("x")).as("a"))
          .orderBy(col("g1")).collect()
          .map(r => (r.getLong(0), r.getDouble(1)))))
      assert(gotCd.sameElements(
        base.groupBy(col("g1")).agg(countDistinct(col("g2")).as("d"))
          .orderBy(col("g1")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))))
      MatViewRule.register(spark, defining, "graft_mv_rollupspec")
      // staleness: the base changes -> the roll-up declines
      Seq((99L, 99L, 1L, 1.0)).toDF("g1", "g2", "x", "y")
        .write.mode("append").parquet(s"$out/base.parquet")
      assert(!scansView(base.groupBy(col("g1"))
        .agg(count(lit(1)).as("c"))))
    } finally MatViewRule.clear()
  }

  test("matview sketch roll-up: stored theta sketches answer non-key COUNT DISTINCT under the opt-in") {
    import graft.plans.MatViewRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("sketchrollup")
    // x: a non-key measure with ~500 distinct values scattered over groups
    (1L to 5000L).map(k => (k % 10, (k * 2654435761L) % 500L))
      .toDF("g1", "x").write.parquet(s"$out/base.parquet")
    def base = spark.read.parquet(s"$out/base.parquet")
    def scansView(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("graft_mv_sketch")
    // the defining view stores a THETA SKETCH of x per group (plus count)
    val defining = base.groupBy(col("g1"))
      .agg(count(lit(1)).as("c"), expr("theta_sketch_agg(x)").as("sk_x"))
    val confKey = "spark.graft.matview.approxDistinctRollup"
    try {
      MatViewRule.register(spark, defining, "graft_mv_sketch")
      def coarse = base.groupBy((col("g1") % 2).as("parity"))
        .agg(countDistinct(col("x")).as("d"))
      // DEFAULT: the transparent tier never silently approximates
      assert(!scansView(coarse), "sketch roll-up fired without the opt-in")
      val exact = coarse.orderBy(col("parity")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // OPT-IN: the non-key COUNT DISTINCT rolls up via theta union
      spark.conf.set(confKey, "true")
      assert(scansView(coarse), coarse.queryExecution.optimizedPlan.toString)
      val est = coarse.orderBy(col("parity")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // the documented bound: EXACT below the sketch's nominal k (default
      // lg_k=12 → 4096); ~500 distincts per side is deep in exact mode
      assert(est.sameElements(exact),
        s"sketch estimate ${est.toSeq} vs exact ${exact.toSeq}")
      // an expression with NO stored sketch still declines under the opt-in
      assert(!scansView(base.groupBy((col("g1") % 2).as("parity"))
        .agg(countDistinct(col("x") + 1).as("d"))))
    } finally {
      spark.conf.unset(confKey)
      MatViewRule.clear()
    }
  }

  test("matview lifecycle: staleness declines, re-register, attach, sessions") {
    import graft.plans.MatViewRule
    val out = java.nio.file.Files.createTempDirectory("graft_mv_spec")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val baseDir = s"$out/base"
    Tables(spark, sf, "orders")
      .where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .write.parquet(baseDir)
    def defining = spark.read.parquet(baseDir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val t = "graft_mvlife_view"
    try {
      MatViewRule.register(spark, defining, t,
        partitionBy = Seq("o_orderpriority"))
      assert(planOf(defining).contains(t), planOf(defining).take(400))
      val baseline = defining.collect().map(r => (r.getString(0), r.getLong(1))).toSet

      // STALE: the base grows a file -> a fresh consumer must DECLINE the
      // rewrite (fingerprint mismatch) and still be correct
      Tables(spark, sf, "orders")
        .where(col("o_orderkey") % 3 === 1).limit(7)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .write.mode("append").parquet(baseDir)
      val stale = defining
      assert(!planOf(stale).contains(t), planOf(stale).take(400))
      val freshRows = stale.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(freshRows != baseline) // the declined plan sees the NEW data

      // REFRESH re-validates: consumer substitutes again and reads the
      // refreshed table (values = the fresh ones, not the stale baseline).
      // (An UNPARTITIONED registration must refuse the incremental path —
      // dynamic overwrite would truncate it to just the changed rows.)
      MatViewRule.register(spark, defining, "graft_mvlife_flat")
      intercept[IllegalArgumentException] {
        MatViewRule.refresh(spark, defining, "graft_mvlife_flat", "o_orderpriority")
      }
      MatViewRule.refresh(spark, defining, t, "o_orderpriority")
      assert(planOf(defining).contains(t), planOf(defining).take(400))
      assert(defining.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == freshRows)

      // RE-REGISTRATION must not record a self-referential key (the old
      // entry would rewrite the defining plan to its own view scan while
      // the key is computed): after re-register, a fresh consumer still
      // substitutes — with a self-referential key it could not match
      MatViewRule.register(spark, defining, t)
      assert(planOf(defining).contains(t), planOf(defining).take(400))

      // SESSION SCOPING: another session in the same JVM shares the
      // catalog but must NOT have its plans rewritten by this session's
      // registration
      val s2 = spark.newSession()
      val foreign = s2.read.parquet(baseDir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!planOf(foreign).contains(t), planOf(foreign).take(400))

      // PERSISTENCE: simulate a new process — the in-memory registry dies
      // (clear), the table + sidecar survive; attach() re-enters the
      // registration WITHOUT re-materializing iff the snapshot matches
      MatViewRule.clear()
      assert(!planOf(defining).contains(t))
      assert(MatViewRule.attach(spark, defining, t))
      assert(planOf(defining).contains(t), planOf(defining).take(400))

      // attach on a STALE sidecar must refuse
      Tables(spark, sf, "orders")
        .where(col("o_orderkey") % 3 === 2).limit(5)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .write.mode("append").parquet(baseDir)
      MatViewRule.clear()
      assert(!MatViewRule.attach(spark, defining, t))
      assert(!planOf(defining).contains(t))
    } finally MatViewRule.clear()
  }

  test("zone-map rule prunes files, keeps results, and declines correctly") {
    import graft.plans.SkippingIndexRule
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    def filesIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    val layout = java.nio.file.Files.createTempDirectory("zonerule").toString + "/t"
    (0L until 100L).map(k => (k, k * 10)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.parquet(layout)
    try {
      SkippingIndexRule.buildZoneMap(spark, layout, "k")

      // point predicate: one file survives, rows identical to the truth
      val point = spark.read.parquet(layout).where(col("k") === 5L)
      assert(filesIn(point) == 1, filesIn(point))
      assert(point.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((5L, 50L)))

      // range predicate prunes to the tail file(s); count is exact
      val range = spark.read.parquet(layout).where(col("k") >= 90L)
      assert(filesIn(range) < 4, filesIn(range))
      assert(range.count() == 10)

      // unsatisfiable predicate: every file excluded -> empty, no scan
      val none = spark.read.parquet(layout).where(col("k") === -1L)
      assert(filesIn(none) == 0, filesIn(none))
      assert(none.count() == 0)

      // column selection above the filter (pruning Project shape) still prunes
      val proj = spark.read.parquet(layout).where(col("k") === 5L).select(col("v"))
      assert(filesIn(proj) == 1, filesIn(proj))
      assert(proj.collect().map(_.getLong(0)).toSeq == Seq(50L))

      // an untyped-equal literal via coercion is FINE (Catalyst folds the
      // string literal to a long before the rule runs) — still prunes
      val coerced = spark.read.parquet(layout).where(col("k") === lit("5"))
      assert(filesIn(coerced) == 1, filesIn(coerced))

      // but a comparison whose zone ATTRIBUTE stays cast-wrapped declines
      val cast = spark.read.parquet(layout)
        .where(col("k").cast("string") === lit("5"))
      assert(filesIn(cast) == 4, filesIn(cast))
      assert(cast.count() == 1)

      // a file APPENDED after registration is unknown to the map: it must
      // be kept unconditionally, so its rows are never lost
      Seq((1000L, 7L)).toDF("k", "v").write.mode("append").parquet(layout)
      val late = spark.read.parquet(layout).where(col("k") === 1000L)
      assert(late.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1000L, 7L)))
      assert(filesIn(late) < 5, filesIn(late)) // known files still pruned

      // a registration from ANOTHER session never fires here
      SkippingIndexRule.drop(spark, layout)
      val other = spark.newSession()
      SkippingIndexRule.buildZoneMap(other, layout, "k")
      val foreign = spark.read.parquet(layout).where(col("k") === 5L)
      assert(filesIn(foreign) == 5, filesIn(foreign))
    } finally SkippingIndexRule.clear()
  }

  test("bloom index prunes point lookups; zone + bloom indexes intersect") {
    import graft.plans.SkippingIndexRule
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    def filesIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    val layout = java.nio.file.Files.createTempDirectory("bloomrule").toString + "/t"
    // range-clustered on k; id is UNCORRELATED with the layout (reversed),
    // so only a content index can prune id lookups
    (0L until 100L).map(k => (k, 99L - k)).toDF("k", "id")
      .repartitionByRange(4, col("k")).write.parquet(layout)
    try {
      SkippingIndexRule.buildBloom(spark, layout, "id")

      // single-id lookup: the one containing file survives (up to bloom FPs
      // at p ~1e-4 for m=2^16, n=25: none here)
      val one = spark.read.parquet(layout).where(col("id") === 7L)
      assert(filesIn(one) == 1, filesIn(one))
      assert(one.collect().map(_.getLong(0)).toSeq == Seq(92L))

      // IN list spanning two files keeps exactly those two
      val two = spark.read.parquet(layout)
        .where(col("id").isin(7L, 93L))
      assert(filesIn(two) == 2, filesIn(two))
      assert(two.collect().map(_.getLong(0)).toSet == Set(92L, 6L))

      // an id that exists nowhere: every file's k-of-k test fails -> empty
      val miss = spark.read.parquet(layout).where(col("id") === 1000L)
      assert(filesIn(miss) == 0, filesIn(miss))
      assert(miss.count() == 0)

      // zone (on k) + bloom (on id) INTERSECT: k's range admits 2 files,
      // id's bloom admits 1 — the conjunction reads their intersection
      SkippingIndexRule.buildZoneMap(spark, layout, "k")
      val both = spark.read.parquet(layout)
        .where(col("k") >= 50L && col("id") === 7L)
      assert(filesIn(both) == 1, filesIn(both))
      assert(both.collect().map(_.getLong(0)).toSeq == Seq(92L))
      // ...and a conjunction whose parts admit DISJOINT file sets is empty
      val disjoint = spark.read.parquet(layout)
        .where(col("k") < 25L && col("id") === 7L) // id 7 lives at k=92
      assert(filesIn(disjoint) == 0, filesIn(disjoint))
      assert(disjoint.count() == 0)

      // a file appended after registration is unknown to the bloom: kept
      Seq((1000L, 7L)).toDF("k", "id").write.mode("append").parquet(layout)
      val late = spark.read.parquet(layout).where(col("id") === 7L)
      assert(late.collect().map(_.getLong(0)).toSet == Set(92L, 1000L))
      assert(filesIn(late) == 2, filesIn(late)) // known files still pruned
    } finally SkippingIndexRule.clear()
  }

  test("skipping indexes persist: save/attach round-trip, in-place change declines") {
    import graft.plans.SkippingIndexRule
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    def filesIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    val layout = java.nio.file.Files.createTempDirectory("idxpersist").toString + "/t"
    (0L until 100L).map(k => (k, 99L - k)).toDF("k", "id")
      .repartitionByRange(4, col("k")).write.parquet(layout)
    try {
      SkippingIndexRule.buildZoneMap(spark, layout, "k")
      SkippingIndexRule.buildBloom(spark, layout, "id")
      assert(SkippingIndexRule.save(spark, layout) == 2)

      // "new process": registry gone, sidecar adopts both indexes
      SkippingIndexRule.clear()
      assert(filesIn(spark.read.parquet(layout).where(col("k") === 5L)) == 4)
      assert(SkippingIndexRule.attach(spark, layout) == 2)
      val zone = spark.read.parquet(layout).where(col("k") === 5L)
      assert(filesIn(zone) == 1, filesIn(zone))
      assert(zone.collect().map(_.getLong(1)).toSeq == Seq(94L))
      val bloom = spark.read.parquet(layout).where(col("id") === 7L)
      assert(filesIn(bloom) == 1, filesIn(bloom))

      // a data file CHANGED IN PLACE (same path, new mtime): its
      // statistics can no longer be trusted — attach declines the index
      SkippingIndexRule.clear()
      val part = new java.io.File(layout).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.setLastModifiedTime(part,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 60000))
      assert(SkippingIndexRule.attach(spark, layout) == 0)
      assert(filesIn(spark.read.parquet(layout).where(col("k") === 5L)) == 4)
    } finally SkippingIndexRule.clear()
  }

  test("join reorder: stats order the chain, declines are surgical") {
    import graft.plans.JoinReorderRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("reorderspec")
    // fact(10k rows), dimA (1000 rows, filter ndv 2 -> est 500),
    // dimB (100 rows, no filter -> est 100): planned order dimB, dimA
    (1L to 10000L).map(k => (k, k % 1000 + 1, k % 100 + 1))
      .toDF("f_id", "f_a", "f_b").write.parquet(s"$out/fact.parquet")
    (1L to 1000L).map(k => (k, k % 2)).toDF("a_id", "a_flag")
      .write.parquet(s"$out/dimA.parquet")
    (1L to 100L).map(k => (k, s"b$k")).toDF("b_id", "b_name")
      .write.parquet(s"$out/dimB.parquet")
    try {
      JoinReorderRule.analyze(spark, s"$out/fact.parquet", Nil)
      JoinReorderRule.analyze(spark, s"$out/dimA.parquet", Seq("a_flag"))
      JoinReorderRule.analyze(spark, s"$out/dimB.parquet", Nil)
      def star() = spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet")
          .where(col("a_flag") === 1L), col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimB.parquet"),
          col("f_b") === col("b_id"))
      def dimOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.head.getName
              case _ => ""
            }
        }.filter(_.startsWith("dim"))
      val reordered = star()
      assert(dimOrder(reordered) == Seq("dimB.parquet", "dimA.parquet"),
        dimOrder(reordered))
      // semantics preserved: same rows as an unregistered (declined) run
      val n = reordered.count()
      // column order preserved by the Project wrap
      assert(reordered.columns.toSeq ==
        Seq("f_id", "f_a", "f_b", "a_id", "a_flag", "b_id", "b_name"))

      // decline: a leg with no registered stats keeps the authored order
      JoinReorderRule.drop(spark, s"$out/dimB.parquet")
      val declined = star()
      assert(dimOrder(declined) == Seq("dimA.parquet", "dimB.parquet"),
        dimOrder(declined))
      assert(declined.count() == n)
      JoinReorderRule.analyze(spark, s"$out/dimB.parquet", Nil)

      // a TWO-leg snowflake (dimB hangs off dimA) is one fused unit —
      // only one order exists, so the authored order stands
      val snowflake = spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet"),
          col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimB.parquet"),
          col("f_b") === col("b_id") && col("a_flag") === col("b_id") % 2)
      assert(dimOrder(snowflake) == Seq("dimA.parquet", "dimB.parquet"),
        dimOrder(snowflake))

      // decline: another session's registrations never fire here
      JoinReorderRule.clear()
      val other = spark.newSession()
      JoinReorderRule.analyze(other, s"$out/fact.parquet", Nil)
      JoinReorderRule.analyze(other, s"$out/dimA.parquet", Seq("a_flag"))
      JoinReorderRule.analyze(other, s"$out/dimB.parquet", Nil)
      assert(dimOrder(star()) == Seq("dimA.parquet", "dimB.parquet"))

      // persistence: ANALYZE once, save, attach in a "new process"
      // (cleared registry), reorder fires again without re-scanning
      JoinReorderRule.clear()
      for (t <- Seq("fact", "dimA", "dimB"))
        JoinReorderRule.analyze(spark, s"$out/$t.parquet",
          if (t == "dimA") Seq("a_flag") else Nil)
      for (t <- Seq("fact", "dimA", "dimB"))
        assert(JoinReorderRule.save(spark, s"$out/$t.parquet"), t)
      JoinReorderRule.clear()
      for (t <- Seq("fact", "dimA", "dimB"))
        assert(JoinReorderRule.attach(spark, s"$out/$t.parquet"), t)
      assert(dimOrder(star()) == Seq("dimB.parquet", "dimA.parquet"))

      // staleness: the table changes after ANALYZE -> attach declines
      JoinReorderRule.clear()
      Seq((0L, "b0")).toDF("b_id", "b_name").write.mode("append")
        .parquet(s"$out/dimB.parquet")
      assert(!JoinReorderRule.attach(spark, s"$out/dimB.parquet"))
    } finally JoinReorderRule.clear()
  }

  test("join reorder: fingerprint is captured at ANALYZE time — a write between analyze and save still declines attach") {
    import graft.plans.JoinReorderRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("reorderfp")
    (1L to 100L).map(k => (k, s"b$k")).toDF("b_id", "b_name")
      .write.parquet(s"$out/dim.parquet")
    try {
      JoinReorderRule.analyze(spark, s"$out/dim.parquet", Nil)
      // data moves on BETWEEN analyze and save: the persisted sidecar
      // must carry the analyze-time fingerprint, so the stale (rows, ndv)
      // can never be adopted by a later process
      Seq((0L, "b0")).toDF("b_id", "b_name").write.mode("append")
        .parquet(s"$out/dim.parquet")
      assert(JoinReorderRule.save(spark, s"$out/dim.parquet"))
      JoinReorderRule.clear()
      assert(!JoinReorderRule.attach(spark, s"$out/dim.parquet"),
        "attach adopted statistics the data has outgrown")
    } finally JoinReorderRule.clear()
  }

  test("join reorder: ANALYZE-informed broadcast hints fire under the budget, never above it") {
    import graft.plans.JoinReorderRule
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join => LJoin}
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("bcasthint")
    (1L to 10000L).map(k => (k, k % 1000 + 1, k % 100 + 1))
      .toDF("f_id", "f_a", "f_b").write.parquet(s"$out/fact.parquet")
    (1L to 1000L).map(k => (k, k % 2)).toDF("a_id", "a_flag")
      .write.parquet(s"$out/dimA.parquet")
    (1L to 100L).map(k => (k, s"b$k")).toDF("b_id", "b_name")
      .write.parquet(s"$out/dimB.parquet")
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1") // only the rule's hints can broadcast
    def star() = spark.read.parquet(s"$out/fact.parquet")
      .join(spark.read.parquet(s"$out/dimA.parquet")
        .where(col("a_flag") === 1L), col("f_a") === col("a_id"))
      .join(spark.read.parquet(s"$out/dimB.parquet"),
        col("f_b") === col("b_id"))
    def hinted(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: LJoin
            if j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) => j
      }.length
    try {
      // control: no statistics -> no hints, sort-merge joins
      assert(hinted(star()) == 0)
      assert(!star().queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      for (t <- Seq("fact", "dimA", "dimB"))
        JoinReorderRule.analyze(spark, s"$out/$t.parquet",
          if (t == "dimA") Seq("a_flag") else Nil)
      // both dims fit the default 10MB budget -> both hinted, physical
      // plan broadcasts despite the disabled size threshold
      val s = star()
      assert(hinted(s) == 2, s.queryExecution.optimizedPlan)
      assert(s.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // results identical to the unhinted control
      spark.conf.set("graft.cbo.broadcastBudget", "1") // nothing fits
      try assert(hinted(star()) == 0)
      finally spark.conf.unset("graft.cbo.broadcastBudget")
      JoinReorderRule.clear()
      assert(s.count() == star().count())
    } finally {
      spark.conf.set(thrKey, saved)
      JoinReorderRule.clear()
    }
  }

  test("join reorder: histogram range selectivity reprices legs; NDV-only keeps selectivity 1") {
    import graft.plans.JoinReorderRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("histcbo")
    // fact(10k) with two dims: big(1000 rows, but a range filter keeps
    // ~1%) and small(200 rows, unfiltered)
    (1L to 10000L).map(k => (k, k % 1000 + 1, k % 200 + 1))
      .toDF("f_id", "f_b", "f_s").write.parquet(s"$out/fact.parquet")
    (1L to 1000L).map(k => (k, k.toDouble)).toDF("b_id", "b_v")
      .write.parquet(s"$out/dimBig.parquet")
    (1L to 200L).map(k => (k, s"s$k")).toDF("s_id", "s_name")
      .write.parquet(s"$out/dimSmall.parquet")
    def dimOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName
            case _ => ""
          }
      }.filter(_.startsWith("dim"))
    def chain = spark.read.parquet(s"$out/fact.parquet")
      .join(spark.read.parquet(s"$out/dimBig.parquet")
          .where(col("b_v") > 990.0), // keeps 10 of 1000 rows
        col("f_b") === col("b_id"))
      .join(spark.read.parquet(s"$out/dimSmall.parquet"),
        col("f_s") === col("s_id"))
    try {
      // NDV-only: the range filter prices at 1 → big(1000e6) > small(200e6)
      JoinReorderRule.analyze(spark, s"$out/dimBig.parquet", Nil)
      JoinReorderRule.analyze(spark, s"$out/dimSmall.parquet", Nil)
      assert(dimOrder(chain) == Seq("dimSmall.parquet", "dimBig.parquet"))
      val expected = chain.count()
      // histogram on b_v: the `> 990` conjunct is priced ~1% → big first
      JoinReorderRule.analyze(spark, s"$out/dimBig.parquet", Nil,
        histCols = Seq("b_v"))
      assert(dimOrder(chain) == Seq("dimBig.parquet", "dimSmall.parquet"),
        dimOrder(chain))
      assert(chain.count() == expected) // semantics unchanged
      // histograms survive the save/attach sidecar round trip
      assert(JoinReorderRule.save(spark, s"$out/dimBig.parquet"))
      JoinReorderRule.clear()
      JoinReorderRule.analyze(spark, s"$out/dimSmall.parquet", Nil)
      assert(JoinReorderRule.attach(spark, s"$out/dimBig.parquet"))
      assert(dimOrder(chain) == Seq("dimBig.parquet", "dimSmall.parquet"))
    } finally JoinReorderRule.clear()
  }

  test("join reorder: a single snowflake hop fuses to its parent and the units permute; deeper shapes decline") {
    import graft.plans.JoinReorderRule
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("snowflakespec")
    (1L to 10000L).map(k => (k, k % 1000 + 1, k % 50 + 1))
      .toDF("f_id", "f_a", "f_b").write.parquet(s"$out/fact.parquet")
    (1L to 1000L).map(k => (k, k % 10 + 1, k % 5 + 1))
      .toDF("a_id", "a_c", "a_f").write.parquet(s"$out/dimA.parquet")
    (1L to 50L).map(k => (k, k % 5 + 1)).toDF("b_id", "b_e")
      .write.parquet(s"$out/dimB.parquet")
    (1L to 10L).map(k => (k, s"c$k")).toDF("c_id", "c_name")
      .write.parquet(s"$out/dimC.parquet")
    (1L to 5L).map(k => (k, s"e$k")).toDF("e_id", "e_name")
      .write.parquet(s"$out/dimE.parquet")
    def dimOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName
            case _ => ""
          }
      }.filter(_.startsWith("dim"))
    try {
      for (t <- Seq("fact", "dimA", "dimB", "dimC", "dimE"))
        JoinReorderRule.analyze(spark, s"$out/$t.parquet", Nil)
      // authored: dimA, its child dimC, then dimB. The Selinger prefix
      // cost keeps the child glued to its parent AND moves dimB last:
      // the final product A·C·B is order-invariant, so the decision is
      // the middle terms — A + A·C (1e9 + 1e16) beats B + B·A
      // (5e7 + 5e16), the shape the unit-sort heuristic got wrong
      val snow = spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet"),
          col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimC.parquet"),
          col("a_c") === col("c_id")) // dim-of-dim: binds dimA, not fact
        .join(spark.read.parquet(s"$out/dimB.parquet"),
          col("f_b") === col("b_id"))
      assert(dimOrder(snow) ==
        Seq("dimA.parquet", "dimC.parquet", "dimB.parquet"), dimOrder(snow))
      // semantics: identical rows to the authored (cleared-registry) plan
      val n = snow.count()
      JoinReorderRule.clear()
      for (t <- Seq("fact", "dimA", "dimB", "dimC", "dimE"))
        JoinReorderRule.analyze(spark, s"$out/$t.parquet", Nil)

      // TWO dependent legs (dimC off dimA, dimE off dimB) — a two-branch
      // FOREST the pre-DP rule declined: the Selinger DP orders the full
      // 4-leg chain, interleaving branches by cost (dimE right after its
      // cheap parent dimB, the expensive dimA branch last) while every
      // child stays after its parent
      val twoHops = spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet"),
          col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimC.parquet"),
          col("a_c") === col("c_id"))
        .join(spark.read.parquet(s"$out/dimB.parquet"),
          col("f_b") === col("b_id"))
        .join(spark.read.parquet(s"$out/dimE.parquet"),
          col("b_e") === col("e_id"))
      assert(dimOrder(twoHops) == Seq("dimB.parquet", "dimE.parquet",
        "dimA.parquet", "dimC.parquet"), dimOrder(twoHops))
      val n2 = twoHops.count()
      JoinReorderRule.clear()
      assert(spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet"),
          col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimC.parquet"),
          col("a_c") === col("c_id"))
        .join(spark.read.parquet(s"$out/dimB.parquet"),
          col("f_b") === col("b_id"))
        .join(spark.read.parquet(s"$out/dimE.parquet"),
          col("b_e") === col("e_id")).count() == n2)
      for (t <- Seq("fact", "dimA", "dimB", "dimC", "dimE"))
        JoinReorderRule.analyze(spark, s"$out/$t.parquet", Nil)

      // decline: a two-level chain (dimE off dimA's child... via dimA.a_f
      // -> dimE through dimC? no — parent itself dependent): dimC off
      // dimA, then a leg binding dimC would make dimC a dependent parent
      val chain = spark.read.parquet(s"$out/fact.parquet")
        .join(spark.read.parquet(s"$out/dimA.parquet"),
          col("f_a") === col("a_id"))
        .join(spark.read.parquet(s"$out/dimC.parquet"),
          col("a_c") === col("c_id"))
        .join(spark.read.parquet(s"$out/dimE.parquet"),
          col("c_id") % 5 + 1 === col("e_id")) // binds dimC: depth 2
      assert(dimOrder(chain) ==
        Seq("dimA.parquet", "dimC.parquet", "dimE.parquet"), dimOrder(chain))
      assert(snow.count() == n)
    } finally JoinReorderRule.clear()
  }
}
