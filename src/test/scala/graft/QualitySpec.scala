package graft

import java.nio.file.Files
import graft.queries.Quality
import org.scalatest.funsuite.AnyFunSuite

/** Quality tier on closed-form inputs: a hand-built customer/orders pair
  * where every profile metric, every constraint verdict, and every entity
  * cluster is known by construction — including the violation cases the
  * sf corpora (clean by generation) never exercise. */
class QualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Stage customer + orders with KNOWN defects: a null custkey, a
    * duplicate orderkey, a bad status, a negative price, and an orphan
    * custkey missing from customer. */
  private def stageDirty(): String = {
    val d = Files.createTempDirectory("qualityspec")
    Seq((0L, "Customer#000000000", 1, 100.0, "BUILDING"),
      (1L, "Customer#000000001", 2, 200.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq(
      (10L, Some(0L), "O", 50.0, "1995-01-01 00:00:00", "1-URGENT"),
      (11L, Some(1L), "F", -5.0, "1995-01-02 00:00:00", "2-HIGH"), // negative price
      (11L, Some(1L), "X", 30.0, "1995-01-03 00:00:00", "3-MEDIUM"), // dup key + bad status
      (12L, None, "O", 40.0, "1995-01-04 00:00:00", "4-NOT SPECIFIED"), // null custkey
      (13L, Some(99L), "P", 60.0, "1995-01-05 00:00:00", "5-LOW")) // orphan FK
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ts_s", "o_orderpriority")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts_s AS TIMESTAMP) AS o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    d.toString
  }

  test("q228 constraints: each seeded defect is counted by exactly its check") {
    val dir = stageDirty()
    val got = Quality.constraints(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got("not_null_o_custkey") == ((1L, 5L, false)), got)
    assert(got("unique_o_orderkey") == ((1L, 5L, false)), got)
    assert(got("accepted_values_o_orderstatus") == ((1L, 5L, false)), got)
    assert(got("positive_o_totalprice") == ((1L, 5L, false)), got)
    // orphan custkey 99; the NULL custkey row is NOT an FK violation twice —
    // anti-join keeps it (no match), so fk counts it too: 99 and NULL = 2
    assert(got("fk_o_custkey_customer") == ((2L, 5L, false)), got)
  }

  test("q227 profile: null/distinct/min-max per column on the dirty table") {
    val dir = stageDirty()
    val got = Quality.profile(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("o_orderkey") == ((5L, 0L, 4L, "10", "13")), got)
    assert(got("o_custkey") == ((5L, 1L, 3L, "0", "99")), got)
    assert(got("o_orderstatus") == ((5L, 0L, 4L, "F", "X")), got)
    assert(got("o_totalprice") == ((5L, 0L, 5L, "-5.00", "60.00")), got)
    assert(got("o_orderdate")._4 == "1995-01-01 00:00:00", got)
    assert(got("o_orderdate")._5 == "1995-01-05 00:00:00", got)
  }

  /** Customer fixture for ER: ids chosen so variants exist (id%3==0 gets a
    * 'web' variant, id%6==0 also an 'app' one). */
  private def stageCustomers(rows: Seq[(Long, String, Int, Double)]): String = {
    val d = Files.createTempDirectory("qualityspec_er")
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .withColumn("c_mktsegment", org.apache.spark.sql.functions.lit("BUILDING"))
      .write.parquet(s"$d/customer.parquet")
    d.toString
  }

  test("q229 ER: variants cluster to their base transitively; distinct entities stay apart") {
    // customer 6: base + web + app variants (app<->web are 7 apart — only
    // the base links them). customer 7: singleton. customer 16: same
    // nation + same last-4 block as nobody (distinct suffix) -> singleton.
    val dir = stageCustomers(Seq(
      (6L, "Customer#000000006", 1, 100.0),
      (7L, "Customer#000000007", 1, 100.0),
      (16L, "Customer#000000016", 1, 500.0)))
    val got = Quality.entityResolution(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // entity 18 = custkey 6 * 3: three records, three sources
    assert(got(18L) == ((3L, 3L, "Cust#000000006")), got)
    assert(got(21L) == ((1L, 1L, "Customer#000000007")), got)
    assert(got(48L) == ((1L, 1L, "Customer#000000016")), got)
    assert(got.size == 3, got)
  }

  test("q229 ER: same block + close names + close balances DO cross-link (precision < 1 by design)") {
    // two distinct customers whose names differ by one digit outside the
    // last-4 suffix, same nation, balances within 1.0: the match rule
    // cannot tell them apart and the clusters merge — deterministically.
    val dir = stageCustomers(Seq(
      (1L, "Customer#000010001", 3, 100.0),
      (2L, "Customer#000020001", 3, 100.5)))
    // identical last-4 "0001", lev distance 1, |bal diff| 0.5 -> one entity
    val got = Quality.entityResolution(spark, dir).collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L, got.toSeq)
  }

  /** documents fixture (doc_id, text, lang, source). */
  private def stageDocs(rows: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("qualityspec_docs")
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d.toString
  }

  test("q231 PII redaction: injected rows are detected and scrubbed, clean rows untouched") {
    val dir = stageDocs(Seq((0L, "plain words here"), (1L, "no pii either")))
    val got = Quality.piiRedact(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    // doc 0 (id%5==0) gets the injected email+phone; both detected
    assert(got(0L)._1 == 1 && got(0L)._2 == 1, got)
    // after redaction the scrubbed text is exactly the placeholder form
    val expect0 = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "plain words here reach [EMAIL] or call [PHONE]")
    assert(got(0L)._3 == expect0, got)
    // doc 1 is untouched: zero hits, hash of the original text
    val expect1 = org.apache.commons.codec.digest.DigestUtils.md5Hex("no pii either")
    assert(got(1L) == ((0, 0, expect1)), got)
  }

  test("q232 k-anonymity: classes >= 5 publish, smaller collapse into one '*' row") {
    val d = Files.createTempDirectory("qualityspec_ka")
    // 6 customers in class (1, A, band 0); 2 in (2, B, band 1)
    val rows = (0 until 6).map(i => (i.toLong, s"Customer#$i", 1, 500.0, "A")) ++
      Seq((10L, "Customer#10", 2, 1500.0, "B"), (11L, "Customer#11", 2, 1600.0, "B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    val got = Quality.kAnonymity(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == Set(("1", "A", "0", 6L, false), ("*", "*", "*", 2L, true)), got)
  }

  test("q233 winsorize: exact p05/p95 clamp on a closed-form group") {
    val d = Files.createTempDirectory("qualityspec_w")
    // one group, values 1..100 dollars -> cents 100..10000
    (1 to 100).map(v => (v.toLong, v * 1.0))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderpriority", org.apache.spark.sql.functions.lit("1-URGENT"))
      .write.parquet(s"$d/orders.parquet")
    val r = Quality.winsorize(spark, d.toString).collect().head
    // percentile(0.05) over 100 ranks = value at rank 5.95 = 100*(5 + .95*1)
    assert(r.getLong(1) == 100L, r)
    assert(r.getDouble(2) == 595.0, r) // p05 cents
    assert(r.getDouble(3) == 9505.0, r) // p95 cents
    // clamped sum: 5*595 + sum(600..9500 step 100) + 5*9505 cents
    val mid = (6 to 95).map(_ * 100).sum
    val want = (5 * 595 + mid + 5 * 9505) / 100.0
    assert(r.getDouble(4) == want, r)
  }

  test("q244 MAD: a planted 100x outlier moves neither median nor MAD, and is fenced") {
    val d = Files.createTempDirectory("qualityspec_mad")
    // $1..$9 plus one $100 outlier, one group
    ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderpriority", org.apache.spark.sql.functions.lit("1-URGENT"))
      .write.parquet(s"$d/orders.parquet")
    val r = Quality.madOutliers(spark, d.toString).collect().head
    assert(r.getLong(1) == 10L, r)
    assert(r.getDouble(2) == 550.0, r) // median cents: (500+600)/2
    assert(r.getDouble(3) == 250.0, r) // MAD cents
    assert(r.getLong(4) == 1L, r) // only the $100 point beyond 3*MAD
  }

  test("q245 islands: runs of consecutive open orderkeys split at every gap") {
    val d = Files.createTempDirectory("qualityspec_isl")
    Seq((1L, "O"), (2L, "O"), (3L, "O"), (4L, "F"), (5L, "O"), (6L, "O"),
      (10L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(s"$d/orders.parquet")
    val got = Quality.islands(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 3L), (5L, 6L, 2L), (10L, 10L, 1L)), got)
  }

  test("q247 RFM: monotone customers land in their own quartiles") {
    val d = Files.createTempDirectory("qualityspec_rfm")
    // customer k has k orders, later dates and bigger totals as k grows
    val rows = for (k <- 1 to 4; i <- 1 to k) yield
      (k.toLong * 10 + i, k.toLong, 100.0 * k, f"1995-0$k-01 00:00:00")
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "ts_s")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "CAST(ts_s AS TIMESTAMP) AS o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = Quality.rfmSegments(spark, d.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 111L, 2L -> 222L, 3L -> 333L, 4L -> 444L), got)
  }

  test("q246 TF-IDF: hand-built corpus ranks rare high-tf terms first") {
    import graft.queries.TextAnalysis
    val dir = stageDocs(Seq((0L, "x x y"), (1L, "y z")))
    val got = TextAnalysis.tfidfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // idf_ppm: x,z = 2e6 (df 1), y = 1e6 (df 2)
    assert(got == Set(
      (0L, "x", 4000000L, 1L), (0L, "y", 1000000L, 2L),
      (1L, "z", 2000000L, 1L), (1L, "y", 1000000L, 2L)), got)
  }

  test("q249 chi-square: an independent table scores 0; perfect association scores N") {
    def stage(rows: Seq[(Long, Int, String)]): String = {
      val d = Files.createTempDirectory("qualityspec_chi")
      rows.toDF("c_custkey", "c_nationkey", "c_mktsegment")
        .withColumn("c_name", org.apache.spark.sql.functions.lit("x"))
        .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(1.0))
        .write.parquet(s"$d/customer.parquet")
      d.toString
    }
    var id = 0L
    def customers(n: Int, nation: Int, seg: String) =
      (1 to n).map { _ => id += 1; (id, nation, seg) }
    // exactly independent margins: every cell O == E -> total 0
    val ind = stage(customers(10, 1, "A") ++ customers(30, 1, "B") ++
      customers(5, 2, "A") ++ customers(15, 2, "B"))
    val r1 = Quality.chiSquare(spark, ind).collect()
    assert(r1.forall(_.getLong(5) == 0L), r1.toSeq)
    assert(r1.forall(_.getLong(6) == 1L), r1.toSeq) // dof (2-1)(2-1)
    // perfect association (diagonal): chi² = N -> 20e6 ppm, and the
    // ZERO cells (completed grid) carry half the statistic
    val dep = stage(customers(10, 1, "A") ++ customers(10, 2, "B"))
    val r2 = Quality.chiSquare(spark, dep).collect()
    assert(r2.length == 4, r2.toSeq) // grid completed: 2x2, two zero cells
    assert(r2.forall(_.getLong(5) == 20000000L), r2.toSeq)
    assert(r2.count(_.getLong(2) == 0L) == 2, r2.toSeq)
  }

  test("q250 Benford: digit shares in exact ppm, absent digits kept at zero") {
    val d = Files.createTempDirectory("qualityspec_ben")
    // three prices starting with 1, one with 9 -> obs 750000 / 250000 ppm
    Seq(100.0, 150.0, 199.99, 900.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    val got = Quality.benford(spark, d.toString).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 9, got) // all nine digits present in the audit
    assert(got(1) == ((3L, 750000L, 750000L - 301030L)), got)
    assert(got(9) == ((1L, 250000L, 250000L - 45757L)), got)
    assert(got(5) == ((0L, 0L, 79181L)), got) // absent digit: zero count
  }

  test("q251 schema evolution: pre-schema files aggregate as their own bucket") {
    val d = Files.createTempDirectory("qualityspec_evo")
    Seq((0L, 10.0, "1-URGENT"), (1L, 20.0, "2-HIGH"), (2L, 30.0, "1-URGENT"),
      (3L, 40.0, "2-HIGH"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    // even keys (0,2) land in the pre-schema batch
    val got = graft.queries.Layout.schemaEvolution(spark, d.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "(pre-schema)" -> ((2L, 40.0)),
      "2-HIGH" -> ((2L, 60.0))), got)
  }

  test("q254 enforce-write: both routes carry the right rows, precedence deterministic") {
    val d = Files.createTempDirectory("qualityspec_enf")
    // keys: 1 clean, 97 price-negated, 101 status-broken, 97*101 both
    // (price rule wins by precedence)
    Seq(1L, 97L, 101L, 97L * 101L).map(k => (k, 10.0, "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.parquet(s"$d/orders.parquet")
    val got = Quality.enforceWrite(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("good", "ok") -> ((1L, 1000L)), // key 1
      ("quarantine", "nonpositive_price") -> ((2L, -2000L)), // 97, 97*101
      ("quarantine", "bad_status") -> ((1L, 1000L))), got) // 101
  }

  test("q255 corr matrix: constructed perfect and inverse correlations") {
    import graft.queries.Scalars
    val d = Files.createTempDirectory("qualityspec_corr")
    // qty = i, price = 2i (corr +1), disc = -i scaled (corr -1), tax const
    (1 to 10).map(i => (1L, i, i.toDouble, 2.0 * i, (10 - i) / 100.0, 0.05))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Scalars.corrMatrix(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // tax is constant -> its three pairs are dropped by the guard
    assert(got.keySet == Set(("qty", "price"), ("qty", "disc"),
      ("price", "disc")), got)
    // the IEEE tree lands within an ulp or two of the ideal ±1 — what is
    // pinned bit-exactly is CROSS-ENGINE equality (the oracle gate), not
    // equality with the real-arithmetic ideal
    assert(math.abs(got(("qty", "price")) - 1.0) < 1e-12, got)
    assert(math.abs(got(("qty", "disc")) + 1.0) < 1e-12, got)
    assert(math.abs(got(("price", "disc")) + 1.0) < 1e-12, got)
  }

  test("q234 PMI: closed-form presence counts give the exact ppm ratio") {
    import graft.queries.TextAnalysis
    // 5 docs {x y}, 3 docs {x}, 2 docs {y}: N=10, nx=8, ny=7, nxy=5
    val docs = (0L until 5L).map(i => (i, "x y")) ++
      (5L until 8L).map(i => (i, "x")) ++ (8L until 10L).map(i => (i, "y"))
    val dir = stageDocs(docs)
    val got = TextAnalysis.pmiPairs(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got.head
    assert((r.getString(0), r.getString(1)) == (("x", "y")), r)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((5L, 8L, 7L)), r)
    // 5 * 10 * 1e6 div 56 = 892857 (floor)
    assert(r.getLong(5) == 892857L, r)
  }

  /** Documents with controlled lang (the q274/q275/q276 label/stratum). */
  private def stageLabeled(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("qualityspec_labeled")
    rows.map { case (id, t, lang) => (id, t, lang, "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d.toString
  }

  // TTR scores by construction: "a a a a"=250000, "b c b c"=500000,
  // "d e d e"=500000, "f g"=1000000 — one tie ACROSS the label boundary.
  private val aucCase = Seq(
    (0L, "a a a a", "de"), (1L, "b c b c", "de"),
    (2L, "d e d e", "en"), (3L, "f g", "en"))

  test("q274 AUC: hand-computed midrank case (the tie counts half)") {
    // midranks: 1, 2.5, 2.5, 4 -> R1x2 = 5 + 8 = 13; U1 = (13-6)/2 = 3.5
    // AUC = 3.5 / (2*2) = 0.875
    val got = Quality.aucExact(spark, stageLabeled(aucCase)).collect()
    assert(got.length == 1, got.toSeq)
    val r = got.head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L, r)
    assert(r.getAs[Long]("auc_ppm") == 875000L, r)
  }

  test("q274 AUC: perfect separation scores exactly 1e6") {
    val dir = stageLabeled(Seq(
      (0L, "a a a a", "de"), (1L, "b b b", "fr"),
      (2L, "c d", "en"), (3L, "e f g", "en")))
    assert(Quality.aucExact(spark, dir).collect()
      .head.getAs[Long]("auc_ppm") == 1000000L)
  }

  test("q275 k-fold: per-stratum fold counts balance within 1, deterministic") {
    val rows = (0L until 7L).map(i => (i, s"w$i x", "en")) ++
      (7L until 10L).map(i => (i, s"w$i x", "de"))
    val dir = stageLabeled(rows)
    def run() = Quality.kfoldStrata(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val a = run()
    assert(a.length == 10 && a.map(_._1).distinct.length == 10, a.toSeq)
    assert(a.forall(t => t._3 >= 0 && t._3 < 5), a.toSeq)
    for ((lang, g) <- a.groupBy(_._2)) {
      val byFold = g.groupBy(_._3).map(_._2.length)
      assert(byFold.max - byFold.min <= 1, s"$lang ${byFold.toSeq}")
    }
    // 7 en docs round-robin over 5 folds: every fold non-empty
    assert(a.filter(_._2 == "en").map(_._3).distinct.length == 5, a.toSeq)
    assert(run().sameElements(a))
  }

  test("q276 threshold sweep: hand-computed operating points") {
    val m = Quality.thresholdSweep(spark, stageLabeled(aucCase)).collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(m.size == 9, m.keySet)
    val t3 = m(300000L) // keeps 5e5, 5e5, 1e6 -> tp=2 fp=1 fn=0
    assert(t3.getAs[Long]("tp") == 2L && t3.getAs[Long]("fp") == 1L &&
      t3.getAs[Long]("fn") == 0L, t3)
    assert(t3.getAs[Long]("precision_ppm") == 666666L, t3)
    assert(t3.getAs[Long]("recall_ppm") == 1000000L, t3)
    // f1 from the truncated ppm pair: 2*666666*1e6 div 1666666 = 799999
    assert(t3.getAs[Long]("f1_ppm") == 799999L, t3)
    val t6 = m(600000L) // keeps only 1e6 -> tp=1 fp=0 fn=1
    assert(t6.getAs[Long]("tp") == 1L && t6.getAs[Long]("fp") == 0L &&
      t6.getAs[Long]("fn") == 1L, t6)
    assert(t6.getAs[Long]("f1_ppm") == 666666L, t6)
  }

  test("q277 kappa: hand-built 2x2 grid gives the chance-corrected 0.6") {
    // A = TTR >= 0.5, B = >= 5 tokens; cells n11=4 n00=4 n10=1 n01=1:
    // po_num=8, pe_num = 5*5 + 5*5 = 50; kappa = (80-50)/(100-50) = 0.6
    val rows =
      (0L until 4L).map(i => (i, "a b c d e f", "en")) ++ // A=1 B=1
        (4L until 8L).map(i => (i, "a a a a", "en")) ++ // A=0 B=0
        Seq((8L, "x y", "en"), // A=1 B=0
          (9L, "p p p p p q", "en")) // A=0 (333333) B=1
    val r = Quality.cohensKappa(spark, stageLabeled(rows)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 1L, 4L)), r)
    assert(r.getAs[Long]("kappa_ppm") == 600000L, r)
  }

  test("q277 kappa: independent signals land at zero, anti-correlated below") {
    // perfectly anti-correlated: n10=2 n01=2, n11=n00=0 ->
    // po_num=0, pe_num=4+4=8, kappa=(0-8)/(16-8) = -1
    val rows = Seq((0L, "x y", "en"), (1L, "v w", "en"), // A=1 B=0
      (2L, "a a a a a", "en"), (3L, "b b b b b", "en")) // A=0 B=1
    val r = Quality.cohensKappa(spark, stageLabeled(rows)).collect().head
    assert(r.getAs[Long]("kappa_ppm") == -1000000L, r)
  }

  test("q278 gains: one doc per decile, positives on top -> known curve") {
    // scores strictly descending as doc_id rises: doc i text has i+1
    // tokens, one duplicated pair from i>=1 on keeps TTR distinct.
    // Build: doc0 "t0" (1e6), doc i (i>=1): i+1 tokens with exactly one
    // repeat -> TTR = i/(i+1), strictly increasing in i but < 1e6.
    // So rank order = doc0, doc9, doc8, ... doc1.
    val rows = (0L until 10L).map { i =>
      val toks =
        if (i == 0) Seq("w0")
        else (0L until i).map(j => s"w$j") :+ "w0" // i+1 toks, i distinct
      (i, toks.mkString(" "), if (i == 0 || i >= 8) "en" else "de")
    }
    // positives: doc0 (rank 1), doc9 (rank 2), doc8 (rank 3) -> the top
    // three deciles capture all 3 positives.
    val got = Quality.gainsTable(spark, stageLabeled(rows)).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(got.size == 10, got.keySet)
    assert(got(0L).getAs[Long]("cum_pos") == 1L, got(0L))
    assert(got(0L).getAs[Long]("gain_ppm") == 333333L, got(0L))
    // lift at decile 0: 1 * 10 * 1e6 div (3 * 1) = 3333333
    assert(got(0L).getAs[Long]("lift_ppm") == 3333333L, got(0L))
    assert(got(2L).getAs[Long]("cum_pos") == 3L, got(2L))
    assert(got(2L).getAs[Long]("gain_ppm") == 1000000L, got(2L))
    assert(got(9L).getAs[Long]("cum_docs") == 10L &&
      got(9L).getAs[Long]("lift_ppm") == 1000000L, got(9L))
  }
}
