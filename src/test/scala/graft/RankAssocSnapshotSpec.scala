package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-8 warehouse-analytics ops: distributed average ranks / Spearman,
  * chi-square / Cramér's V / mutual information, and snapshot
  * upsert / SCD2 semantics on hand-computable fixtures. */
class RankAssocSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("avgRanks: ties get textbook average ranks, across partitions") {
    // values: 10 ×1, 20 ×3, 30 ×2  → ranks 1, (2+3+4)/3=3, (5+6)/2=5.5
    val df = Seq(20.0, 10.0, 20.0, 30.0, 20.0, 30.0).toDF("x")
      .repartition(5) // force values to straddle partitions
    val got = graft.ops.Rank.avgRanks(df, "x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(got === Map(10.0 -> 1.0, 20.0 -> 3.0, 30.0 -> 5.5))
  }

  test("spearman: exact ±1 on monotone data regardless of nonlinearity") {
    val mono = (1 to 500).map(i => (i.toDouble, math.exp(i / 100.0)))
      .toDF("x", "y")
    val rho = graft.ops.Rank.spearman(mono, "x", "y")
      .head().getDouble(0)
    assert(rho === 1.0) // rank-perfect even though y is wildly nonlinear
    val anti = (1 to 500).map(i => (i.toDouble, -math.log(i.toDouble)))
      .toDF("x", "y")
    assert(graft.ops.Rank.spearman(anti, "x", "y").head().getDouble(0)
      === -1.0) // -log is strictly decreasing in i
    val down = (1 to 500).map(i => (i.toDouble, 1.0 / i)).toDF("x", "y")
    assert(graft.ops.Rank.spearman(down, "x", "y").head().getDouble(0)
      === -1.0)
  }

  test("chiSquare: independent margins give chi2 ~ 0, planted dependence " +
    "gives the hand-computed statistic") {
    // perfectly independent 2x2: each cell = rowTot*colTot/n exactly
    val ind = (Seq.fill(40)(("a", "x")) ++ Seq.fill(60)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("u", "v")
    val r1 = graft.ops.Assoc.chiSquare(ind, "u", "v").head()
    assert(r1.getDouble(0) === 0.0)
    assert(r1.getLong(2) === 1L)
    // planted diagonal dependence: 2x2 [30,10;10,30], n=80
    // e = 20 everywhere, chi2 = 4 * (10^2/20) = 20; V = sqrt(20/80) = 0.5
    val dep = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("u", "v")
    val r2 = graft.ops.Assoc.chiSquare(dep, "u", "v").head()
    assert(r2.getDouble(0) === 20.0)
    assert(r2.getDouble(1) === 0.5)
  }

  test("chiSquare: zero-observed cells still contribute expected mass") {
    // "b" never co-occurs with "y": the (b,y) cell is absent from the
    // observed table but its expected count is positive
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x"))).toDF("u", "v")
    // margins: na=20,nb=10; nx=20,ny=10; n=30
    // e(a,x)=13.33.., e(a,y)=6.66.., e(b,x)=6.66.., e(b,y)=3.33..
    // chi2 = (10-40/3)^2/(40/3) + (10-20/3)^2/(20/3) + (10-20/3)^2/(20/3)
    //      + (0-10/3)^2/(10/3) = 5/6*10 = ... compute directly:
    val e = Seq((10.0, 40.0 / 3), (10.0, 20.0 / 3), (10.0, 20.0 / 3),
      (0.0, 10.0 / 3))
    val want = e.map { case (o, ex) => (o - ex) * (o - ex) / ex }.sum
    val got = graft.ops.Assoc.chiSquare(df, "u", "v").head().getDouble(0)
    assert(math.abs(got - math.rint(want * 1e6) / 1e6) < 1e-9)
  }

  test("mutualInfo: zero for independent cells, ln(2) for a " +
    "deterministic binary relation") {
    val indep = Seq(
      ("f", 0, 0, 25.0), ("f", 0, 1, 25.0),
      ("f", 1, 0, 25.0), ("f", 1, 1, 25.0)).toDF("feature", "bin", "pos", "n")
    assert(graft.ops.Assoc.mutualInfo(indep, "feature", "bin", "pos", "n")
      .head().getDouble(1) === 0.0)
    val det = Seq(("f", 0, 0, 50.0), ("f", 1, 1, 50.0))
      .toDF("feature", "bin", "pos", "n")
    val mi = graft.ops.Assoc.mutualInfo(det, "feature", "bin", "pos", "n")
      .head().getDouble(1)
    assert(math.abs(mi - math.log(2)) < 1e-6) // H(Y) = ln 2 fully resolved
  }

  test("upsert: delta wins on matched keys, both unmatched sides survive") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val delta = Seq((2L, "new2"), (9L, "new9")).toDF("k", "v")
    val got = graft.ops.Snapshot.upsert(base, delta, "k", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (1L, "old1", "base"), (2L, "new2", "delta"),
      (3L, "old3", "base"), (9L, "new9", "delta")))
  }

  test("upsert: delta rows with NULL attrs win whole-row (no base leak)") {
    // a nullable changelog: delta nulls OUT v for key 2 and inserts a
    // key 9 whose attrs are ALL null — both must be labeled delta, and
    // key 2's base value must NOT leak through the null
    val base = Seq((1L, Some("old1")), (2L, Some("old2")))
      .toDF("k", "v")
    val delta = Seq((2L, None: Option[String]), (9L, None: Option[String]))
      .toDF("k", "v")
    val got = graft.ops.Snapshot.upsert(base, delta, "k", Seq("v"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getString(2))).toSet
    assert(got === Set(
      (1L, Some("old1"), "base"),
      (2L, None, "delta"), // NOT (2, old2, *): delta's null wins
      (9L, None, "delta")))
  }

  test("chiSquare: NULL levels are dropped (complete-pairs statistic), " +
    "and a 1-level column yields NULL cramers_v, not NaN") {
    // same planted 2x2 as above plus null-level noise rows that must not
    // perturb the statistic (they'd otherwise zero observed cells while
    // keeping expected mass)
    val dep = (Seq.fill(30)((Some("a"), Some("x"))) ++
      Seq.fill(10)((Some("a"), Some("y"))) ++
      Seq.fill(10)((Some("b"), Some("x"))) ++
      Seq.fill(30)((Some("b"), Some("y"))) ++
      Seq.fill(7)((None: Option[String], Some("x"))) ++
      Seq.fill(5)((Some("a"), None: Option[String])))
      .toDF("u", "v")
    val r = graft.ops.Assoc.chiSquare(dep, "u", "v").head()
    assert(r.getDouble(0) === 20.0 && r.getDouble(1) === 0.5)
    // degenerate: one level on one side → min(r,c)-1 == 0 → V undefined
    val deg = Seq(("only", "x"), ("only", "y"), ("only", "x")).toDF("u", "v")
    val rd = graft.ops.Assoc.chiSquare(deg, "u", "v").head()
    assert(rd.isNullAt(1))
  }

  test("scd2: contiguous validity intervals, exactly one current row per " +
    "key, valid_to = next valid_from") {
    val log = Seq(
      (1L, 100L, "A"), (1L, 200L, "B"), (1L, 300L, "C"),
      (2L, 150L, "X")).toDF("k", "ms", "status")
    val rows = graft.ops.Snapshot.scd2(log, "k", col("ms"),
        Seq(col("ms").asc), Seq("status"), openEnd = 999L)
      .select("k", "status", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows === Set(
      (1L, "A", 100L, 200L, 0L), (1L, "B", 200L, 300L, 0L),
      (1L, "C", 300L, 999L, 1L), (2L, "X", 150L, 999L, 1L)))
  }
}
