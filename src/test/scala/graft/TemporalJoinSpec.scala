package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalJoin

class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asOfJoin: before-first is null, <= is inclusive, tied snapshots " +
    "resolve to max tie, latest-prior wins") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, 5L),   // before any snapshot → null
      (2L, 10L, 20L),  // exactly at snapshot ts=20 → sees it (<=)
      (3L, 10L, 25L),  // between 20 and 30 → snapshot@20
      (4L, 10L, 30L),  // at the TIED pair ts=30 → max tie id (src 93)
      (5L, 10L, 99L),  // after everything → latest (ts=30, src 93)
      (6L, 77L, 50L)   // other key, no snapshots at all → null
    ).toDF("event_id", "user_id", "ts")
    val snap = Seq(
      (10L, 20L, 91L, 1.0),
      (10L, 30L, 92L, 2.0),  // tied pair at ts=30:
      (10L, 30L, 93L, 3.0)   //   id 93 must win deterministically
    ).toDF("user_id", "ts", "src_id", "v")

    val out: Map[Long, (Option[Double], Option[Long])] =
      TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
          "ts", "ts", Seq("v", "src_id"), rightTie = "src_id")
        .select("event_id", "asof_v", "asof_src_id")
        .collect().map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(1L) === ((None, None)))
    assert(out(2L) === ((Some(1.0), Some(91L))))
    assert(out(3L) === ((Some(1.0), Some(91L))))
    assert(out(4L) === ((Some(3.0), Some(93L))))
    assert(out(5L) === ((Some(3.0), Some(93L))))
    assert(out(6L) === ((None, None)))
  }

  test("asOfJoin is point-in-time ROW-atomic: a null field of the latest " +
    "matching right row stays null — it must never be backfilled from an " +
    "older right row into a composite state that never existed") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 3L)).toDF("event_id", "user_id", "ts")
    val snap = Seq(
      (10L, 1L, 1L, Some(1.0), Some(2.0)),
      (10L, 2L, 2L, None, Some(3.0)) // latest row: a is NULL
    ).toDF("user_id", "ts", "src_id", "a", "b")
    val row = TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
        "ts", "ts", Seq("a", "b"), rightTie = "src_id")
      .select("asof_a", "asof_b").head()
    assert(row.isNullAt(0),
      "asof_a must be the LATEST row's null, not the older row's 1.0")
    assert(row.getDouble(1) === 3.0)
    // forward direction: same atomicity through first(ignoreNulls)
    val fwd = Seq((1L, 10L, 0L)).toDF("event_id", "user_id", "ts")
    val fsnap = Seq(
      (10L, 1L, 1L, None, Some(5.0)), // earliest at-or-after: a NULL
      (10L, 2L, 2L, Some(9.0), Some(6.0))
    ).toDF("user_id", "ts", "src_id", "a", "b")
    val frow = TemporalJoin.asOfJoin(fwd, fsnap, Seq("user_id"),
        "ts", "ts", Seq("a", "b"), rightTie = "src_id",
        direction = "forward")
      .select("asof_a", "asof_b").head()
    assert(frow.isNullAt(0) && frow.getDouble(1) === 5.0)
  }

  test("asOfJoin plan: one hash exchange on the key, no broadcast of the " +
    "right side, no single-partition exchange") {
    val s = spark
    import s.implicits._
    val left = (1 to 500).map(i => (i.toLong, (i % 13).toLong, i.toLong * 10))
      .toDF("event_id", "user_id", "ts")
    val snap = (1 to 100).map(i => (i % 13L, i.toLong * 37, i.toLong, i * 0.5))
      .toDF("user_id", "ts", "src_id", "v")
    val df = TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
      "ts", "ts", Seq("v"), rightTie = "src_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"as-of join must not serialize through one partition:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"as-of join is union+window, not a join needing broadcast:\n$plan")
    assert(df.count() === 500)
  }

  test("rangeJoin: boundaries inclusive, multi-bucket intervals match " +
    "each point exactly once, outside points excluded") {
    val s = spark
    import s.implicits._
    // bucket = 10; interval [15, 38] covers cells 1..3
    val iv = Seq((100L, 15L, 38L), (200L, 70L, 70L))
      .toDF("win", "lo", "hi")
    val pts = Seq((1L, 15L), (2L, 38L), (3L, 25L), (4L, 14L), (5L, 39L),
      (6L, 70L), (7L, 71L)).toDF("p_id", "ts")
    val got = TemporalJoin.rangeJoin(pts, "ts", iv, "lo", "hi", bucket = 10L)
      .select("p_id", "win").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    // 1,2 at the inclusive edges; 3 mid-interval (cell 2 of a 3-cell
    // interval — exactly one match row, no dedup needed); 6 in the
    // degenerate [70,70]; 4,5,7 outside
    assert(got === Seq((1L, 100L), (2L, 100L), (3L, 100L), (6L, 200L)))
  }

  test("rangeJoin plan: equi-join on the cell id (SortMergeJoin or " +
    "shuffled hash), never BroadcastNestedLoop/cartesian") {
    val s = spark
    import s.implicits._
    val iv = (1 to 300).map(i => (i.toLong, i * 100L, i * 100L + 250))
      .toDF("win", "lo", "hi")
    val pts = (1 to 2000).map(i => (i.toLong, (i * 17L) % 31000))
      .toDF("p_id", "ts")
    val df = TemporalJoin.rangeJoin(pts, "ts", iv, "lo", "hi", bucket = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to an all-pairs physical join:\n$plan")
    // match count equals the oracle-style naive filter
    val naive = pts.crossJoin(iv)
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi")).count()
    assert(df.count() === naive)
  }

  test("asOfJoin tolerance nulls stale matches; forward direction picks " +
    "the earliest at-or-after row (min tie at a tied instant)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 180L), (3L, 10L, 205L))
      .toDF("event_id", "user_id", "ts")
    val snap = Seq(
      (10L, 90L, 1L, 1.0),   // 10 before event 1
      (10L, 200L, 2L, 2.0),  // tied pair at 200 (forward boundary for e3
      (10L, 200L, 3L, 3.0))  //  is below at 205 → no forward match ≥205)
      .toDF("user_id", "ts", "src_id", "v")

    // backward + tolerance 15: e1 hit (dist 10), e2 stale (dist 90 from
    // ts=90... nearest prior for 180 is ts=90 → dist 90 > 15 → null),
    // e3 nearest prior is 200 (dist 5) → hit
    val tol = TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
        "ts", "ts", Seq("v"), "src_id", tolerance = Some(15L))
      .select("event_id", "asof_v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(tol === Map(1L -> Some(1.0), 2L -> None, 3L -> Some(3.0)))

    // forward: e1@100 → earliest ≥100 is the tied pair @200 → MIN tie
    // (src 2, v 2.0); e3@205 → nothing at-or-after → null
    val fwd = TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
        "ts", "ts", Seq("v", "src_id"), "src_id", direction = "forward")
      .select("event_id", "asof_v", "asof_src_id").collect()
      .map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))),
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(fwd(1L) === ((Some(2.0), Some(2L))))
    assert(fwd(2L) === ((Some(2.0), Some(2L))))
    assert(fwd(3L) === ((None, None)))
  }

  test("asOfJoin equals the brute-force reference on random data with " +
    "heavy ts collisions (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    // ts drawn from a SMALL range so ties (incl. left-right and
    // right-right at one instant) occur constantly
    val left = (1 to 1500).map(i =>
      (i.toLong, rnd.nextInt(15).toLong, rnd.nextInt(120).toLong))
    val right = (1 to 400).map(i =>
      (rnd.nextInt(15).toLong, rnd.nextInt(120).toLong, i.toLong,
        rnd.nextInt(1000) / 8.0))
    val got = TemporalJoin.asOfJoin(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("user_id", "ts", "src_id", "v"),
        Seq("user_id"), "ts", "ts", Seq("v", "src_id"), rightTie = "src_id")
      .select("event_id", "asof_v", "asof_src_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    val expected = left.map { case (eid, u, ts) =>
      val best = right.filter(r => r._1 == u && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption // max ts, then max src_id
      (eid, best.map(_._4), best.map(_._3))
    }.sortBy(_._1)
    assert(got === expected)
  }

  test("rangeJoin equals the brute-force reference row-for-row on random " +
    "intervals (seeded), including bucket-straddling and degenerate ones") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val iv = (1 to 200).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, lo, lo + rnd.nextInt(400).toLong) // 0..400 wide, bucket 128
    }
    val pts = (1 to 3000).map(i => (i.toLong, rnd.nextInt(6000).toLong))
    val got = TemporalJoin.rangeJoin(pts.toDF("p_id", "ts"), "ts",
        iv.toDF("win", "lo", "hi"), "lo", "hi", bucket = 128L)
      .select("p_id", "win").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (pid, ts) <- pts
      (win, lo, hi) <- iv
      if ts >= lo && ts <= hi
    } yield (pid, win)).sorted
    assert(got === expected)
  }

  test("asOfGroup (streaming state fn): purchase state survives across " +
    "micro-batches and ties follow the batch contract") {
    import graft.streaming.StreamOps
    // batch 1: purchase@10 (id 1, v 2.5), event@15 sees it; tied purchases
    // @20 (ids 2,3) — id 3 must win for the event@20 in the SAME batch
    val (out1, st1) = StreamOps.asOfGroup(7L, Vector(
      (1L, 10L, 7L, "purchase", 2.5),
      (50L, 15L, 7L, "click", 0.0),
      (2L, 20L, 7L, "purchase", 4.0),
      (3L, 20L, 7L, "purchase", 6.0),
      (51L, 20L, 7L, "view", 0.0)), None)
    assert(out1 === Vector(
      (50L, 7L, Some(2.5), Some(1L)),
      (51L, 7L, Some(6.0), Some(3L))))
    assert(st1 === Some(StreamOps.AsOfState(20L, 3L, 6.0)))
    // batch 2: an event BEFORE any new purchase must see batch 1's state;
    // a stale-looking older purchase (ts 5) must NOT replace newer state
    val (out2, st2) = StreamOps.asOfGroup(7L, Vector(
      (4L, 5L, 7L, "purchase", 9.9),
      (52L, 30L, 7L, "click", 0.0)), st1)
    assert(out2 === Vector((52L, 7L, Some(6.0), Some(3L))))
    assert(st2 === st1)
    // no purchases ever: events emit null state
    val (out3, st3) = StreamOps.asOfGroup(8L, Vector(
      (53L, 1L, 8L, "view", 0.0)), None)
    assert(out3 === Vector((53L, 8L, None, None)))
    assert(st3 === None)
  }

  test("weightedSample: at most k per group, deterministic, heavier rows " +
    "sampled more often; no window operator in the plan") {
    val s = spark
    import s.implicits._
    val df = (1 to 2000).map { i =>
      // two groups; in group "g0" doc ids 1..20 get weight 1000, rest 1
      val grp = s"g${i % 2}"
      val w = if (i <= 40) 1000.0 else 1.0
      (i.toLong, grp, w)
    }.toDF("doc_id", "grp", "w")
    val got = TemporalJoin.weightedSample(df, col("grp"), col("doc_id"),
      col("w"), k = 5)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "weighted sample must use the bounded TopKAgg, not a window rank")
    val rows = got.collect()
    assert(rows.length === 10) // 5 per group
    assert(rows.map(_.getInt(1)).count(_ == 1) === 2) // one rank-1 each
    // determinism: second run identical
    val again = TemporalJoin.weightedSample(df, col("grp"), col("doc_id"),
      col("w"), k = 5).collect()
    assert(rows.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
    // the 40 heavy rows (2% of rows, >98% of weight) should dominate the
    // sample under the A-ES key
    val heavy = rows.count(_.getLong(2) <= 40)
    assert(heavy >= 8, s"expected heavy rows to dominate, got $heavy/10")
  }
}
