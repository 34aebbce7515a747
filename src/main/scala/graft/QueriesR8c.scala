package graft

import org.apache.spark.sql.functions._

/** Round-8 third batch: mergeable-HLL distinct counts (the incremental
  * catalog's last non-additive stat), z-order layout, out-of-fold
  * target encoding. */
object QueriesR8c {
  import QueryUtil.docs

  // ---- mergeable HLL distinct ----------------------------------------------

  /** Distinct-token estimation contract, per source and corpus-wide:
    * every estimate must sit within 3% of the EXACT distinct count
    * (p=14 ⇒ 0.81% std err), and the sketch over a crc32-parity split
    * must merge BIT-IDENTICAL to the whole-corpus sketch — the property
    * that makes `distinctCount` additive in the incremental catalog
    * (Hll.mergeWithSketches). Exact counts are value-checked against
    * DuckDB; the estimates live in the `ok` booleans. */
  private val hllDistinct: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val toks = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
      val agg = graft.agg.Hll.sketchAgg()
      def ok(regs: Array[Byte], exact: Long): Int =
        if (math.abs(graft.agg.Hll.estimate(regs) / exact - 1.0) <= 0.03) 1
        else 0
      // harness-only: the countDistinct is the exact-truth dual for the
      // HLL estimate contract; the collect is bounded (one row per source)
      val perSource = toks.groupBy("source")
        .agg(agg(col("t")).as("regs"),
          countDistinct(col("t")).as("exact_n"))
        .collect()
        .map(r => (r.getString(0), ok(r.getAs[Array[Byte]](1),
          r.getLong(2)), r.getLong(2)))
      val corpusRow = toks
        .agg(agg(col("t")).as("regs"), countDistinct(col("t")).as("exact_n"))
        .head()
      val (whole, exactAll) =
        (corpusRow.getAs[Array[Byte]](0), corpusRow.getLong(1))
      def half(parity: Int) = toks.filter(crc32(col("t")) % 2 === parity)
        .agg(agg(col("t"))).head().getAs[Array[Byte]](0)
      val merged = graft.agg.Hll.merge(half(0), half(1))
      val mergeOk =
        if (java.util.Arrays.equals(merged, whole)) 1 else 0
      (perSource.toSeq :+
        ("corpus", ok(whole, exactAll), exactAll) :+
        ("merge_bitexact", mergeOk, exactAll))
        .toDF("metric", "ok", "exact_n")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT source, t FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE t <> '')
        |SELECT source AS metric, 1 AS ok,
        |  count(DISTINCT t)::BIGINT AS exact_n
        |FROM toks GROUP BY source
        |UNION ALL SELECT 'corpus', 1, count(DISTINCT t)::BIGINT FROM toks
        |UNION ALL SELECT 'merge_bitexact', 1, count(DISTINCT t)::BIGINT
        |FROM toks
        |""".stripMargin))

  // ---- z-order layout ------------------------------------------------------

  /** Z-order layout contract: the corpus survives the rewrite (count
    * value-checked) and every output file covers a bounded RECTANGLE of
    * the two-key code space — per-file code coverage averages ≤ 0.8 in
    * BOTH dimensions (a linear sort pins one dim near 0 and leaves the
    * other at 1.0; z-order quadrants sit near 0.5 each). The measured
    * row-group-skipping proof on both dims lives in LayoutSpec. */
  private val zorderLayout: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val tmp = s"/tmp/graft_zorder_${java.util.UUID.randomUUID()}"
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
      graft.sources.Layout.zorderWrite(d, tmp, "doc_id", "n_chars",
        nParts = 4)
      val mm = d.agg(min("doc_id"), max("doc_id"),
        min("n_chars"), max("n_chars")).head()
      val (aLo, aHi) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
      val (bLo, bHi) = (mm.getLong(2).toDouble, mm.getLong(3).toDouble)
      def codeCov(fLo: Double, fHi: Double, lo: Double, hi: Double) =
        if (hi <= lo) 0.0 else (fHi - fLo) / (hi - lo)
      val files = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getPath).sorted
      val perFile = files.map { f =>
        val r = s.read.parquet(f).agg(
          min("doc_id"), max("doc_id"), min("n_chars"), max("n_chars"),
          count(lit(1))).head()
        (codeCov(r.getLong(0).toDouble, r.getLong(1).toDouble, aLo, aHi),
          codeCov(r.getLong(2).toDouble, r.getLong(3).toDouble, bLo, bHi),
          r.getLong(4))
      }
      val n = perFile.map(_._3).sum
      val covA = perFile.map(_._1).sum / perFile.length
      val covB = perFile.map(_._2).sum / perFile.length
      Seq(
        ("dim_a_bounded", if (covA <= 0.8) 1 else 0, n),
        ("dim_b_bounded", if (covB <= 0.8) 1 else 0, n))
        .toDF("contract", "ok", "n")
    },
    oracle = Some(
      """SELECT 'dim_a_bounded' AS contract, 1 AS ok, count(*) AS n
        |FROM documents
        |UNION ALL SELECT 'dim_b_bounded', 1, count(*) FROM documents
        |""".stripMargin))

  // ---- out-of-fold target encoding -----------------------------------------

  /** Leakage-protected smoothed mean target encoding of a 50-way
    * part-family category: every row's encoding draws target mass ONLY
    * from the other folds. All 60k rows value-checked — fold hashing,
    * exclusion arithmetic and prior smoothing mirrored exactly in the
    * oracle. */
  private val targetEncode: Q = Q(
    fn = (s, dir) => {
      val d = QueryUtil.li(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          concat(lit("p"), (col("l_partkey") % 50).cast("string"))
            .as("part_family"))
      graft.ops.TargetEncode.oofMean(
          d,
          cat = col("part_family"),
          target = (col("l_returnflag") === "R").cast("int"),
          key = concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")))
        .select(col("l_orderkey"), col("l_linenumber"), col("part_family"),
          col("fold"), round(col("enc"), 6).as("enc"))
    },
    oracle = Some {
      val hexVal = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * " +
          s"(1::BIGINT << ${4 * (8 - i)})").mkString("(", "\n     + ", ")")
      s"""WITH r AS (
         |  SELECT l_orderkey, l_linenumber,
         |    'p' || (l_partkey % 50)::VARCHAR AS part_family,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
         |    md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR) AS m
         |  FROM lineitem),
         |f AS (SELECT l_orderkey, l_linenumber, part_family, t,
         |        $hexVal % 5 AS fold
         |      FROM r),
         |g AS (SELECT sum(t)::DOUBLE / count(*) AS prior FROM f),
         |pf AS (SELECT part_family, fold, sum(t)::BIGINT AS fold_pos,
         |         count(*)::BIGINT AS fold_n
         |       FROM f GROUP BY 1, 2),
         |pc AS (SELECT part_family, sum(fold_pos)::BIGINT AS all_pos,
         |         sum(fold_n)::BIGINT AS all_n
         |       FROM pf GROUP BY 1),
         |e AS (SELECT pf.part_family, pf.fold,
         |        (all_pos - fold_pos + prior * 20.0) /
         |          (all_n - fold_n + 20.0) AS enc
         |      FROM pf JOIN pc USING (part_family) CROSS JOIN g)
         |SELECT f.l_orderkey, f.l_linenumber, f.part_family, f.fold,
         |  round(e.enc, 6) AS enc
         |FROM f JOIN e ON f.part_family = e.part_family AND f.fold = e.fold
         |""".stripMargin
    })

  // ---- streaming distinct maintenance --------------------------------------

  /** Streaming twin of q_hll_distinct: the corpus streamed in 4
    * micro-batches through the HLL maintainer must produce registers
    * BIT-IDENTICAL to a one-shot batch sketch (mergeability at the query
    * level), with the live estimate inside 3% of the exact distinct
    * count (value-checked). */
  private val streamDistinct: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val toksExpr = "filter(split(text, ' '), t -> t <> '')"
      val tmp = s"/tmp/graft_sdc_${java.util.UUID.randomUUID()}"
      docs(s, dir).repartition(4).write.parquet(tmp)
      val schema = s.read.parquet(tmp).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
        .select(explode(expr(toksExpr)).as("t"))
      val (q, getRegs, getEst) = graft.streaming.StreamStats
        .maintainDistinct(stream, col("t"))
      q.awaitTermination()
      val toks = docs(s, dir).select(explode(expr(toksExpr)).as("t"))
      val oneShot = graft.agg.Hll.sketch(toks, "t")
      val exact = toks.select(countDistinct(col("t"))).head().getLong(0)
      val bitEq =
        if (java.util.Arrays.equals(getRegs(), oneShot)) 1 else 0
      val estOk =
        if (math.abs(getEst() / exact - 1.0) <= 0.03) 1 else 0
      Seq(
        ("batching_invariant", bitEq, exact),
        ("estimate_within_3pct", estOk, exact))
        .toDF("contract", "ok", "exact_n")
    },
    oracle = Some(
      """WITH d AS (
        |  SELECT count(DISTINCT t)::BIGINT AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '')
        |SELECT 'batching_invariant' AS contract, 1 AS ok, n AS exact_n
        |FROM d
        |UNION ALL SELECT 'estimate_within_3pct', 1, n FROM d
        |""".stripMargin))

  // ---- robust scaling / winsorization --------------------------------------

  /** Outlier-immune normalization beyond the reference's 16 types:
    * robust score = (v − median)/IQR clamped ±6, winsorized price
    * clipped into [p05, p95]. Quantiles via the exact-percentile recipe
    * (percentile_approx accuracy=MaxInt ↔ quantile_disc), arithmetic
    * mirrored operation-for-operation — all 60k rows value-checked. */
  private val normRobust: Q = Q(
    fn = (s, dir) => {
      val d = QueryUtil.li(s, dir)
      // exact quantiles via the distributed prefix-sum path (same values
      // as percentile_approx(MaxInt); linear at any cardinality); the
      // unused prob slots per column cost nothing extra — one shared pass
      val qs = graft.ops.ExactQuantiles.quantilesAuto(d,
        Seq("l_quantity", "l_extendedprice"),
        Seq(0.05, 0.25, 0.5, 0.75, 0.95))
      val Seq(_, q25, q50, q75, _) = qs("l_quantity")
      val Seq(p05, _, _, _, p95) = qs("l_extendedprice")
      d.select(col("l_orderkey"), col("l_linenumber"),
        round(graft.ops.Normalize.robustScale(
          col("l_quantity"), q50, q25, q75), 6).as("robust_qty"),
        round(graft.ops.Normalize.winsorize(
          col("l_extendedprice"), p05, p95), 6).as("wins_price"))
    },
    oracle = Some(
      """WITH q AS (
        |  SELECT quantile_disc(l_quantity, 0.25) AS q25,
        |    quantile_disc(l_quantity, 0.5) AS q50,
        |    quantile_disc(l_quantity, 0.75) AS q75,
        |    quantile_disc(l_extendedprice, 0.05) AS p05,
        |    quantile_disc(l_extendedprice, 0.95) AS p95
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN q75 - q25 <= 0 OR l_quantity IS NULL THEN 0.0
        |    ELSE least(greatest(
        |      (l_quantity - q50) / (q75 - q25), -6.0), 6.0) END, 6)
        |    AS robust_qty,
        |  round(CASE WHEN l_extendedprice IS NULL THEN NULL
        |    WHEN l_extendedprice > p95 THEN p95
        |    WHEN l_extendedprice < p05 THEN p05
        |    ELSE l_extendedprice END, 6) AS wins_price
        |FROM lineitem CROSS JOIN q
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_hll_distinct"   -> hllDistinct,
    "q_zorder_layout"  -> zorderLayout,
    "q_target_encode"  -> targetEncode,
    "q_stream_distinct" -> streamDistinct,
    "q_norm_robust"    -> normRobust,
  )
}
