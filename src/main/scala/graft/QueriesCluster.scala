package graft

import org.apache.spark.sql.functions._

/** Batch 4: quality-balanced rejection sampling, per-group exact
  * quartiles, stream-static enrichment, and the first-class k-means
  * clustering contract. */
object QueriesCluster {
  import QueryUtil.docs

  // shared md5-digit arithmetic (the q_hash_sample idiom): first 4 hex
  // digits of the row hash as an integer in [0, 65536)
  private val hx = "'0123456789abcdef'"
  private def hex4(h: String): String =
    s"(((instr($hx, substr($h, 1, 1)) - 1) * 16 + " +
      s"(instr($hx, substr($h, 2, 1)) - 1)) * 16 + " +
      s"(instr($hx, substr($h, 3, 1)) - 1)) * 16 + " +
      s"(instr($hx, substr($h, 4, 1)) - 1)"

  // ---- quality-balanced rejection sampling ---------------------------------

  /** Rejection sampling that FLATTENS the corpus length distribution:
    * per-bin acceptance = floor(65536·min_bin/bin) against a
    * deterministic md5 draw — the "don't let boilerplate-length docs
    * dominate" balancing step of a training-data pipeline, auditable
    * and replayable (same corpus → same sample). One scan bins, a
    * bounded bin table sets thresholds, one narrow filter samples —
    * nothing re-sorts or re-scans per bin. */
  private val rejectionSample: Q = Q(
    fn = (s, dir) => {
      val k = 10
      val d0 = docs(s, dir)
      val Array(mnL, mxL) = d0.agg(min("n_chars").cast("double"),
        max("n_chars").cast("double")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val (mn, mx) = (s"${mnL}D", s"${mxL}D")
      val arms = (1 until k).reverse
        .map(i => s"WHEN n_chars >= $mn + ($mx - $mn) * $i / $k THEN $i")
        .mkString(" ")
      val binned = d0.withColumn("bin", expr(s"CASE $arms ELSE 0 END"))
      binned.cache()
      try {
        val counts = binned.groupBy("bin").agg(count(lit(1)).as("n_before"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
        val minCnt = counts.values.min
        val thrArms = counts.map { case (b, n) =>
          s"WHEN bin = $b THEN ${math.floor(65536.0 * minCnt / n).toLong}"
        }.mkString(" ")
        val rowH = "md5(cast(cast(doc_id AS string) AS binary))"
        val kept = binned
          .filter(expr(s"${hex4(rowH)} < (CASE $thrArms END)"))
          .groupBy("bin").agg(count(lit(1)).as("n_after"))
        import s.implicits._
        val before = counts.toSeq.toDF("bin", "n_before")
        before.join(kept, Seq("bin"), "left")
          .select(col("bin").cast("long").as("bin"), col("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"))
      } finally binned.unpersist(false)
    },
    oracle = Some {
      val k = 10
      val arms = (1 until k).reverse
        .map(i => s"WHEN n_chars >= mn + (mx - mn) * $i / $k THEN $i")
        .mkString(" ")
      val rowH = "md5(cast(doc_id AS VARCHAR))"
      s"""WITH s AS (SELECT min(n_chars)::DOUBLE AS mn,
         |           max(n_chars)::DOUBLE AS mx FROM documents),
         |binned AS (SELECT doc_id, (CASE $arms ELSE 0 END)::BIGINT AS bin
         |           FROM documents CROSS JOIN s),
         |counts AS (SELECT bin, count(*)::BIGINT AS n_before
         |           FROM binned GROUP BY bin),
         |thr AS (SELECT bin, n_before,
         |    CAST(floor(65536.0 * (min(n_before) OVER ()) / n_before)
         |      AS BIGINT) AS t
         |  FROM counts),
         |kept AS (SELECT b.bin, count(*)::BIGINT AS n_after
         |  FROM binned b JOIN thr USING (bin)
         |  WHERE ${hex4(rowH)} < thr.t GROUP BY b.bin)
         |SELECT thr.bin, thr.n_before,
         |  coalesce(kept.n_after, 0)::BIGINT AS n_after
         |FROM thr LEFT JOIN kept USING (bin)
         |""".stripMargin
    })

  // ---- per-group exact quartiles -------------------------------------------

  /** Per-source exact quartiles of document length — the per-group
    * exact-quantile path ([[graft.ops.ExactQuantiles.groupedQuantiles]]:
    * window over the per-group DISTINCT-VALUE table, zero driver state)
    * pivoted back to one row per source. Same values as grouped
    * `percentile_approx` at exact accuracy == DuckDB quantile_disc
    * (spec'd); n_chars is integral so the double→long fold is exact. */
  private val groupQuartiles: Q = Q(
    fn = (s, dir) =>
      graft.ops.ExactQuantiles.groupedQuantiles(
          docs(s, dir), "source", "n_chars", Seq(0.25, 0.5, 0.75))
        .groupBy("source")
        .agg(
          max(when(col("p_idx") === 0, col("q"))).cast("long").as("p25"),
          max(when(col("p_idx") === 1, col("q"))).cast("long").as("p50"),
          max(when(col("p_idx") === 2, col("q"))).cast("long").as("p75")),
    oracle = Some(
      """SELECT source,
        |  quantile_disc(n_chars, 0.25) AS p25,
        |  quantile_disc(n_chars, 0.5) AS p50,
        |  quantile_disc(n_chars, 0.75) AS p75
        |FROM documents GROUP BY source
        |""".stripMargin))

  // ---- stream-static enrichment join ---------------------------------------

  private val streamEnrich: Q = Q(
    fn = (s, dir) => graft.streaming.StreamOps.staticEnrichJoin(s, dir),
    oracle = Some(
      s"""SELECT c_mktsegment, event_type, count(*)::BIGINT AS n,
        |  CAST(sum(${QueryUtil.milsSql("value")}) AS BIGINT)
        |    AS sum_mils
        |FROM events JOIN customer ON c_custkey = user_id
        |GROUP BY 1, 2
        |""".stripMargin))

  // ---- k-means clustering contract -----------------------------------------

  /** Distributed k-means (MLlib Lloyd) search contract — like the IVF
    * queries, cluster VALUES are FP-order sensitive, so the oracle
    * checks invariants: corpus count preserved (value-checked), k
    * non-empty clusters, every point assigned to its NEAREST centroid
    * (re-verified with an independent distance pass), and inertia no
    * worse than the single-cluster variance baseline. */
  private val kmeans: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      // clusterable = KMeans.fit's own row universe (non-null, every
      // coordinate finite) so the audit/baseline cover exactly the
      // fitted rows (NaN gate)
      val emb = Tables.load(s, dir, "embeddings")
        .filter(graft.sim.KMeans.clusterable(col("embedding")))
      val fitted = graft.sim.KMeans.fit(emb, k = 8)
      val assign = fitted.assign.cache()
      try {
        val n = emb.count()
        val nAssigned = assign.count()
        val nClusters = assign.select("cluster").distinct().count()
        // independent nearest-centroid audit
        val cents = fitted.centroids
        val bc = s.sparkContext.broadcast(cents)
        val mismatches = emb
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("e"))
          .join(assign, Seq("vec_id"))
          .as[(Long, Seq[Double], Long)]
          .filter { case (_, e, c) =>
            val cs = bc.value
            var best = 0; var bestD = Double.MaxValue
            var i = 0
            while (i < cs.length) {
              var d2 = 0.0; var j = 0
              while (j < e.length) {
                val d = e(j) - cs(i)(j); d2 += d * d; j += 1
              }
              if (d2 < bestD - 1e-9) { bestD = d2; best = i }
              i += 1
            }
            // allow FP ties: assigned cluster must be within 1e-6 of best
            var dc2 = 0.0; var j = 0
            while (j < e.length) {
              val d = e(j) - cs(c.toInt)(j); dc2 += d * d; j += 1
            }
            dc2 > bestD + 1e-6
          }.count()
        // single-cluster baseline: total variance around the global mean
        val dims = 64
        val meanRow = emb.select(
          (0 until dims).map(i => avg(element_at(col("embedding"), i + 1)
            .cast("double")).as(s"m$i")): _*).head()
        val gm = (0 until dims).map(meanRow.getDouble).toArray
        val bcM = s.sparkContext.broadcast(gm)
        val baseline = emb.select(col("embedding").cast("array<double>")
            .as("e")).as[Seq[Double]]
          .map { e =>
            var d2 = 0.0; var j = 0
            while (j < e.length) {
              val d = e(j) - bcM.value(j); d2 += d * d; j += 1
            }
            d2
          }.reduce(_ + _)
        Seq(
          ("n_points", n, 1L),
          ("all_assigned", nAssigned, if (nAssigned == n) 1L else 0L),
          ("k_nonempty", nClusters,
            if (nClusters == math.min(8L, n)) 1L else 0L),
          ("assign_is_nearest", mismatches,
            if (mismatches == 0L) 1L else 0L),
          ("inertia_beats_baseline", 0L,
            if (fitted.inertia <= baseline + 1e-6) 1L else 0L))
          .toDF("contract", "n", "ok")
      } finally assign.unpersist(false)
    },
    oracle = Some(
      """WITH nn AS (SELECT count(*)::BIGINT AS c FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
        |    x -> x IS NULL OR isnan(x) OR isinf(x))) = 0)
        |SELECT 'n_points' AS contract, c AS n, 1::BIGINT AS ok FROM nn
        |UNION ALL SELECT 'all_assigned', c, 1 FROM nn
        |UNION ALL SELECT 'k_nonempty', least(8, c), 1 FROM nn
        |UNION ALL SELECT 'assign_is_nearest', 0, 1
        |UNION ALL SELECT 'inertia_beats_baseline', 0, 1
        |""".stripMargin))

  // ---- codegen binary-search discretization --------------------------------

  /** 256-bin equal-interval discretization of l_extendedprice through
    * the codegen'd [[graft.expr.BinIndex]] binary search (O(log k) per
    * row, boundary array hoisted into the generated class) — the
    * large-k path where a 256-arm when-chain is O(k) per row and hard
    * on janino. The oracle IS the 255-arm CASE chain, so the search is
    * proven equal to the chain semantics boundary for boundary. */
  private val binSearch: Q = Q(
    fn = (s, dir) => {
      val k = 256
      val d = Tables.load(s, dir, "lineitem")
      val Array(mn, mx) = d.agg(min("l_extendedprice"),
        max("l_extendedprice")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val bounds = (1 until k).map(i => mn + (mx - mn) * i / k)
      // the custom BinIndex expression is null-in/null-out; the
      // catalog convention sends missing values to the LAST bin
      d.select(coalesce(
          graft.expr.BinIndex.of(col("l_extendedprice"), bounds)
            .cast("long"), lit(k.toLong)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    },
    oracle = Some {
      val k = 256
      val arms = (1 until k).reverse
        .map(i => s"WHEN l_extendedprice >= mn + (mx - mn) * $i / $k THEN $i")
        .mkString(" ")
      s"""WITH s AS (SELECT min(l_extendedprice) AS mn,
         |           max(l_extendedprice) AS mx FROM lineitem)
         |SELECT (CASE WHEN l_extendedprice IS NULL THEN $k
         |  $arms ELSE 0 END)::BIGINT AS bin,
         |  count(*)::BIGINT AS n
         |FROM lineitem CROSS JOIN s GROUP BY 1
         |""".stripMargin
    })

  // ---- per-group quantile normalization ------------------------------------

  /** Quantile-normalize document lengths per source onto the global
    * length distribution — every (doc, bin, mapped value) value-checked;
    * all integer (n_chars is integral, boundaries are exact
    * percentile_approx == quantile_disc picks). */
  private val quantileNorm: Q = {
    val k = 20
    val qs = (1 until k).map(_.toDouble / k)
    Q(
      fn = (s, dir) => graft.ops.QuantileNorm
        .normalize(docs(s, dir), "source", "n_chars", k)
        .select("doc_id", "src_bin", "qnorm"),
      oracle = Some {
        val qList = qs.mkString("[", ", ", "]")
        s"""WITH gb AS (SELECT source,
           |    quantile_disc(n_chars, $qList) AS gbounds
           |  FROM documents GROUP BY source),
           |ge AS (SELECT list_prepend(min(n_chars),
           |    quantile_disc(n_chars, $qList)) AS gedges FROM documents)
           |SELECT d.doc_id,
           |  len(list_filter(gb.gbounds, b -> d.n_chars >= b))::BIGINT
           |    AS src_bin,
           |  ge.gedges[len(list_filter(gb.gbounds, b -> d.n_chars >= b)) + 1]
           |    AS qnorm
           |FROM documents d JOIN gb USING (source) CROSS JOIN ge
           |""".stripMargin
      })
  }

  val all: Map[String, Q] = Map(
    "q_rejection_sample" -> rejectionSample,
    "q_group_quartiles"  -> groupQuartiles,
    "q_stream_enrich"    -> streamEnrich,
    "q_kmeans"           -> kmeans,
    "q_bin_search"       -> binSearch,
    "q_quantile_norm"    -> quantileNorm,
  )
}
