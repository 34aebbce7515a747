package graft

import org.apache.spark.sql.functions._

/** Round-8 second batch: ORC format round-trip, exact-k per-stratum
  * sampling, chunk→doc embedding pooling, MMR diversified re-ranking,
  * and isotonic score calibration. */
object QueriesR8b {
  import QueryUtil.{docs, li, isPos, scoreCol, scoreSql}

  // ---- ORC source/sink (§2.1 depth: the second columnar format) ------------

  /** Write a lineitem extract as zstd ORC, read it back through the ORC
    * scanner with a pushed filter, aggregate — values must equal the
    * parquet-side oracle. Plan-shape (PushedFilters reaching the ORC
    * scan) is asserted in Round8bOpsSpec. */
  private val orcRoundtrip: Q = Q(
    fn = (s, dir) => {
      val tmp = s"/tmp/graft_orc_${java.util.UUID.randomUUID()}"
      graft.sources.Columnar.writeOrc(
        li(s, dir).select("l_orderkey", "l_quantity", "l_returnflag"), tmp)
      val back = graft.sources.Columnar.readOrc(s, tmp)
        .filter(col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      back.cache().count() // materialize before the tmp dir could vanish
      back
    },
    oracle = Some(
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem WHERE l_quantity > 25
        |GROUP BY 1
        |""".stripMargin))

  // ---- exact-k per-stratum deterministic sample ----------------------------

  /** Reservoir-equivalent exact-k sampling per source: the k docs with the
    * smallest md5(doc_id) in each stratum. Unlike the fraction-based
    * `q_stratified_sample`, the output size per stratum is EXACT (k or
    * the stratum size), which is what an eval-set builder needs. Scale:
    * bounded TopK partial aggregation — every map task keeps ≤ k
    * candidates per stratum, the exchange moves `strata × k` rows, no
    * sort of the corpus anywhere. */
  private val sampleGroupK: Q = {
    val k = 50
    Q(
      fn = (s, dir) => {
        val d = docs(s, dir).select(col("source"),
          concat(md5(col("doc_id").cast("string").cast("binary")),
            lit("|"), col("doc_id").cast("string")).as("key"))
        d.groupBy("source")
          .agg(graft.agg.TopKStrAgg.topK(k)(lit(0.0), col("key")).as("ks"))
          .select(col("source"), posexplode(col("ks")).as(Seq("p", "kv")))
          .select(col("source"), (col("p") + 1).cast("int").as("rank"),
            split(col("kv._2"), "\\|").getItem(1).cast("long").as("doc_id"))
      },
      oracle = Some(
        s"""WITH h AS (SELECT source, doc_id, md5(doc_id::VARCHAR) AS hx
           |  FROM documents),
           |r AS (SELECT source, doc_id,
           |        row_number() OVER (PARTITION BY source
           |                           ORDER BY hx, doc_id) AS rank
           |      FROM h)
           |SELECT source, rank::INT AS rank, doc_id FROM r WHERE rank <= $k
           |""".stripMargin))
  }

  // ---- chunk→doc embedding pooling (RAG / doc-embedding prep) --------------

  /** Mean-pool chunk embeddings into group embeddings (vec_id div 10 as
    * the synthetic doc key): the standard doc-embedding construction when
    * a long document was embedded in chunks. One explode + one groupBy —
    * shuffled bytes are O(vectors × dim) scalars with map-side partial
    * aggregation. Sums fold in ascending vec_id order in BOTH engines
    * (sorted-struct aggregate here, ordered array_agg in the oracle), so
    * the means are bit-identical before rounding. */
  private val embedPool: Q = Q(
    fn = (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(expr("vec_id div 10").as("gid"), col("vec_id"),
          posexplode(expr("transform(embedding, x -> cast(x AS double))"))
            .as(Seq("pos", "x")))
      e.groupBy("gid", "pos")
        .agg(count(lit(1)).as("n_chunks"),
          expr("""aggregate(array_sort(collect_list(struct(vec_id, x))),
                |  cast(0.0 AS double), (acc, p) -> acc + p.x)"""
            .stripMargin).as("sm"))
        .select(col("gid"), col("pos").cast("int").as("pos"),
          col("n_chunks"),
          // + 0.0 normalizes a NEGATIVE-ZERO mean (all-negative tiny
          // chunks rounding to -0.0): Spark and DuckDB disagree on the
          // sign bit's survival through round, and the driver hash
          // tells -0.0 from 0.0 (r16 sf1 gate)
          (round(col("sm") / col("n_chunks"), 6) + lit(0.0)).as("mean_r"))
    },
    oracle = Some(
      """WITH e AS (SELECT vec_id // 10 AS gid, vec_id,
        |    unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS pos
        |  FROM embeddings)
        |SELECT gid, pos::INT AS pos, count(*) AS n_chunks,
        |  round(list_sum(array_agg(x ORDER BY vec_id)) / count(*), 6) + 0.0
        |    AS mean_r
        |FROM e GROUP BY gid, pos
        |""".stripMargin))

  // ---- MMR diversified re-ranking ------------------------------------------

  /** Full value check of the greedy MMR selection: the oracle unrolls the
    * k greedy steps as chained CTEs over the same bounded candidate pool
    * and pairwise cosines (identical IEEE expression in both engines;
    * ties break on vec_id everywhere). */
  private val mmrRerank: Q = {
    val nCand = 20
    val k = 5
    Q(
      fn = (s, dir) => graft.sim.Mmr.mmrTopK(
        Tables.load(s, dir, "embeddings"), queryId = 0L,
        nCand = nCand, k = k, lambda = 0.7),
      oracle = Some {
        val vCte =
          """v AS (SELECT vec_id,
            |  list_transform(embedding, x -> x::DOUBLE) AS e,
            |  sqrt(list_sum(list_transform(embedding,
            |       x -> x::DOUBLE * x::DOUBLE))) AS norm
            |FROM embeddings WHERE embedding IS NOT NULL)""".stripMargin
        val steps = (2 to k).map { i =>
          s"""m$i AS (SELECT c.vec_id, c.rel, max(s.s) AS d
             |  FROM cv c
             |  JOIN sim s ON s.ai = c.vec_id
             |  JOIN a${i - 1} p ON s.bi = p.vec_id
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM a${i - 1})
             |  GROUP BY c.vec_id, c.rel),
             |p$i AS (SELECT vec_id, rel, $i AS rank,
             |          0.7 * rel - (1.0 - 0.7) * d AS score
             |        FROM m$i ORDER BY score DESC, vec_id LIMIT 1),
             |a$i AS (SELECT * FROM a${i - 1} UNION ALL SELECT * FROM p$i)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $vCte,
           |q AS (SELECT e, norm FROM v WHERE vec_id = 0),
           |relt AS (SELECT v.vec_id,
           |    CASE WHEN v.norm * q.norm > 0 THEN
           |      list_sum(list_transform(list_zip(v.e, q.e),
           |        pr -> pr[1] * pr[2])) / (v.norm * q.norm)
           |      ELSE 0.0 END AS rel
           |  FROM v, q WHERE v.vec_id <> 0),
           |cand AS (SELECT vec_id, rel FROM (
           |    SELECT vec_id, rel,
           |      row_number() OVER (ORDER BY rel DESC, vec_id) AS rk
           |    FROM relt) WHERE rk <= $nCand),
           |cv AS (SELECT c.vec_id, c.rel, v.e, v.norm
           |       FROM cand c JOIN v ON v.vec_id = c.vec_id),
           |sim AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
           |    CASE WHEN a.norm * b.norm > 0 THEN
           |      list_sum(list_transform(list_zip(a.e, b.e),
           |        pr -> pr[1] * pr[2])) / (a.norm * b.norm)
           |      ELSE 0.0 END AS s
           |  FROM cv a JOIN cv b ON a.vec_id <> b.vec_id),
           |p1 AS (SELECT vec_id, rel, 1 AS rank, 0.7 * rel AS score
           |       FROM cv ORDER BY rel DESC, vec_id LIMIT 1),
           |a1 AS (SELECT * FROM p1),
           |$steps
           |SELECT rank::INT AS rank, vec_id, round(rel, 6) AS rel_r,
           |  round(score, 6) AS mmr_r
           |FROM a$k
           |""".stripMargin
      })
  }

  // ---- isotonic score calibration ------------------------------------------

  /** PAV output isn't SQL-expressible, so this is a contract query (like
    * the k-means/BPE family): fitted calibrator must be monotone
    * nondecreasing with probabilities in [0,1], mean-preserving over the
    * fit frame (a PAV identity), and at least as good as the constant
    * predictor in Brier score. The exact step values are spec-checked on
    * a hand-computed PAV fixture in Round8bOpsSpec. */
  private val calibration: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val d = li(s, dir)
      val model = graft.train.Calibrate.isotonicFit(d, scoreCol, isPos)
      val preds = model.predictions.toArray
      val monotone = preds.zip(preds.drop(1)).forall { case (a, b) => a <= b }
      val in01 = preds.forall(p => p >= -1e-12 && p <= 1.0 + 1e-12)
      // same row universe as the fit: scoreless rows out, null tag = 0
      val applied = graft.train.Calibrate(d, scoreCol, model)
        .select(col("calibrated"),
          coalesce(isPos.cast("double"), lit(0.0)).as("y"))
        .filter(col("calibrated").isNotNull)
      val r = applied.agg(
        avg("calibrated").as("mc"), avg("y").as("my"),
        avg(pow(col("calibrated") - col("y"), 2)).as("bCal"),
        count(lit(1)).as("n")).head()
      val (mc, my, bCal, n) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      val bConst = applied.agg(
        avg(pow(lit(my) - col("y"), 2))).head().getDouble(0)
      Seq(
        ("monotone", if (monotone) 1 else 0, n),
        ("probs_in_01", if (in01) 1 else 0, n),
        ("mean_preserving", if (math.abs(mc - my) <= 1e-9) 1 else 0, n),
        ("brier_improves", if (bCal <= bConst + 1e-12) 1 else 0, n))
        .toDF("contract", "ok", "n")
    },
    oracle = Some(
      // n = the calibratable rows: the fit and apply both exclude
      // rows whose score expression is NULL (missing price/discount)
      // or non-finite (Calibrate.finiteScore — NaN gate)
      s"""WITH ok AS (SELECT count(*) AS n FROM lineitem
        |  WHERE ($scoreSql) IS NOT NULL AND isfinite($scoreSql))
        |SELECT 'monotone' AS contract, 1 AS ok, n FROM ok
        |UNION ALL SELECT 'probs_in_01', 1, n FROM ok
        |UNION ALL SELECT 'mean_preserving', 1, n FROM ok
        |UNION ALL SELECT 'brier_improves', 1, n FROM ok
        |""".stripMargin))

  // ---- streaming incremental catalog maintenance ---------------------------

  /** Stream lineitem in 4 micro-batches through the foreachBatch
    * catalog maintainer; the merged catalog must equal the batch profile
    * EXACTLY on counts/bin duals (and hence KS/IV/WoE), moments to FP
    * tolerance — the live-stats path a continuously-ingesting corpus
    * takes instead of re-profiling. */
  private val streamStats: Q = {
    val cols = Seq("l_quantity", "l_extendedprice")
    Q(
      fn = (s, dir) => {
        import s.implicits._
        val d = li(s, dir).select("l_quantity", "l_extendedprice",
          "l_returnflag")
        val whole = graft.ops.StatsPipeline.profileNumeric(d, cols, isPos)
        val bounds: Map[String, Seq[Double]] =
          whole.map { case (c, p) => c -> (p.binning.binBoundary: Seq[Double]) }
        val tmp = s"/tmp/graft_sstats_${java.util.UUID.randomUUID()}"
        d.repartition(4).write.parquet(tmp)
        val schema = s.read.parquet(tmp).schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(tmp)
        val (q, get, nBatches) = graft.streaming.StreamStats
          .maintainNumericCounted(stream, cols, isPos, bounds)
        q.awaitTermination()
        val merged = get()
        def close(x: Option[Double], y: Option[Double], tol: Double) =
          (x, y) match {
            case (Some(a), Some(b)) =>
              // agreeing on an undefined (NaN/±Inf overflowed) moment
              // IS agreement — same rule as q_stats_merge
              a == b || (a.isNaN && b.isNaN) ||
                math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
            case (None, None) => true
            case _ => false
          }
        val n = d.count()
        (Seq(("multi_batch", if (nBatches() >= 2) 1 else 0)) ++
          cols.flatMap { c =>
            val w = whole(c); val m = merged(c)
            Seq(
              (s"counts_exact_$c",
                if (m.stats.totalCount == w.stats.totalCount &&
                  m.stats.missingCount == w.stats.missingCount &&
                  m.binning.binCountPos == w.binning.binCountPos &&
                  m.binning.binCountNeg == w.binning.binCountNeg) 1 else 0),
              (s"metrics_exact_$c",
                if (m.stats.ks == w.stats.ks && m.stats.iv == w.stats.iv &&
                  m.binning.binCountWoe == w.binning.binCountWoe) 1 else 0),
              (s"moments_close_$c",
                if (close(m.stats.mean, w.stats.mean, 1e-9) &&
                  close(m.stats.stdDev, w.stats.stdDev, 1e-9)) 1 else 0))
          }).map { case (name, ok) => (name, ok, n) }
          .toDF("contract", "ok", "n")
      },
      oracle = Some((Seq("multi_batch") ++ cols.flatMap(c => Seq(
        s"counts_exact_$c", s"metrics_exact_$c", s"moments_close_$c")))
        .map(nm =>
          s"SELECT '$nm' AS contract, 1 AS ok, count(*) AS n FROM lineitem")
        .mkString("", "\nUNION ALL ", "\n")))
  }

  // ---- per-source token-budget selection -----------------------------------

  /** [[graft.text.TextOps.selectTopMassBySource]] with the stopword-ratio
    * quality score and an 8k-token budget per source — every kept
    * (doc, source, bin, tokens) row value-checked against the oracle's
    * per-source cumulative-bin replay. */
  private val topMassBySource: Q = Q(
    fn = (s, dir) => {
      val q = graft.text.TextOps.quality(docs(s, dir))
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("stopword_ratio"),
          col("n_tokens"))
      graft.text.TextOps.selectTopMassBySource(q, col("stopword_ratio"),
        col("n_tokens"), budgetPerSource = 8000L)
    },
    oracle = Some {
      val stopList = graft.text.TextOps.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    round(len(list_filter(string_split(text, ' '),
         |        t -> t IN ($stopList)))::DOUBLE
         |      / len(string_split(text, ' ')), 6) AS score
         |  FROM documents),
         |d AS (SELECT doc_id, source,
         |  greatest(least(floor(score * 1000)::INT, 999), 0) AS bin,
         |  n_tokens FROM q
         |  WHERE score IS NOT NULL AND n_tokens IS NOT NULL),
         |b AS (SELECT source, bin, sum(n_tokens) AS tk
         |      FROM d GROUP BY source, bin),
         |c AS (SELECT source, bin,
         |        sum(tk) OVER (PARTITION BY source ORDER BY bin DESC) AS cum
         |      FROM b),
         |t AS (SELECT source, coalesce(min(bin), 2147483647) AS mk
         |      FROM c WHERE cum <= 8000 GROUP BY source)
         |SELECT d.doc_id, d.source, d.bin, d.n_tokens
         |FROM d JOIN t USING (source) WHERE d.bin >= t.mk
         |""".stripMargin
    })

  // ---- Misra-Gries heavy hitters -------------------------------------------

  /** The sketch result isn't SQL-expressible, so the contracts carry the
    * MG guarantees: estimates never exceed truth, never undershoot by
    * more than n/(k+1), and EVERY token with true count > n/(k+1) is
    * present. Truth comes from the exact in-Spark groupBy; the oracle
    * independently value-checks the corpus token count. */
  private val heavyHitters: Q = {
    val k = 200
    Q(
      fn = (s, dir) => {
        import s.implicits._
        val toks = docs(s, dir).select(explode(
          expr("filter(split(lower(text), ' '), t -> t <> '')")).as("t"))
        toks.cache()
        val n = toks.count()
        val thr = n / (k + 1)
        val sk = toks
          .agg(graft.agg.MisraGries.sketch(k)(col("t")).as("hh"))
          .select(explode(col("hh")).as("e"))
          .select(col("e._1").as("token"), col("e._2").as("est"))
        // harness-only: exact-truth dual for the sketch's contracts; the
        // collect is bounded by the sketch side (≤ k rows)
        val exact = toks.groupBy("t").agg(count(lit(1)).as("c"))
        val joined = sk.join(exact, sk("token") === exact("t"), "left")
          .select(col("token"), col("est"), col("c")).collect()
        toks.unpersist()
        val upper = joined.forall(r => r.getLong(1) <= r.getLong(2))
        val lower = joined.forall(r => r.getLong(1) >= r.getLong(2) - thr)
        val mustHave = exact.filter(col("c") > thr)
          .join(sk, exact("t") === sk("token"), "left_anti").count()
        Seq(
          ("est_le_truth", if (upper) 1 else 0, n),
          ("est_ge_truth_minus_eps", if (lower) 1 else 0, n),
          ("all_heavy_present", if (mustHave == 0) 1 else 0, n),
          ("bounded_size", if (joined.length <= k) 1 else 0, n))
          .toDF("contract", "ok", "n")
      },
      oracle = Some(
        """WITH n AS (SELECT sum(len(list_filter(string_split(lower(text),
          |    ' '), t -> t <> '')))::BIGINT AS n FROM documents)
          |SELECT 'est_le_truth' AS contract, 1 AS ok, n FROM n
          |UNION ALL SELECT 'est_ge_truth_minus_eps', 1, n FROM n
          |UNION ALL SELECT 'all_heavy_present', 1, n FROM n
          |UNION ALL SELECT 'bounded_size', 1, n FROM n
          |""".stripMargin))
  }

  // ---- product quantization (Jegou 2011) -----------------------------------

  /** PQ codebooks/codes are k-means outputs (FP-order-sensitive → no
    * cross-engine value parity), so like the IVF/k-means family this is
    * a contract query: code shape and range, full-corpus coverage,
    * Lloyd's guarantee (16-centroid reconstruction MSE strictly beats
    * the 1-centroid subspace-mean baseline), training determinism, and
    * the ADC top-k shape (dense ranks, nondecreasing distances, no
    * self-match). The planted-prototype ranking behavior is spec-checked
    * in Round8bOpsSpec. */
  private val pqQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val v = graft.sim.Similarity.prep(emb)
      // encodable = non-null embeddings (prep's contract)
      val n = emb.filter(col("embedding").isNotNull).count()
      val cb = graft.sim.Pq.train(v, m = 8, ksub = 16, nHint = n)
      val enc = graft.sim.Pq.encode(v, cb).cache()
      val shapeBad = enc.filter(size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16)).count()
      val coverage = enc.count()
      val mse16 = enc.agg(avg("err")).head().getDouble(0)
      enc.unpersist()
      val cb1 = graft.sim.Pq.train(v, m = 8, ksub = 1, nHint = n)
      val mse1 = graft.sim.Pq.encode(v, cb1)
        .agg(avg("err")).head().getDouble(0)
      val cb2 = graft.sim.Pq.train(v, m = 8, ksub = 16, nHint = n)
      val det = cb.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq
      val k = 5
      val adc = graft.sim.Pq.adcTopK(emb, queryId = 0L, k = k)
        .orderBy("rank").collect()
      // fewer-but-dense ranks are correct when the corpus holds fewer
      // than k candidates (tiny fixtures)
      val kAvail = math.min(k.toLong, math.max(0L, n - 1)).toInt
      val adcOk = adc.length == kAvail &&
        adc.map(_.getInt(0)).toSeq == (1 to adc.length) &&
        adc.map(_.getDouble(2)).sliding(2)
          .forall(w => w.length < 2 || w(0) <= w(1)) &&
        adc.forall(_.getLong(1) != 0L) &&
        adc.map(_.getLong(1)).distinct.length == adc.length
      Seq(
        ("codes_in_range", if (shapeBad == 0) 1 else 0, n),
        ("full_coverage", if (coverage == n) 1 else 0, n),
        ("kmeans_beats_mean", if (mse16 < mse1) 1 else 0, n),
        ("deterministic", if (det) 1 else 0, n),
        ("adc_topk_ok", if (adcOk) 1 else 0, n))
        .toDF("contract", "ok", "n")
    },
    oracle = Some(Seq("codes_in_range", "full_coverage",
      "kmeans_beats_mean", "deterministic", "adc_topk_ok")
      .map(c =>
        s"SELECT '$c' AS contract, 1 AS ok, count(*) AS n FROM embeddings" +
          s" WHERE embedding IS NOT NULL")
      .mkString("", "\nUNION ALL ", "\n")))

  /** Streaming twin of q_heavy_hitters: the corpus streamed in 4
    * micro-batches through the MG maintainer must still satisfy every MG
    * bound against exact whole-corpus truth — the mergeability proof at
    * the query level. */
  private val streamTopK: Q = {
    val k = 200
    Q(
      fn = (s, dir) => {
        import s.implicits._
        val toksExpr = "filter(split(lower(text), ' '), t -> t <> '')"
        val tmp = s"/tmp/graft_stk_${java.util.UUID.randomUUID()}"
        docs(s, dir).repartition(4).write.parquet(tmp)
        val schema = s.read.parquet(tmp).schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(tmp)
          .select(explode(expr(toksExpr)).as("t"))
        val (q, get) = graft.streaming.StreamStats
          .maintainTopK(stream, col("t"), k)
        q.awaitTermination()
        val got = get().toMap
        val toks = docs(s, dir).select(explode(expr(toksExpr)).as("t"))
        toks.cache()
        val n = toks.count()
        val thr = n / (k + 1)
        // harness-only: exact-truth dual (the operator under test is the
        // bounded MG sketch; this exact map exists only to check it)
        val exact = toks.groupBy("t").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        toks.unpersist()
        val upper = got.forall { case (t, e) => e <= exact(t) }
        val lower = got.forall { case (t, e) => e >= exact(t) - thr }
        val mustHave = exact.count { case (t, c) =>
          c > thr && !got.contains(t) }
        Seq(
          ("est_le_truth", if (upper) 1 else 0, n),
          ("est_ge_truth_minus_eps", if (lower) 1 else 0, n),
          ("all_heavy_present", if (mustHave == 0) 1 else 0, n),
          ("bounded_size", if (got.size <= k) 1 else 0, n))
          .toDF("contract", "ok", "n")
      },
      oracle = Some(
        """WITH n AS (SELECT sum(len(list_filter(string_split(lower(text),
          |    ' '), t -> t <> '')))::BIGINT AS n FROM documents)
          |SELECT 'est_le_truth' AS contract, 1 AS ok, n FROM n
          |UNION ALL SELECT 'est_ge_truth_minus_eps', 1, n FROM n
          |UNION ALL SELECT 'all_heavy_present', 1, n FROM n
          |UNION ALL SELECT 'bounded_size', 1, n FROM n
          |""".stripMargin))
  }

  /** IVFADC shape contract (k-means family → no cross-engine value
    * parity): dense cosine-ordered ranks, no self-match, distinct ids,
    * plus the planted-prototype ranking spec in Round8bOpsSpec. */
  private val ivfadcQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val k = 5
      val r = graft.sim.Pq.ivfadcTopK(emb, queryId = 0L, k = k, nProbe = 2)
        .orderBy("rank").collect()
      // a corpus smaller than k (or with pruned probe sets) can only
      // return what exists; fewer-but-dense ranks is still correct
      val kAvail = math.min(k.toLong, math.max(0L,
        emb.filter(col("embedding").isNotNull).count() - 1)).toInt
      val ok = r.length >= math.min(kAvail, 1) && r.length <= k &&
        r.map(_.getInt(0)).toSeq == (1 to r.length) &&
        r.map(_.getDouble(2)).sliding(2)
          .forall(w => w.length < 2 || w(0) <= w(1)) &&
        r.forall(_.getLong(1) != 0L) &&
        r.map(_.getLong(1)).distinct.length == r.length
      Seq((if (ok) 1 else 0, emb.count())).toDF("topk_ok", "n_emb")
    },
    oracle = Some(
      """SELECT 1 AS topk_ok, count(*) AS n_emb FROM embeddings
        |""".stripMargin))

  /** Hard-negative mining, full value check: two queries share one
    * corpus scan; positives (doc_id % 7 = 0) scrubbed from each bounded
    * top-20 pool, re-ranked to 10 — the oracle replays the identical
    * two-stage contract per query. */
  private val hardNegativesQ: Q = {
    val queries = Seq((1L, Seq("slow", "merge")), (2L, Seq("window", "merge")))
    val k = 10
    val headroom = 10
    Q(
      fn = (s, dir) => {
        import s.implicits._
        val d = docs(s, dir)
        val pos = Seq(1L, 2L).toDF("query_id")
          .crossJoin(d.select(col("doc_id")).filter(col("doc_id") % 7 === 0))
        graft.text.Retrieval.hardNegatives(d, queries, pos, k, headroom)
      },
      oracle = Some {
        val allTerms = queries.flatMap(_._2).distinct
        val dfCols = allTerms.zipWithIndex.map { case (t, i) =>
          s"    sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 " +
            s"END)::BIGINT AS df_$i"
        }.mkString(",\n")
        val dfIdx = allTerms.zipWithIndex.toMap
        val perQuery = queries.map { case (qid, terms) =>
          val tfCols = terms.map { t =>
            s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_${dfIdx(t)}"
          }.mkString(", ")
          val scoreTerms = terms.map { t =>
            val i = dfIdx(t)
            s"""ln((n - df_$i + 0.5::DOUBLE) / (df_$i + 0.5::DOUBLE) + 1.0)
               |      * (tf_$i * (1.2 + 1.0))
               |      / (tf_$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"""
              .stripMargin
          }.mkString("\n    + ")
          s"""t$qid AS (SELECT doc_id, dl, $tfCols FROM d),
             |sc$qid AS (SELECT doc_id, round($scoreTerms, 6) AS score
             |           FROM t$qid, c),
             |r$qid AS (SELECT doc_id, score,
             |            row_number() OVER (ORDER BY score DESC, doc_id)
             |              AS rn
             |          FROM sc$qid),
             |f$qid AS (SELECT $qid::BIGINT AS query_id,
             |            row_number() OVER (ORDER BY score DESC, doc_id)
             |              ::INT AS rank,
             |            doc_id, score
             |          FROM r$qid
             |          WHERE rn <= ${k + headroom} AND doc_id % 7 <> 0)"""
            .stripMargin
        }.mkString(",\n")
        val finals = queries.map { case (qid, _) =>
          s"SELECT * FROM f$qid WHERE rank <= $k"
        }.mkString("\nUNION ALL\n")
        s"""WITH base AS (
           |  SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '), t -> t <> '')
           |      AS toks
           |  FROM documents),
           |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM base),
           |s AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl,
           |$dfCols
           |  FROM d),
           |c AS (SELECT *, sumdl::DOUBLE / n AS avgdl FROM s),
           |$perQuery
           |$finals
           |""".stripMargin
      })
  }

  /** Within-doc self-repetition scrub, value-checked byte-for-byte: the
    * oracle mirrors the keep-first window-hash arithmetic per doc. */
  private val selfRepeatScrub: Q = Q(
    fn = (s, dir) => graft.text.TextOps.scrubSelfRepeats(docs(s, dir), k = 8),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i,
        |    md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
        |  FROM base, unnest(generate_series(1, len(toks) - 7)) AS u(i)
        |  WHERE len(toks) >= 8),
        |dup AS (SELECT doc_id, h, min(i) AS mi FROM w
        |        GROUP BY doc_id, h HAVING count(*) > 1),
        |cov AS (SELECT w.doc_id, list_sort(list(w.i)) AS starts
        |        FROM w JOIN dup
        |          ON w.doc_id = dup.doc_id AND w.h = dup.h AND w.i > dup.mi
        |        GROUP BY w.doc_id),
        |r AS (
        |  SELECT b.doc_id, b.toks,
        |    list_filter(generate_series(1, len(b.toks)),
        |      j -> len(list_filter(coalesce(c.starts, []),
        |             i -> i <= j AND j < i + 8)) = 0) AS kept
        |  FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  len(toks) - len(kept) AS n_removed,
        |  coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '),
        |    '') AS scrubbed_text
        |FROM r
        |""".stripMargin))

  /** Sorted-layout contract: compact + range-sorted write preserves the
    * corpus (count value-checked), lands the expected part count, and
    * produces PAIRWISE-DISJOINT per-file key ranges — the property that
    * makes parquet row-group stats selective (the measured skipping
    * proof lives in LayoutSpec's recordsRead test). */
  private val sortedLayoutQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val tmp = s"/tmp/graft_layout_${java.util.UUID.randomUUID()}"
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
      graft.sources.Layout.sortedWrite(d, tmp, "n_chars", nParts = 4)
      val files = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getPath).sorted
      val ranges = files.map { f =>
        val r = s.read.parquet(f)
          .agg(min("n_chars"), max("n_chars"), count(lit(1))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val n = ranges.map(_._3).sum
      // ranges sorted by min must not overlap (empty files impossible
      // with 4 range partitions over 500 docs)
      val sortedR = ranges.sortBy(_._1)
      val disjoint = sortedR.zip(sortedR.drop(1))
        .forall { case ((_, hi, _), (lo, _, _)) => hi <= lo }
      Seq(
        ("files_expected", if (files.length == 4) 1 else 0, n),
        ("ranges_disjoint", if (disjoint) 1 else 0, n))
        .toDF("contract", "ok", "n")
    },
    oracle = Some(
      """SELECT 'files_expected' AS contract, 1 AS ok, count(*) AS n
        |FROM documents
        |UNION ALL SELECT 'ranges_disjoint', 1, count(*) FROM documents
        |""".stripMargin))

  /** Fuzzy join value check over customer names (an id-like namespace
    * dense in single-substitution neighbors — the entity-resolution
    * setting): EVERY edit-distance-1 pair must match the oracle's exact
    * levenshtein cross join over the same term set, verifying the
    * SymSpell banding's completeness pair-for-pair (tens of thousands
    * of pairs at sf0.01). */
  private val fuzzyJoinQ: Q = Q(
    fn = (s, dir) => {
      val terms = Tables.load(s, dir, "customer")
        .select(col("c_name").as("t")).distinct()
      graft.text.Fuzzy.editDistance1Pairs(terms)
    },
    oracle = Some(
      """WITH tok AS (SELECT DISTINCT c_name AS t FROM customer)
        |SELECT a.t AS a, b.t AS b
        |FROM tok a JOIN tok b ON a.t < b.t AND levenshtein(a.t, b.t) <= 1
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_pq"             -> pqQ,
    "q_ivfadc"         -> ivfadcQ,
    "q_hard_negatives" -> hardNegativesQ,
    "q_self_repeat_scrub" -> selfRepeatScrub,
    "q_sorted_layout"  -> sortedLayoutQ,
    "q_fuzzy_join"     -> fuzzyJoinQ,
    "q_stream_topk"    -> streamTopK,
    "q_orc_roundtrip"  -> orcRoundtrip,
    "q_sample_group_k" -> sampleGroupK,
    "q_embed_pool"     -> embedPool,
    "q_mmr_rerank"     -> mmrRerank,
    "q_calibration"    -> calibration,
    "q_stream_stats"   -> streamStats,
    "q_topmass_by_source" -> topMassBySource,
    "q_heavy_hitters"  -> heavyHitters,
  )
}
