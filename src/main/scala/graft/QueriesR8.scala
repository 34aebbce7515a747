package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** Round-8 additions: sparse (BM25) retrieval, overlapping RAG chunking,
  * and the stream-stream interval join. */
object QueriesR8 {
  import QueryUtil.docs

  // ---- BM25 keyword retrieval (contamination screens, eval harnesses) ------

  /** Whole-result value check: rank/doc/score of the top-20 BM25 hits for
    * a 3-term query. Scoring is the SAME formulation as q_bm25
    * (TextOps.bm25 — the oracle clones its expression tree); the ranking
    * runs on the round-6 scores with doc_id tie-break, deterministic in
    * both engines. */
  private val bm25: Q = {
    val terms = Seq("slow", "merge", "window")
    val k = 20
    Q(
      fn = (s, dir) => Retrieval.bm25TopK(docs(s, dir), terms, k),
      oracle = Some {
        val dfCols = terms.zipWithIndex.map { case (t, i) =>
          s"    sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 " +
            s"END)::BIGINT AS df_$i"
        }.mkString(",\n")
        val tfCols = terms.zipWithIndex.map { case (t, i) =>
          s"    len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$i"
        }.mkString(",\n")
        val scoreTerms = terms.indices.map { i =>
          s"""ln((n - df_$i + 0.5::DOUBLE) / (df_$i + 0.5::DOUBLE) + 1.0)
             |      * (tf_$i * (1.2 + 1.0))
             |      / (tf_$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"""
            .stripMargin
        }.mkString("\n    + ")
        s"""WITH base AS (
           |  SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '), t -> t <> '')
           |      AS toks
           |  FROM documents),
           |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM base),
           |s AS (
           |  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl,
           |$dfCols
           |  FROM d),
           |c AS (SELECT *, sumdl::DOUBLE / n AS avgdl FROM s),
           |t AS (
           |  SELECT doc_id, dl,
           |$tfCols
           |  FROM d),
           |sc AS (
           |  SELECT doc_id,
           |    round($scoreTerms, 6) AS score
           |  FROM t, c),
           |r AS (SELECT doc_id, score,
           |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |      FROM sc)
           |SELECT rank::INT AS rank, doc_id, score
           |FROM r WHERE rank <= $k
           |""".stripMargin
      })
  }

  // ---- sliding-window chunking with overlap (RAG / embedding prep) ---------

  /** Every chunk's span value-checked: window 256, stride 128 (a power of
    * two so the ceil division is exact IEEE in both engines). */
  private val slidingChunksQ: Q = Q(
    fn = (s, dir) => Retrieval.slidingChunks(
      docs(s, dir).select(col("doc_id"), col("text")),
      size(filter(split(col("text"), " "), t => t =!= "")),
      window = 256, stride = 128),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |      AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |    unnest(generate_series(0,
        |      CASE WHEN n <= 256 THEN 0::BIGINT
        |           ELSE ceil((n - 256) / 128.0)::BIGINT END)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, chunk_idx, chunk_idx * 128 AS start_tok,
        |  least(chunk_idx * 128 + 256, n) AS end_tok,
        |  least(chunk_idx * 128 + 256, n) - chunk_idx * 128 AS chunk_tokens
        |FROM c
        |""".stripMargin))

  // ---- BPE tokenizer training (subword vocabulary from the corpus) ---------

  /** The merge loop is driver math over the bounded word-frequency table
    * (deterministic but not SQL-expressible), so this is a contract query
    * like the k-means/IVF family: merge-table size, well-formedness
    * (every fusion built from chars or earlier fusions), full corpus
    * coverage of the encoding pass, and genuine compression (chars >
    * BPE tokens ≥ words). The exact merge sequence is value-checked by
    * the hand-computed spec instead. */
  private val bpeQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val merges = graft.text.Bpe.train(
        graft.text.Bpe.wordFreq(d, maxVocab = 20000), numMerges = 200)
      val known = scala.collection.mutable.HashSet.empty[String]
      var wellFormed = true
      merges.foreach { case (l, r) =>
        def ok(s0: String) = s0.length == 1 || known.contains(s0)
        if (!ok(l) || !ok(r)) wellFormed = false
        known += (l + r)
      }
      val c = graft.text.Bpe.tokenCounts(d, merges).agg(
        count(lit(1)).as("docs"), sum("n_chars").as("ch"),
        sum("n_bpe_tokens").as("bpe"), sum("n_words").as("w")).head()
      val nDocs = d.count()
      // "full" = the requested budget, OR training ran out of pairs —
      // legitimate on a small vocabulary, detectable as every trained
      // word encoding to ONE symbol under the final merge table
      val rank = merges.zipWithIndex.toMap
      val exhausted = graft.text.Bpe.wordFreq(d, maxVocab = 20000)
        .forall { case (w, _) => graft.text.Bpe.encode(w, rank).length == 1 }
      Seq(
        ("merge_table_full", if (merges.size == 200 || exhausted) 1 else 0),
        ("well_formed", if (wellFormed) 1 else 0),
        ("full_coverage", if (c.getLong(0) == nDocs) 1 else 0),
        ("compresses",
          if (c.getLong(2) < c.getLong(1) && c.getLong(2) >= c.getLong(3)) 1
          else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'merge_table_full' AS contract, 1 AS ok
        |UNION ALL SELECT 'well_formed', 1
        |UNION ALL SELECT 'full_coverage', 1
        |UNION ALL SELECT 'compresses', 1
        |""".stripMargin))

  /** Tokenizer fertility by source (BPE tokens per word — the data-card
    * metric that catches a tokenizer mismatching a corpus slice). The
    * merge table isn't SQL-derivable, so the value side is the contract
    * family: fertility ≥ 1 everywhere, compression < chars/word, and the
    * per-source row set value-checks against the corpus' source list. */
  private val bpeFertilityQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val merges = graft.text.Bpe.train(
        graft.text.Bpe.wordFreq(d, maxVocab = 20000), numMerges = 200)
      val bySrc = graft.text.Bpe.tokenCounts(d, merges)
        .join(d.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("t"),
          sum("n_chars").as("ch"))
        .collect()
      bySrc.map { r =>
        val (src, w, t, ch) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        (src, if (t >= w) 1 else 0, if (t <= ch) 1 else 0)
      }.toSeq.toDF("source", "fertility_ge_1", "tokens_le_chars")
    },
    oracle = Some(
      """SELECT source, 1 AS fertility_ge_1, 1 AS tokens_le_chars
        |FROM documents GROUP BY source
        |""".stripMargin))

  // ---- incremental catalog merge (distributive stats, frozen bins) ---------

  /** Split lineitem by orderkey parity, profile each half against the
    * WHOLE table's frozen boundaries, merge — counts and bin metrics must
    * equal the whole-table profile EXACTLY (integer counts → KS/IV/WoE
    * are functions of them), pooled moments to FP tolerance. This is the
    * incremental path a daily 100 TB ingest takes instead of
    * re-profiling the corpus. */
  private val statsMergeQ: Q = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    Q(
      fn = (s, dir) => {
        import s.implicits._
        // this contract query re-scans lineitem ~13x (whole + two half
        // profiles x numeric+categorical, three HLL sketches, the exact
        // distinct dual) — cache the narrow projection once; every
        // profile/sketch below is EAGER (driver maps), so the unpersist
        // at the end cannot invalidate the returned local frame
        val li = QueryUtil.li(s, dir).select("l_orderkey", "l_quantity",
          "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
          .cache()
        try {
        val isPos = col("l_returnflag") === "R"
        // OVERLAP the independent job chains (guide §2.6, ops.Jobs):
        // phase A = whole-table profiles + sketches + the exact dual
        // (no cross-dependencies), phase B = the four half-profiles +
        // two half-sketches once A's frozen bounds/categories exist.
        // Purely driver-side scheduling — every value computed is
        // unchanged. Single-threaded wall was ~13 serial jobs; the A/B
        // probe measured 0.6x
        import graft.ops.Jobs.{fork, join}
        val fWhole = fork(graft.ops.StatsPipeline.profileNumeric(
          li, cols, isPos, full = true))
        val fCatWhole = fork(graft.ops.StatsPipeline.profileCategorical(
          li, Seq("l_linestatus"), isPos))
        val fSWhole = fork(graft.agg.Hll.sketch(li, "l_quantity"))
        val fExactD = fork(li.select("l_quantity").distinct().count())
        val whole = join(fWhole)
        val bounds: Map[String, Seq[Double]] =
          whole.map { case (c, p) => c -> (p.binning.binBoundary: Seq[Double]) }
        def half(cond: org.apache.spark.sql.Column) =
          graft.ops.StatsPipeline.profileNumeric(li.filter(cond), cols,
            isPos, full = true, boundsOverride = Some(bounds))
        val fEven = fork(half(col("l_orderkey") % 2 === 0))
        val fOdd = fork(half(col("l_orderkey") % 2 =!= 0))
        def close(x: Option[Double], y: Option[Double], tol: Double) =
          (x, y) match {
            case (Some(a), Some(b)) =>
              // overflowed moments are UNDEFINED on both sides — agreeing
              // on NaN/±Inf is agreement (|NaN−NaN| ≤ tol is false)
              a == b || (a.isNaN && b.isNaN) ||
                math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
            case (None, None) => true
            case _ => false
          }
        // categorical dual: frozen category list, same halves
        val cWholeAll = join(fCatWhole)
        val cFrozen: Map[String, Seq[String]] = cWholeAll.map {
          case (c, p) => c -> (p.binning.binCategory: Seq[String]) }
        def cHalf(cond: org.apache.spark.sql.Column) =
          graft.ops.StatsPipeline.profileCategorical(li.filter(cond),
            Seq("l_linestatus"), isPos,
            categoriesOverride = Some(cFrozen))("l_linestatus")
        val fCEven = fork(cHalf(col("l_orderkey") % 2 === 0))
        val fCOdd = fork(cHalf(col("l_orderkey") % 2 =!= 0))
        val cw = cWholeAll("l_linestatus")
        // distinct-count via the HLL sidecar twin (agg.Hll): a finalized
        // catalog's distinctCount does NOT merge, but persisted registers
        // do — contract: merged regs bit-equal the whole-table sketch,
        // and the recovered estimate is inside the HLL error bound
        val dcCol = "l_quantity"
        val fSEven = fork(graft.agg.Hll.sketch(
          li.filter(col("l_orderkey") % 2 === 0), dcCol))
        val fSOdd = fork(graft.agg.Hll.sketch(
          li.filter(col("l_orderkey") % 2 =!= 0), dcCol))
        // join phase B (all forked above; values identical to the
        // serial evaluation — only the scheduling overlaps)
        val (even, odd) = (join(fEven), join(fOdd))
        val cm = graft.ops.StatsMerge.merge(join(fCEven), join(fCOdd))
        val catContracts = Seq(
          ("cat_counts_exact",
            cm.stats.totalCount == cw.stats.totalCount &&
              cm.binning.binCountPos == cw.binning.binCountPos &&
              cm.binning.binCountNeg == cw.binning.binCountNeg),
          ("cat_metrics_exact",
            cm.stats.ks == cw.stats.ks && cm.stats.iv == cw.stats.iv &&
              cm.binning.binCountWoe == cw.binning.binCountWoe))
        val sWhole = join(fSWhole)
        val (withD, mergedRegs) = graft.agg.Hll.mergeWithSketches(
          even(dcCol), odd(dcCol), join(fSEven), join(fSOdd))
        // harness-only: exact-truth dual for the estimate contract
        val exactD = join(fExactD)
        val distinctContracts = Seq(
          ("distinct_regs_bitexact",
            java.util.Arrays.equals(mergedRegs, sWhole)),
          ("distinct_est_close", withD.stats.distinctCount.exists(e =>
            math.abs(e.toDouble / exactD - 1.0) <= 0.03)))
        (cols.flatMap { c =>
          val w = whole(c)
          val m = graft.ops.StatsMerge.merge(even(c), odd(c))
          Seq(
            (s"counts_exact_$c",
              m.stats.totalCount == w.stats.totalCount &&
                m.stats.missingCount == w.stats.missingCount &&
                m.binning.binCountPos == w.binning.binCountPos &&
                m.binning.binCountNeg == w.binning.binCountNeg),
            (s"metrics_exact_$c",
              m.stats.ks == w.stats.ks && m.stats.iv == w.stats.iv &&
                m.binning.binCountWoe == w.binning.binCountWoe),
            (s"moments_close_$c",
              close(m.stats.mean, w.stats.mean, 1e-9) &&
                close(m.stats.stdDev, w.stats.stdDev, 1e-9) &&
                close(m.stats.skewness, w.stats.skewness, 1e-6) &&
                close(m.stats.kurtosis, w.stats.kurtosis, 1e-6)),
            (s"minmax_exact_$c",
              m.stats.min == w.stats.min && m.stats.max == w.stats.max))
        } ++ catContracts ++ distinctContracts)
          .map { case (name, ok) => (name, if (ok) 1 else 0) }
          .toDF("contract", "ok")
        } finally { li.unpersist(false); () }
      },
      oracle = Some((cols.flatMap(c => Seq(
        s"counts_exact_$c", s"metrics_exact_$c", s"moments_close_$c",
        s"minmax_exact_$c")) ++ Seq("cat_counts_exact", "cat_metrics_exact",
        "distinct_regs_bitexact", "distinct_est_close"))
        .map(n => s"SELECT '$n' AS contract, 1 AS ok")
        .mkString("", "\nUNION ALL ", "\n")))
  }

  // ---- bucketed co-located join (pay the shuffle once, at write time) ------

  /** Values checked against the plain join oracle; the ZERO-exchange plan
    * property of the co-bucketed path is asserted in Round8OpsSpec under
    * no-broadcast (a value check can't see plan shape). */
  private val bucketedJoinQ: Q = Q(
    fn = (s, dir) => {
      // the two bucketed writes are independent jobs — overlap them
      // (guide §2.6, ops.Jobs); each write is byte-identical
      val fLi = graft.ops.Jobs.fork(graft.sources.Bucketed.writeBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        "graft_bkt_li", buckets = 8, keys = Seq("l_orderkey")))
      val fOrd = graft.ops.Jobs.fork(graft.sources.Bucketed.writeBucketed(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus")),
        "graft_bkt_ord", buckets = 8, keys = Seq("o_orderkey")))
      graft.ops.Jobs.join(fLi); graft.ops.Jobs.join(fOrd)
      graft.sources.Bucketed.join(s, "graft_bkt_li", "graft_bkt_ord",
          Seq("l_orderkey"), Seq("o_orderkey"))
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("sum_qty"))
    },
    oracle = Some(
      """SELECT o_orderstatus, l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |""".stripMargin))

  // ---- text canonicalization (crawl preprocessing) -------------------------

  /** Canonical text value-checked byte-for-byte: the oracle replays the
    * identical NFC → control-strip → collapse → trim → casefold chain
    * (DuckDB nfc_normalize ↔ java.text.Normalizer NFC). */
  private val textNormalizeQ: Q = Q(
    fn = (s, dir) => graft.text.TextOps.normalizeText(docs(s, dir))
      .select(col("doc_id"), col("text")),
    oracle = Some(
      """SELECT doc_id,
        |  lower(trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(nfc_normalize(text), '[\t\n\r]', ' ', 'g'),
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'),
        |    ' +', ' ', 'g'))) AS text
        |FROM documents
        |""".stripMargin))

  /** HTML strip value-checked byte-for-byte — same RE2 chain (script/
    * style subtrees, remaining tags, six entities with &amp; LAST,
    * whitespace collapse) in both engines. */
  private val htmlStripQ: Q = Q(
    fn = (s, dir) => graft.text.TextOps.stripHtml(docs(s, dir))
      .select(col("doc_id"), col("text")),
    oracle = Some {
      val steps: Seq[(String, String)] = Seq(
        "(?s)<(script|style)[^>]*>.*?</(script|style)>" -> "' '",
        "(?s)<[^>]*>" -> "' '",
        "&lt;" -> "'<'", "&gt;" -> "'>'", "&quot;" -> "'\"'",
        "&#39;" -> "CHR(39)", "&nbsp;" -> "' '", "&amp;" -> "'&'",
        "\\s+" -> "' '")
      val chain = steps.foldLeft("text") { case (inner, (pat, rep)) =>
        s"regexp_replace($inner, '$pat', $rep, 'g')"
      }
      s"""SELECT doc_id, trim($chain) AS text
         |FROM documents
         |""".stripMargin
    })

  // ---- stream-stream interval join -----------------------------------------

  /** The streaming join result must equal the batch range-join rollup over
    * the same ms-floored event times (inner join: purchases with zero
    * context events are absent on both sides). */
  private val streamSsJoin: Q = Q(
    fn = (s, dir) => graft.streaming.StreamOps.purchaseContextJoin(s, dir),
    oracle = Some(
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_ms(ts) AS p_ms
        |  FROM events WHERE event_type = 'purchase'
        |    AND ts IS NOT NULL),
        |c AS (
        |  SELECT user_id, epoch_ms(ts) AS c_ms
        |  FROM events WHERE event_type <> 'purchase'
        |    AND ts IS NOT NULL)
        |SELECT p_id, count(*)::BIGINT AS n_context
        |FROM p JOIN c USING (user_id)
        |WHERE c_ms >= p_ms - 1800000 AND c_ms <= p_ms
        |GROUP BY p_id
        |""".stripMargin))

  /** Sliding-window counts: every event lands in exactly two 1-hour
    * windows 30 minutes apart; the batch oracle re-derives both window
    * starts with integer ms arithmetic. */
  private val streamSliding: Q = Q(
    fn = (s, dir) => graft.streaming.StreamOps.slidingCounts(s, dir),
    oracle = Some(
      """WITH e AS (SELECT event_type, epoch_ms(ts) AS ms FROM events
      |  WHERE ts IS NOT NULL),
        |w AS (SELECT event_type,
        |        (ms // 1800000 - k) * 1800000 AS start_ms
        |      FROM e, (SELECT unnest(generate_series(0, 1)) AS k) ks)
        |SELECT strftime(make_timestamp(start_ms * 1000), '%Y-%m-%d %H:%M')
        |    AS win_start,
        |  event_type, count(*) AS n
        |FROM w GROUP BY 1, 2
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_stream_sliding" -> streamSliding,
    "q_bm25_topk"     -> bm25,
    "q_sliding_chunks" -> slidingChunksQ,
    "q_bpe"           -> bpeQ,
    "q_bpe_fertility" -> bpeFertilityQ,
    "q_bucketed_join" -> bucketedJoinQ,
    "q_stats_merge"   -> statsMergeQ,
    "q_text_normalize" -> textNormalizeQ,
    "q_html_strip"    -> htmlStripQ,
    "q_stream_ssjoin" -> streamSsJoin,
  )
}
