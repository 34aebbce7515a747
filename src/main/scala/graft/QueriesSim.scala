package graft

import graft.sim.Similarity

/** Similarity-search queries over the `embeddings` table. */
object QueriesSim {

  
  /** Zero vectors have no direction — their self-cosine is 0 by the
    * [[Similarity.cosine]] contract, so self-hit drills sample only
    * directed vectors (fuzz gate: edge-mode zero embeddings). */
  private val nonZeroVec = org.apache.spark.sql.functions.expr(
    "exists(embedding, x -> x <> cast(0.0 as double))")

  /** Shared DuckDB CTE: double-cast embeddings + norms, folds in list
    * order like the Spark `aggregate` higher-order function. */
  private val vCte =
    """v AS (SELECT vec_id,
      |  list_transform(embedding, x -> x::DOUBLE) AS e,
      |  sqrt(list_sum(list_transform(embedding,
      |       x -> x::DOUBLE * x::DOUBLE))) AS norm
      |FROM embeddings WHERE embedding IS NOT NULL)""".stripMargin

  private val cosineTopK: Q = Q(
    fn = (s, dir) => Similarity.cosineTopK(Tables.load(s, dir, "embeddings")),
    oracle = Some(
      s"""WITH $vCte,
         |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nb_id,
         |  CASE WHEN a.norm * b.norm > 0 THEN
         |    list_sum(list_transform(list_zip(a.e, b.e), pr -> pr[1] * pr[2]))
         |      / (a.norm * b.norm) ELSE 0.0 END AS cos
         |  FROM v a, v b WHERE a.vec_id <> b.vec_id),
         |r AS (SELECT vec_id, nb_id, cos,
         |  row_number() OVER (PARTITION BY vec_id
         |                     ORDER BY cos DESC, nb_id) AS rank
         |  FROM p)
         |SELECT vec_id, rank, nb_id, round(cos, 6) AS cos_r
         |FROM r WHERE rank <= 5
         |""".stripMargin))

  private val annLsh: Q = Q(
    fn = (s, dir) => Similarity.annTopK(Tables.load(s, dir, "embeddings")),
    oracle = Some {
      val nt = Similarity.NumTables
      val bt = Similarity.BitsPerTable
      val ps = Similarity.planes(nt * bt, 64)
      val tableSelects = (0 until nt).map { t =>
        val sigExpr = (0 until bt).map { b =>
          val lits = ps(t * bt + b).mkString("[", ", ", "]::DOUBLE[]")
          s"""CASE WHEN list_sum(list_transform(list_zip(e, $lits),
             |  pr -> pr[1] * pr[2])) >= 0 THEN ${1 << b} ELSE 0 END""".stripMargin
        }.mkString("\n + ")
        s"SELECT vec_id, $t AS tbl, ($sigExpr) AS sig FROM v"
      }.mkString("\nUNION ALL\n")
      s"""WITH $vCte,
         |sg AS (
         |$tableSelects),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nb_id
         |  FROM sg a JOIN sg b
         |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id <> b.vec_id),
         |p AS (SELECT c.vec_id, c.nb_id,
         |  CASE WHEN va.norm * vb.norm > 0 THEN
         |    list_sum(list_transform(list_zip(va.e, vb.e), pr -> pr[1] * pr[2]))
         |      / (va.norm * vb.norm) ELSE 0.0 END AS cos
         |  FROM cand c
         |  JOIN v va ON c.vec_id = va.vec_id
         |  JOIN v vb ON c.nb_id = vb.vec_id),
         |r AS (SELECT vec_id, nb_id, cos,
         |  row_number() OVER (PARTITION BY vec_id
         |                     ORDER BY cos DESC, nb_id) AS rank
         |  FROM p)
         |SELECT vec_id, rank, nb_id, round(cos, 6) AS cos_r
         |FROM r WHERE rank <= 3
         |""".stripMargin
    })

  /** IVF neighbor lists depend on the k-means quantizer (FP-summation-order
    * sensitive → no cross-engine value parity), but the search CONTRACT is
    * oracle-checkable: every emitted rank is in 1..k, ranks are dense and
    * cosine-sorted per query vector, no self-pairs, cosines bounded, and
    * the corpus size is cross-checked against `count(*)`. */
  private val annIvf: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.load(s, dir, "embeddings")
      val res = graft.sim.Ivf.ivfTopK(emb)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy("rank")
      val perVec = res
        .withColumn("prev_cos", lag("cos_r", 1).over(w))
        .withColumn("prev_rank", lag("rank", 1).over(w))
      val inv = perVec.agg(
        max(when(col("vec_id") === col("nb_id"), 1).otherwise(0))
          .as("self_pairs"),
        min(col("rank")).as("min_rank"), max(col("rank")).as("max_rank"),
        max(when(col("prev_rank").isNotNull &&
          col("prev_rank") =!= col("rank") - 1, 1).otherwise(0))
          .as("rank_gaps"),
        max(when(col("prev_cos") < col("cos_r"), 1).otherwise(0))
          .as("cos_unsorted"),
        max(when(abs(col("cos_r")) > 1.000001, 1).otherwise(0))
          .as("cos_oob")).head()
      // a tiny corpus can legitimately emit NO neighbor rows (every
      // vector alone in its cell under single-probe) — the aggregates
      // are then all NULL and the invariants are vacuously true
      val ok = inv.isNullAt(0) ||
        (inv.getInt(0) == 0 && inv.getInt(1) >= 1 &&
          inv.getInt(2) <= 3 && inv.getInt(3) == 0 && inv.getInt(4) == 0 &&
          inv.getInt(5) == 0)
      import s.implicits._
      Seq(((if (ok) 1 else 0), emb.count())).toDF("topk_ok", "n_emb")
    },
    oracle = Some(
      """SELECT 1 AS topk_ok, count(*) AS n_emb FROM embeddings
        |""".stripMargin))

  /** Embedding-cosine near-dup dedup: LSH candidates + exact-cosine
    * confirm at threshold 0.35 (the synthetic vectors are random — no
    * planted dups — so the threshold sits in the observable tail). */
  private val dedupEmbed: Q = Q(
    fn = (s, dir) =>
      Similarity.nearDupPairs(Tables.load(s, dir, "embeddings"), 0.35),
    oracle = Some {
      val nt = Similarity.NumTables
      val bt = Similarity.BitsPerTable
      val ps = Similarity.planes(nt * bt, 64)
      val tableSelects = (0 until nt).map { t =>
        val sigExpr = (0 until bt).map { b =>
          val lits = ps(t * bt + b).mkString("[", ", ", "]::DOUBLE[]")
          s"""CASE WHEN list_sum(list_transform(list_zip(e, $lits),
             |  pr -> pr[1] * pr[2])) >= 0 THEN ${1 << b} ELSE 0 END""".stripMargin
        }.mkString("\n + ")
        s"SELECT vec_id, $t AS tbl, ($sigExpr) AS sig FROM v"
      }.mkString("\nUNION ALL\n")
      s"""WITH $vCte,
         |sg AS (
         |$tableSelects),
         |cand AS (SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id
         |  FROM sg a JOIN sg b
         |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |p AS (SELECT c.keep_id, c.dup_id,
         |  CASE WHEN va.norm * vb.norm > 0 THEN
         |    list_sum(list_transform(list_zip(va.e, vb.e), pr -> pr[1] * pr[2]))
         |      / (va.norm * vb.norm) ELSE 0.0 END AS cos
         |  FROM cand c
         |  JOIN v va ON c.keep_id = va.vec_id
         |  JOIN v vb ON c.dup_id = vb.vec_id)
         |SELECT keep_id, dup_id, round(cos, 6) AS cos_r
         |FROM p WHERE cos >= 0.35
         |""".stripMargin
    })

  /** ANN quality contract, part 1: recall@3 of the LSH index against the
    * exact cosine top-3 ground truth, as ONE cross-engine number — the
    * hyperplanes are mirrored into SQL, so DuckDB recomputes the same
    * hit count. Emitted as integer numerator/denominator (bit-exact)
    * plus the rounded ratio, so the ANN family's QUALITY (not just its
    * output shape) is regression-guarded. */
  /** Shared oracle CTE block: LSH candidate ranking (`lr`: vec_id,
    * nb_id, rank) and exact cosine ranking (`er`) with the engine's own
    * hyperplanes mirrored into SQL — the replay both ANN-quality
    * oracles (recall, MRR/NDCG) rank against. */
  private def lshVsExactCtes: String = {
    val nt = Similarity.NumTables
    val bt = Similarity.BitsPerTable
    val ps = Similarity.planes(nt * bt, 64)
    val tableSelects = (0 until nt).map { t =>
      val sigExpr = (0 until bt).map { b =>
        val lits = ps(t * bt + b).mkString("[", ", ", "]::DOUBLE[]")
        s"""CASE WHEN list_sum(list_transform(list_zip(e, $lits),
           |  pr -> pr[1] * pr[2])) >= 0 THEN ${1 << b} ELSE 0 END""".stripMargin
      }.mkString("\n + ")
      s"SELECT vec_id, $t AS tbl, ($sigExpr) AS sig FROM v"
    }.mkString("\nUNION ALL\n")
    s"""$vCte,
       |sg AS (
       |$tableSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nb_id
       |  FROM sg a JOIN sg b
       |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id <> b.vec_id),
       |lp AS (SELECT c.vec_id, c.nb_id,
       |  CASE WHEN va.norm * vb.norm > 0 THEN
       |    list_sum(list_transform(list_zip(va.e, vb.e), pr -> pr[1] * pr[2]))
       |      / (va.norm * vb.norm) ELSE 0.0 END AS cos
       |  FROM cand c
       |  JOIN v va ON c.vec_id = va.vec_id
       |  JOIN v vb ON c.nb_id = vb.vec_id),
       |lr AS (SELECT vec_id, nb_id,
       |  row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY cos DESC, nb_id) AS rank
       |  FROM lp),
       |ep AS (SELECT a.vec_id AS vec_id, b.vec_id AS nb_id,
       |  CASE WHEN a.norm * b.norm > 0 THEN
       |    list_sum(list_transform(list_zip(a.e, b.e), pr -> pr[1] * pr[2]))
       |      / (a.norm * b.norm) ELSE 0.0 END AS cos
       |  FROM v a, v b WHERE a.vec_id <> b.vec_id),
       |er AS (SELECT vec_id, nb_id,
       |  row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY cos DESC, nb_id) AS rank
       |  FROM ep)""".stripMargin
  }

  private val annRecallLsh: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val exact = Similarity.cosineTopK(emb, k = 3)
        .select(col("vec_id"), col("nb_id"))
      val nHits = Similarity.annTopK(emb, k = 3)
        .select(col("vec_id"), col("nb_id"))
        .join(exact, Seq("vec_id", "nb_id"), "left_semi").count()
      val denom = 3L * emb.count()
      Seq(("lsh", nHits, denom)).toDF("method", "n_hits", "n_expected")
        .withColumn("recall_r",
          round(col("n_hits") / col("n_expected"), 6))
    },
    oracle = Some {
      s"""WITH $lshVsExactCtes,
         |h AS (SELECT count(*)::BIGINT AS n_hits
         |  FROM (SELECT vec_id, nb_id FROM lr WHERE rank <= 3) l
         |  JOIN (SELECT vec_id, nb_id FROM er WHERE rank <= 3) x
         |    USING (vec_id, nb_id)),
         |d AS (SELECT 3 * count(*)::BIGINT AS n_expected FROM embeddings)
         |SELECT 'lsh' AS method, n_hits, n_expected,
         |  round(n_hits / n_expected, 6) AS recall_r
         |FROM h, d
         |""".stripMargin
    })

  /** Recall of the PRODUCTION auto-geometry path
    * ([[graft.sim.Similarity.annTopKAuto]]) — signature width sized by
    * `bitsFor(n)` from a corpus count, where [[annRecallLsh]] pins the
    * 6-bit contract geometry. VALUE-checked, not floor-checked: the
    * oracle recomputes the geometry formula max(6, ceil(log2(n/32)))
    * from its own count(*) and replays the recall with the shared CTE
    * block — valid because at the gate's corpus size bitsFor(n) lands
    * on the 6-bit floor the CTEs mirror (the fn REQUIREs that premise,
    * so a testdata resize fails loudly instead of value-drifting).
    * Geometry growth past the floor is SimScaleSpec's and the 10×/100×
    * soaks' territory — SQL can't replay variable-width hyperplanes. */
  private val annRecallAuto: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val n = emb.count()
      val bits = Similarity.bitsFor(n)
      require(bits == Similarity.BitsPerTable,
        s"q_ann_recall_auto oracle premise broken: bitsFor($n) = $bits " +
          s"no longer equals the ${Similarity.BitsPerTable}-bit CTE replay")
      val exact = Similarity.cosineTopK(emb, k = 3)
        .select(col("vec_id"), col("nb_id"))
      val nHits = Similarity.annTopKAuto(emb, k = 3)
        .select(col("vec_id"), col("nb_id"))
        .join(exact, Seq("vec_id", "nb_id"), "left_semi").count()
      Seq(("auto", bits, nHits, 3L * n))
        .toDF("method", "bits", "n_hits", "n_expected")
        .withColumn("recall_r",
          round(col("n_hits") / col("n_expected"), 6))
    },
    oracle = Some {
      s"""WITH $lshVsExactCtes,
         |h AS (SELECT count(*)::BIGINT AS n_hits
         |  FROM (SELECT vec_id, nb_id FROM lr WHERE rank <= 3) l
         |  JOIN (SELECT vec_id, nb_id FROM er WHERE rank <= 3) x
         |    USING (vec_id, nb_id)),
         |d AS (SELECT greatest(6, ceil(log2(count(*) / 32.0))::INT) AS bits,
         |             3 * count(*)::BIGINT AS n_expected FROM embeddings)
         |SELECT 'auto' AS method, bits, n_hits, n_expected,
         |  round(n_hits / n_expected, 6) AS recall_r
         |FROM h, d
         |""".stripMargin
    })

  /** Ranking-quality dual of the recall contract: MRR@3 and NDCG@3 of
    * the LSH ranking against the exact-cosine top-3 relevance set
    * ([[graft.eval.RetrievalEval.mrrNdcg]]). Recall counts WHETHER truth
    * was found; these score WHERE it landed. The oracle replays both
    * rankings (shared CTE block) and the textbook metric arithmetic in
    * the identical operation order. */
  private val mrrNdcgQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.load(s, dir, "embeddings")
      val truth = Similarity.cosineTopK(emb, k = 3)
        .select(col("vec_id"), col("nb_id"))
      val ranked = Similarity.annTopK(emb, k = 3)
        .select(col("vec_id"), col("rank"), col("nb_id"))
      graft.eval.RetrievalEval.mrrNdcg(ranked, truth, k = 3, "lsh")
    },
    oracle = Some {
      // IDCG@3 written as the same three-term sum the Scala fold builds
      val idcgSql = "(1.0::DOUBLE / log2(2.0) + 1.0::DOUBLE / log2(3.0)" +
        " + 1.0::DOUBLE / log2(4.0))"
      s"""WITH $lshVsExactCtes,
         |hits AS (SELECT l.vec_id,
         |    1.0::DOUBLE / min(l.rank) AS rr,
         |    list_sum(list_transform(array_agg(l.rank),
         |      r -> 1.0::DOUBLE / log2(r + 1.0))) / $idcgSql AS ndcg
         |  FROM (SELECT vec_id, nb_id, rank FROM lr WHERE rank <= 3) l
         |  JOIN (SELECT vec_id, nb_id FROM er WHERE rank <= 3) x
         |    USING (vec_id, nb_id)
         |  GROUP BY l.vec_id),
         |q AS (SELECT DISTINCT vec_id FROM er WHERE rank <= 3)
         |SELECT 'lsh' AS method, count(*)::BIGINT AS n_queries,
         |  round(avg(coalesce(rr, 0.0)), 6) AS mrr_r,
         |  round(avg(coalesce(ndcg, 0.0)), 6) AS ndcg_r
         |FROM q LEFT JOIN hits USING (vec_id)
         |""".stripMargin
    })

  /** ANN quality contract, part 2: IVF recall@3 at nProbe=1 vs nProbe=4
    * against the exact ground truth. The k-means quantizer is
    * FP-summation-order sensitive (no cross-engine value parity), so —
    * like q_ann_ivf — the CONTRACT is flattened to booleans: each recall
    * in [0,1], and multi-probe ≥ single-probe (more probes only grow the
    * candidate set, and a grown candidate set can only move the scored
    * top-k closer to the exact top-k). */
  private val annRecallIvf: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      // cache the O(n²) ground truth: it feeds TWO recall counts, and
      // recomputing the brute-force pass per count doubles the dominant
      // cost of the whole query
      val exact = Similarity.cosineTopK(emb, k = 3)
        .select(col("vec_id"), col("nb_id")).cache()
      try {
        val denom = 3.0 * emb.count()
        def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
          approx.select(col("vec_id"), col("nb_id"))
            .join(exact, Seq("vec_id", "nb_id"), "left_semi").count() / denom
        // the two probe settings are independent job chains over the
        // cached ground truth — overlap them (guide §2.6, ops.Jobs);
        // each recall value is computed exactly as before
        import graft.ops.Jobs.{fork, join}
        val fR1 = fork(recallOf(graft.sim.Ivf.ivfTopK(emb, k = 3, nProbe = 1)))
        val fR4 = fork(recallOf(graft.sim.Ivf.ivfTopK(emb, k = 3, nProbe = 4)))
        val (r1, r4) = (join(fR1), join(fR4))
        Seq(
          ("ivf_probe1", if (r1 >= 0.0 && r1 <= 1.0) 1 else 0),
          ("ivf_probe4", if (r4 >= r1 && r4 <= 1.0) 1 else 0)
        ).toDF("method", "contract_ok")
      } finally exact.unpersist(false)
    },
    oracle = Some(
      """SELECT 'ivf_probe1' AS method, 1 AS contract_ok
        |UNION ALL
        |SELECT 'ivf_probe4' AS method, 1 AS contract_ok
        |""".stripMargin))

  /** Binary (sign) quantization: 64 dims pack into ONE BIGINT. No
    * trained codebook → codes are engine-exact; the oracle rebuilds the
    * two's-complement packing bit by bit (bit 63 via the min-long
    * weight, the SimHash/aHash trick). */
  private val embedBinary: Q = Q(
    fn = (s, dir) => graft.sim.Quantize.binarize(
        Tables.load(s, dir, "embeddings"), dims = 64)
      // 64 dims pack into exactly one word — emit it as a scalar BIGINT
      // (array cells are unhashable in the driver's pandas sort)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("code"), 1).as("code")),
    oracle = Some(
      """SELECT vec_id,
        |  CAST(sum(CASE WHEN embedding[d] >= 0 THEN
        |     CASE WHEN d = 64 THEN -9223372036854775807 - 1
        |          ELSE (1::BIGINT << (d - 1)) END
        |     ELSE 0 END) AS BIGINT) AS code
        |FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        |GROUP BY vec_id
        |""".stripMargin))

  /** Hamming-metric ANN over the binary codes — the first ANN query
    * whose WHOLE RESULT is value-checked (no trained quantizer, ties
    * broken by nb_id): top-3 by (dist asc, nb_id asc) per vector. The
    * oracle scores sign-bit disagreements directly — the same number
    * the engine gets from bit_count(xor) on the packed words. */
  private val annHamming: Q = Q(
    fn = (s, dir) => graft.sim.Quantize.hammingTopK(
      Tables.load(s, dir, "embeddings"), dims = 64, k = 3),
    oracle = Some(
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |p AS (
        |  SELECT a.vec_id, b.vec_id AS nb_id,
        |    len(list_filter(list_zip(a.bits, b.bits),
        |      z -> z[1] != z[2]))::BIGINT AS dist
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, nb_id, dist,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, nb_id) AS rank
        |  FROM p)
        |SELECT vec_id, rank::INT AS rank, nb_id, dist
        |FROM r WHERE rank <= 3
        |""".stripMargin))

  /** SemDeDup contract (the quantizer is FP-order sensitive → boolean
    * contract, like the IVF queries): (1) every pruned id participates
    * in at least one EXACT cosine-threshold duplicate pair (within-cell
    * pairs are a subset of the global pair set, and transitive closure
    * never invents members); (2) the keeper rule is the cluster minimum,
    * so keep_id < vec_id on every row; (3) no keeper is itself pruned;
    * (4) the cut is non-trivial on this corpus (threshold sits in the
    * tail, so some cells contain genuine near-dups). */
  private val semDedup: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val pruned = graft.sim.SemDedup.prune(emb, threshold = 0.35).cache()
      try {
        val v = Similarity.prep(emb)
        // harness-only exact-truth dual — respread before the n² NLJ
        // (stream-side splits bound its parallelism; see cosineTopK),
        // but GATED on input size: under ~2 MB of vectors the n² pass
        // fits one task cheaper than the respread shuffle + 32-task
        // overhead it buys (measured: sf0.1 3.4 s single-split vs
        // 5.5 s respread; the 10× soak needs the respread)
        val vr =
          if (emb.queryExecution.optimizedPlan.stats.sizeInBytes >
              BigInt(2L << 20))
            v.repartition(s.sparkContext.defaultParallelism)
          else v
        val a = vr.select(col("vec_id"), col("e").as("ea"),
          col("norm").as("na"))
        val b = v.select(col("vec_id").as("nb_id"), col("e").as("eb"),
          col("norm").as("nb"))
        val exactIds = a.join(b, col("vec_id") < col("nb_id"))
          .withColumn("cos", Similarity.cosine(
            graft.expr.DotProduct.dot(col("ea"), col("eb")),
            col("na"), col("nb")))
          .filter(col("cos") >= 0.35)
          .select(explode(array(col("vec_id"), col("nb_id"))).as("vec_id"))
          .distinct()
        val outside = pruned.select("vec_id")
          .join(exactIds, Seq("vec_id"), "left_anti").count()
        val keeperOrder = pruned.filter(col("keep_id") >= col("vec_id")).count()
        val keeperPruned = pruned.select(col("keep_id").as("vec_id"))
          .join(pruned.select("vec_id"), Seq("vec_id"), "left_semi").count()
        val nPruned = pruned.count()
        Seq(
          ("pruned_subset_of_exact", if (outside == 0L) 1 else 0),
          ("keeper_is_cluster_min", if (keeperOrder == 0L) 1 else 0),
          ("keepers_never_pruned", if (keeperPruned == 0L) 1 else 0),
          ("cut_non_trivial",
            if (nPruned > 0L || emb.count() < 64) 1 else 0))
          .toDF("contract", "ok")
      } finally pruned.unpersist(false)
    },
    oracle = Some(
      """SELECT 'pruned_subset_of_exact' AS contract, 1 AS ok
        |UNION ALL SELECT 'keeper_is_cluster_min', 1
        |UNION ALL SELECT 'keepers_never_pruned', 1
        |UNION ALL SELECT 'cut_non_trivial', 1
        |""".stripMargin))

  /** Scalar int8 quantization (faiss SQ8-style): per-dim min/max trains
    * the quantizer (one tiny agg), coding is a zero-shuffle narrow map.
    * All arithmetic fixed-order IEEE double with a floor bucket cut, so
    * every code is engine-exact — the 4×-memory ANN path is value-checked,
    * not just shape-checked. */
  private val embedQuantize: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.load(s, dir, "embeddings")
      val (lo, hi) = graft.sim.Quantize.ranges(emb, 64)
      graft.sim.Quantize.quantizeInt8(emb, lo, hi)
        .select(col("vec_id"),
          posexplode(col("codes")).as(Seq("dim", "q")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("q"))
    },
    oracle = Some(
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |x AS (SELECT vec_id, d.dim AS dim, e[d.dim + 1] AS val
        |      FROM v, (SELECT unnest(generate_series(0, 63)) AS dim) d),
        |r AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM x GROUP BY dim)
        |SELECT vec_id, x.dim AS dim,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE greatest(0, least(
        |         floor((val - lo) / (hi - lo) * 256)::BIGINT, 255)) END AS q
        |FROM x JOIN r USING (dim)
        |""".stripMargin))

  /** Upper-triangle sample covariance of the 64-dim embedding column —
    * the distributed heavy lift under [[graft.sim.Pca]] (the eigensolve
    * is bounded driver math, spec-verified). Every entry value-checked
    * against DuckDB covar_samp. */
  private val embedCov: Q = Q(
    fn = (s, dir) =>
      graft.sim.Pca.covariance(Tables.load(s, dir, "embeddings"), dims = 64),
    oracle = Some(
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |x AS (SELECT vec_id, i - 1 AS i, v[i] AS val
        |      FROM e, unnest(generate_series(1, 64)) u(i))
        |SELECT a.i AS i, b.i AS j,
        |  round(covar_samp(a.val, b.val), 6) + 0 AS cov
        |FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY a.i, b.i
        |""".stripMargin))

  /** Streaming ANN index ingest contract
    * ([[graft.streaming.AnnIngest]]): embeddings arrive in 4
    * deterministic micro-batches (batch = vec_id % 4), each folded into
    * the persisted cell-partitioned IVF index (frozen first-batch
    * quantizer, compaction mid-stream after batches 1 and 3 via
    * compactEvery = 2, the second folding two size-tiered runs into
    * one). Quantizer
    * training is FP-order sensitive → boolean contracts, like the other
    * IVF queries: (1) every vector indexed exactly once; (2) every
    * indexed cell equals the argmin recompute under the frozen
    * centroids; (3) top-1 self-query returns the vector itself at
    * cos 1.0 THROUGH the compacted runs; (4) probe-4 recall@3 vs the
    * exact truth (the same index path probing every cell) clears a 0.3
    * floor — measured ~0.75 at sf0.1 and sf0.01, so the floor flags a
    * broken prune, not corpus luck. */
  private val streamAnnIngestQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, expr}
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = Tables.load(s, dir, "embeddings")
      val typed = emb.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x AS double))").as("embedding"))
      // harness-only: batch staging for MemoryStream — ONE collect,
      // partitioned driver-side (4 filtered collects = 4 scans)
      val staged = typed.as[(Long, Seq[Double])].collect()
      val batches = (0 to 3).map(b => staged.filter(_._1 % 4 == b).toSeq)
      val tmp = s"/tmp/graft_sai_${java.util.UUID.randomUUID()}"
      val ms = MemoryStream[(Long, Seq[Double])]
      // compactEvery = 2 compacts MID-stream (after batches 1 and 3):
      // batches 2–3 ingest against a compacted-run + delta mix, and the
      // second compaction exercises the size-tiered run merge, so the
      // queries below certify the whole leveled-LSM read path
      val q = graft.streaming.AnnIngest.annIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), s"$tmp/index",
        checkpoint = Some(s"$tmp/ckpt"), nCells = 8, compactEvery = 2)
      try {
        batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      } finally q.stop()
      val n = typed.count()
      val idx = graft.streaming.AnnIngest
        .readIndex(s, s"$tmp/index", None)
        .select("vec_id", "cell").persist()
      val cents = graft.streaming.AnnIngest
        .readCentroids(s, s"$tmp/index").get
      val expect = graft.sim.Ivf.assignCells(
        Similarity.prep(typed.toDF("vec_id", "embedding")), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      val mismatches = idx.join(expect, Seq("vec_id"))
        .filter(col("cell") =!= col("cell_x")).count()
      val indexedOnce = idx.count() == n &&
        idx.select("vec_id").distinct().count() == n
      // query contracts run on a deterministic sample (1 in 5): the
      // full corpus is already covered row-for-row by cells_argmin, and
      // batch-IVF probe monotonicity has its own standing contract
      // (q_ann_recall_ivf) — this query certifies the INDEX path:
      // ingest → compacted pruned read → top-k
      val sample = typed.filter(col("vec_id") % 5 === 0)
        .toDF("vec_id", "embedding").filter(nonZeroVec)
      val self = graft.streaming.AnnIngest.queryTopK(s, s"$tmp/index",
          sample, k = 1, nProbe = 1)
        .filter(col("cos_r") < 1.0)
        .count()
      // recall@3 of probe-4 vs exact truth, where the truth is the SAME
      // index path probing every cell (nProbe = nCells scores the full
      // corpus — brute force through the pruned reader, no n² pass)
      def top3NonSelf(nProbe: Int) =
        graft.streaming.AnnIngest.queryTopK(s, s"$tmp/index", sample,
            k = 4, nProbe = nProbe)
          .filter(col("vec_id") =!= col("nb_id"))
          .withColumn("r2", org.apache.spark.sql.functions.row_number()
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy("vec_id")
              .orderBy(col("rank"))))
          .filter(col("r2") <= 3)
          .select("vec_id", "nb_id")
      val exact = top3NonSelf(8).persist()
      val r4 = top3NonSelf(4)
        .join(exact, Seq("vec_id", "nb_id"), "left_semi")
        .count().toDouble / exact.count()
      idx.unpersist(false); exact.unpersist(false)
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      Seq(
        ("indexed_once", if (indexedOnce) 1 else 0),
        ("cells_argmin", if (mismatches == 0L) 1 else 0),
        ("self_hit", if (self == 0L) 1 else 0),
        ("probe4_recall_floor",
          if (r4 >= 0.3 && r4 <= 1.0) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'indexed_once' AS contract, 1 AS ok
        |UNION ALL SELECT 'cells_argmin', 1
        |UNION ALL SELECT 'self_hit', 1
        |UNION ALL SELECT 'probe4_recall_floor', 1
        |""".stripMargin))

  /** Retrain-at-compaction contract ([[graft.streaming.AnnIngest]]
    * `retrainOnCompact`): embeddings stream in 4 batches with the
    * SECOND HALF shifted far from the first (vec_id-keyed offset — the
    * distribution drift a frozen quantizer cannot follow), compaction
    * retrains the quantizer on the actual corpus and commits the
    * reassigned index + new centroids in one manifest swap. Contracts:
    * (1) manifest points at a retrained `centroids_v*` quantizer;
    * (2) every indexed cell equals the argmin recompute under THE
    * MANIFEST quantizer (atomic flip — no row left under old cells);
    * (3) every vector indexed exactly once through the rebuild;
    * (4) the skew telemetry file exists for the last compaction;
    * (5) top-1 self-query at cos 1.0 through the retrained index. */
  private val annIngestRetrainQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, expr, when}
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = Tables.load(s, dir, "embeddings")
      // second half of the id space shifts by +8 in every dimension —
      // far outside the first-half ball, so the first-batch quantizer
      // would pile it into few cells (what retrain exists to fix)
      val n = emb.filter(col("embedding").isNotNull).count()
      val typed = emb.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x AS double))").as("e0"))
        .withColumn("embedding", expr(
          s"CASE WHEN vec_id >= ${n / 2} " +
            "THEN transform(e0, x -> x + 8.0d) ELSE e0 END"))
        .select("vec_id", "embedding")
      // harness-only: batch staging for MemoryStream — ONE collect
      val staged = typed.as[(Long, Seq[Double])].collect()
      val batches = (0 to 3).map(b => staged.filter(_._1 % 4 == b).toSeq)
      val tmp = s"/tmp/graft_sar_${java.util.UUID.randomUUID()}"
      val ms = MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.AnnIngest.annIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), s"$tmp/index",
        checkpoint = Some(s"$tmp/ckpt"), nCells = 8, compactEvery = 2,
        retrainOnCompact = true)
      try {
        batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      } finally q.stop()
      val retrained = graft.streaming.AnnIngest
        .quantizerName(s, s"$tmp/index")
        .exists(_.startsWith("centroids_v"))
      val cents = graft.streaming.AnnIngest
        .readCentroids(s, s"$tmp/index").get
      val idx = graft.streaming.AnnIngest
        .readIndex(s, s"$tmp/index", None).persist()
      val expect = graft.sim.Ivf.assignCells(
        idx.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      val mismatches = idx.join(expect, Seq("vec_id"))
        .filter(col("cell") =!= col("cell_x")).count()
      val indexedOnce = idx.count() == n &&
        idx.select("vec_id").distinct().count() == n
      val skewFile = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$tmp/index/skew_v3.json"))
      val sample = typed.filter(col("vec_id") % 7 === 0)
        .filter(nonZeroVec)
        .toDF("vec_id", "embedding")
      val self = graft.streaming.AnnIngest.queryTopK(s, s"$tmp/index",
          sample, k = 1, nProbe = 1)
        .filter(col("cos_r") < 1.0)
        .count()
      idx.unpersist(false)
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      Seq(
        ("retrained_quantizer", if (retrained) 1 else 0),
        ("cells_match_manifest_quantizer", if (mismatches == 0L) 1 else 0),
        ("indexed_once", if (indexedOnce) 1 else 0),
        ("skew_report_written", if (skewFile) 1 else 0),
        ("self_hit", if (self == 0L) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'retrained_quantizer' AS contract, 1 AS ok
        |UNION ALL SELECT 'cells_match_manifest_quantizer', 1
        |UNION ALL SELECT 'indexed_once', 1
        |UNION ALL SELECT 'skew_report_written', 1
        |UNION ALL SELECT 'self_hit', 1
        |""".stripMargin))

  /** Split-cell LOCAL retrain contract ([[graft.streaming.AnnIngest]]
    * `compact(splitHot)` — the affordable self-heal): four batches
    * stream in with ONE (ids ≡ 2 mod 4) shifted far outside the rest,
    * so the frozen 8-cell quantizer piles ~25% of the corpus into one
    * hot cell; the drained index folds to a single run. An explicit
    * split compaction then heals LOCALLY — the hot cell re-clusters
    * into appended sub-centroids, movers are rewritten into a
    * relocation run, stale copies are excluded by a cell-scoped
    * tombstone, all committed in one manifest swap. (The auto-trigger
    * wiring, `splitSkewAbove`, is spec-covered — this oracle pins the
    * deterministic heal itself.) Contracts: (1) the manifest points at
    * an EXTENDED quantizer (more cells than the frozen 8 — appended,
    * not rebuilt); (2) the pre-split run SURVIVES by name (the rewrite
    * was local, not a full rebuild); (3) the cell-scoped split
    * tombstone is recorded; (4) every live row sits in its argmin cell
    * under the committed quantizer; (5) every vector is live exactly
    * once (stale old-cell copies excluded); (6) top-1 self-query at
    * cos 1.0 through the healed index. */
  private val annSplitQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, expr}
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = Tables.load(s, dir, "embeddings")
      val typed = emb.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x AS double))").as("e0"))
        .withColumn("embedding", expr(
          "CASE WHEN vec_id % 4 = 2 " +
            "THEN transform(e0, x -> x + 8.0d) ELSE e0 END"))
        .select("vec_id", "embedding")
      // harness-only: batch staging for MemoryStream — ONE collect.
      // Batch b = ids ≡ b (mod 4): the quantizer freezes on batch 0
      // (unshifted); compactions at upTo=1,3 fold + merge everything
      // into ONE run that the split must then leave standing.
      // n comes off the staged array — a separate count() was one more
      // full scan job in a drill whose wall is job-count x overhead
      val staged = typed.as[(Long, Seq[Double])].collect()
      val n = staged.length.toLong
      val batches = (0 to 3).map(b => staged.filter(_._1 % 4 == b).toSeq)
      val tmp = s"/tmp/graft_asp_${java.util.UUID.randomUUID()}"
      val ms = MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.AnnIngest.annIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), s"$tmp/index",
        checkpoint = Some(s"$tmp/ckpt"), nCells = 8, compactEvery = 2)
      try {
        batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      } finally q.stop()
      // the heal: shifted cell holds ~2x the mean -> hot at factor 1.25
      graft.streaming.AnnIngest.compact(s, s"$tmp/index", 4L,
        splitHot = 1.25)
      val cents = graft.streaming.AnnIngest
        .readCentroids(s, s"$tmp/index").get
      val ver = graft.streaming.AnnIngest
        .quantizerName(s, s"$tmp/index")
        .flatMap(n => "centroids_v(\\d+)\\.json".r.findFirstMatchIn(n)
          .map(_.group(1).toLong))
      val extended = ver.contains(4L) && cents.length > 8
      val manifestTxt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$tmp/index/manifest.json")), "UTF-8")
      // a run OLDER than the split's quantizer version survives in the
      // manifest — the rewrite was local, not a full rebuild
      val preSplitRunSurvives = ver.exists(v =>
        "\"name\": \"run_(\\d+)_".r.findAllMatchIn(manifestTxt)
          .exists(_.group(1).toLong < v))
      val splitTombRecorded = manifestTxt.contains("t_split_4")
      val idx = graft.streaming.AnnIngest
        .readIndex(s, s"$tmp/index", None).persist()
      val expect = graft.sim.Ivf.assignCells(
        idx.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      // contracts (4)(5) fused into ONE aggregation over the persisted
      // index frame (same shape as q_ann_fold's stats): expect is a
      // pure narrow map over idx, so the inner join preserves row
      // multiplicity — a duplicated/missing id fails cnt == n exactly
      // as the separate counts did
      val fnsS = org.apache.spark.sql.functions
      val statsS = idx.join(expect, Seq("vec_id"))
        .agg(
          fnsS.sum(fnsS.when(col("cell") =!= col("cell_x"), 1L)
            .otherwise(0L)).as("mism"),
          fnsS.count(fnsS.lit(1)).as("cnt"),
          fnsS.countDistinct(col("vec_id")).as("dcnt"))
        .head()
      val mismatches = if (statsS.isNullAt(0)) 0L else statsS.getLong(0)
      val liveOnce = statsS.getLong(1) == n && statsS.getLong(2) == n
      val sample = typed.filter(col("vec_id") % 7 === 0)
        .filter(nonZeroVec)
        .toDF("vec_id", "embedding")
      val self = graft.streaming.AnnIngest.queryTopK(s, s"$tmp/index",
          sample, k = 1, nProbe = 1)
        .filter(col("cos_r") < 1.0)
        .count()
      idx.unpersist(false)
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      // below drill scale the planted hot cell never reaches the split
      // threshold — the heal contracts are then vacuously true (fuzz
      // gate, tiny mode); the correctness contracts still bind
      val atScale = n >= 64
      Seq(
        ("extended_quantizer", if (!atScale || extended) 1 else 0),
        ("pre_split_run_survives",
          if (!atScale || preSplitRunSurvives) 1 else 0),
        ("split_tombstone_recorded",
          if (!atScale || splitTombRecorded) 1 else 0),
        ("cells_match_manifest_quantizer", if (mismatches == 0L) 1 else 0),
        ("live_exactly_once", if (liveOnce) 1 else 0),
        ("self_hit", if (self == 0L) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'extended_quantizer' AS contract, 1 AS ok
        |UNION ALL SELECT 'pre_split_run_survives', 1
        |UNION ALL SELECT 'split_tombstone_recorded', 1
        |UNION ALL SELECT 'cells_match_manifest_quantizer', 1
        |UNION ALL SELECT 'live_exactly_once', 1
        |UNION ALL SELECT 'self_hit', 1
        |""".stripMargin))

  /** Cold-cell FOLD contract ([[graft.streaming.AnnIngest]]
    * `compact(foldColdBelow)` — the split's inverse, bounding quantizer
    * growth over a drift-then-drain lifecycle): the same shifted feed
    * as `q_ann_split` streams in and the hot cell is split-healed
    * (quantizer GROWS); a takedown wave then drains most of the
    * shifted cluster, leaving its sub-cells far below mean occupancy;
    * the next compaction with `foldColdBelow` DEADENS the drained
    * cells in place (all-NaN slots — slot ids are cell ids and must
    * never renumber) and relocates their few residual rows into
    * surviving cells via the same relocation-run + cell-scoped
    * tombstone + one-manifest-swap machinery. Contracts: (1) the LIVE
    * cell count SHRINKS back while the slot array length is unchanged
    * (stable ids); (2) the fold tombstone is recorded in the manifest;
    * (3) every live row sits in its argmin cell under the committed
    * folded quantizer; (4) no live row sits in a dead slot; (5) every
    * surviving vector is live exactly once; (6) top-1 self-query at
    * cos 1.0 through the folded index (probe sets skip dead slots). */
  private val annFoldQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions.{col, expr}
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val typed = emb.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x AS double))").as("e0"))
        .withColumn("embedding", expr(
          "CASE WHEN vec_id % 4 = 2 " +
            "THEN transform(e0, x -> x + 8.0d) ELSE e0 END"))
        .select("vec_id", "embedding")
      val tmp = s"/tmp/graft_afd_${java.util.UUID.randomUUID()}"
      // the STREAM wiring of the heal pair is exercised by
      // q_ann_split + the AnnIngestSpec/CliSpec lifecycle drills; this
      // oracle pins the FOLD itself, so it drives the batch API
      // directly (quantizer freezes on the unshifted batch 0)
      (0 to 3).foreach { b =>
        graft.streaming.AnnIngest.ingestBatch(
          typed.filter(col("vec_id") % 4 === b), b.toLong,
          s"$tmp/index", nCells = 8)
      }
      graft.streaming.AnnIngest.compact(s, s"$tmp/index", 3L)
      // drift heal: split the hot (shifted) cell — quantizer grows
      graft.streaming.AnnIngest.compact(s, s"$tmp/index", 4L,
        splitHot = 1.25)
      val liveSplit = graft.streaming.AnnIngest
        .liveCellCount(s, s"$tmp/index")
      val slotsSplit = graft.streaming.AnnIngest
        .readCentroids(s, s"$tmp/index").get.length
      // drain: take down most of the shifted cluster, then fold
      val doomed = typed.filter(
        col("vec_id") % 4 === 2 && col("vec_id") % 20 =!= 2)
        .select("vec_id")
      // one pass over the input table covers both totals the contracts
      // need (total ingested, rows doomed below) — the drill's wall
      // time is action-count x fixed overhead, so counts are fused
      val tot = typed.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("vec_id") % 4 === 2 && col("vec_id") % 20 =!= 2, 1L)
          .otherwise(0L)).as("ndel")).head()
      val nDel = if (tot.isNullAt(1)) 0L else tot.getLong(1) // 0-row sum
      graft.streaming.AnnIngest.delete(s, s"$tmp/index", doomed, "drain")
      // pre-fold live rows + cells, pinned eagerly (the fold rewrites
      // the files this lazy plan would re-list): the tombstone contract
      // below is exact only against what actually needed relocating
      val preFold = graft.streaming.AnnIngest
        .readIndex(s, s"$tmp/index", None)
        .select(col("vec_id"), col("cell").as("pre_cell"))
        .localCheckpoint(true)
      graft.streaming.AnnIngest.compact(s, s"$tmp/index", 5L,
        foldColdBelow = 0.5)
      val cents = graft.streaming.AnnIngest
        .readCentroids(s, s"$tmp/index").get
      val liveFold = graft.streaming.AnnIngest
        .liveCellCount(s, s"$tmp/index")
      val shrinks = liveFold < liveSplit && cents.length == slotsSplit
      val manifestTxt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$tmp/index/manifest.json")), "UTF-8")
      val foldTombRecorded = manifestTxt.contains("t_split_f5")
      val n = tot.getLong(0) - nDel
      val idx = graft.streaming.AnnIngest
        .readIndex(s, s"$tmp/index", None).persist()
      val expect = graft.sim.Ivf.assignCells(
        idx.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      val deadSlots = cents.indices.filter(c => cents(c)(0).isNaN)
      // contracts (3)(4)(5) fused into ONE aggregation over the
      // persisted index frame: argmin mismatches, rows in dead slots,
      // live row count, distinct live ids
      val fns = org.apache.spark.sql.functions
      val deadCond =
        if (deadSlots.isEmpty) fns.lit(false)
        else col("cell").isin(deadSlots: _*)
      val stats = idx.join(expect, Seq("vec_id"))
        .agg(
          fns.sum(fns.when(col("cell") =!= col("cell_x"), 1L)
            .otherwise(0L)).as("mism"),
          fns.sum(fns.when(deadCond, 1L).otherwise(0L)).as("dead_rows"),
          fns.count(fns.lit(1)).as("cnt"),
          fns.countDistinct(col("vec_id")).as("dcnt"))
        .head()
      val mismatches = if (stats.isNullAt(0)) 0L else stats.getLong(0)
      val deadEmpty = stats.isNullAt(1) || stats.getLong(1) == 0L
      val liveOnce = stats.getLong(2) == n && stats.getLong(3) == n
      // computed while idx/the index files still exist (rm below): the
      // engine writes a fold tombstone ONLY when the fold relocated
      // rows (commitHeal's reloc.rows > 0 — nothing to retract
      // otherwise); on degenerate corpora (r16 fuzz, skew x nulls: 60%
      // identical vectors) the drained cells can be EMPTY at fold time,
      // deadening slots without movers. The contract is exact:
      // tombstone required iff some pre-fold row sat in a now-dead
      // slot and survived (i.e. was relocated).
      val relocated =
        if (deadSlots.isEmpty) 0L
        else preFold.filter(col("pre_cell").isin(deadSlots: _*))
          .join(idx.select("vec_id"), Seq("vec_id"), "left_semi").count()
      // surviving sample: unshifted every-7th + the shifted residue
      val sample = typed.filter(
        (col("vec_id") % 4 =!= 2 && col("vec_id") % 7 === 0) ||
          col("vec_id") % 20 === 2)
        .toDF("vec_id", "embedding").filter(nonZeroVec)
      val self = graft.streaming.AnnIngest.queryTopK(s, s"$tmp/index",
          sample, k = 1, nProbe = 1)
        .filter(col("cos_r") < 1.0)
        .count()
      idx.unpersist(false)
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      // same drill-scale gate as q_ann_split: a tiny corpus never
      // drains a cell below the fold threshold
      val atScale = tot.getLong(0) >= 64
      Seq(
        ("quantizer_shrinks_stable_slots",
          if (!atScale || shrinks) 1 else 0),
        ("fold_tombstone_recorded",
          if (!atScale || relocated == 0L || foldTombRecorded) 1 else 0),
        ("cells_match_manifest_quantizer", if (mismatches == 0L) 1 else 0),
        ("dead_slots_hold_no_rows", if (deadEmpty) 1 else 0),
        ("live_exactly_once", if (liveOnce) 1 else 0),
        ("self_hit", if (self == 0L) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'quantizer_shrinks_stable_slots' AS contract, 1 AS ok
        |UNION ALL SELECT 'fold_tombstone_recorded', 1
        |UNION ALL SELECT 'cells_match_manifest_quantizer', 1
        |UNION ALL SELECT 'dead_slots_hold_no_rows', 1
        |UNION ALL SELECT 'live_exactly_once', 1
        |UNION ALL SELECT 'self_hit', 1
        |""".stripMargin))

  /** ANN index deletion contract ([[graft.streaming.AnnIngest.delete]]
    * — LSM tombstones): every vec_id ≡ 0 (mod 10) is tombstoned after
    * ingest. Contracts: (1) reader-side exclusion is immediate (before
    * any compaction — the anti-join over the delta state); (2) the
    * query path excludes them (probe-all top-1 of a deleted vector is
    * never itself); (3) after compaction the RUN PARQUET physically
    * excludes them (read raw, bypassing the reader anti-join) and
    * holds exactly n − n_deleted rows; (4) after the sweep-generation
    * compaction, a re-ingested deleted id is visible again through the
    * public read path (proves the tombstone was actually swept, via
    * public surface only). */
  private val annDeleteQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions.{col, expr}
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val typed = emb.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x AS double))").as("embedding"))
      // one pass over the input covers both totals (total rows, rows
      // doomed below) — drill wall is action-count × fixed overhead,
      // so the two counts are fused (same shape as q_ann_fold's tot)
      val fns = org.apache.spark.sql.functions
      val tot = typed.agg(
        fns.count(fns.lit(1)).as("n"),
        fns.sum(fns.when(col("vec_id") % 10 === 0, 1L).otherwise(0L))
          .as("ndel")).head()
      val n = tot.getLong(0)
      val nDel = if (tot.isNullAt(1)) 0L else tot.getLong(1) // sum of 0 rows
      val tmp = s"/tmp/graft_adl_${java.util.UUID.randomUUID()}"
      val idx = s"$tmp/index"
      graft.streaming.AnnIngest.ingestBatch(
        typed.filter(col("vec_id") % 2 === 0), 0L, idx, nCells = 8)
      graft.streaming.AnnIngest.ingestBatch(
        typed.filter(col("vec_id") % 2 === 1), 1L, idx, nCells = 8)
      val doomed = typed.filter(col("vec_id") % 10 === 0)
        .select("vec_id")
      graft.streaming.AnnIngest.delete(s, idx, doomed, "takedown")
      // (1) immediate exclusion over the delta-only state — count and
      // survivor check fused into ONE aggregation (no persist needed:
      // the frame is consumed by a single action)
      val liveStats = graft.streaming.AnnIngest.readIndex(s, idx, None)
        .agg(fns.count(fns.lit(1)).as("cnt"),
          fns.sum(fns.when(col("vec_id") % 10 === 0, 1L).otherwise(0L))
            .as("doomed_left")).head()
      val immediateOk = liveStats.getLong(0) == n - nDel &&
        (liveStats.isNullAt(1) || liveStats.getLong(1) == 0L)
      // (2) a deleted vector can no longer be its own top-1
      // orderBy before limit: an unordered limit is not a stable row
      // set across executions (see AnnIngest.queryTopK's snapshot note)
      val delSample = typed.filter(col("vec_id") % 10 === 0)
        .orderBy("vec_id").limit(20).toDF("vec_id", "embedding")
      val selfHits = graft.streaming.AnnIngest.queryTopK(s, idx,
          delSample, k = 1, nProbe = 8)
        .filter(col("nb_id") === col("vec_id")).count()
      // (3) compaction folds the tombstone into the written run
      graft.streaming.AnnIngest.compact(s, idx, 1L)
      // harness-only: list the run dirs (internal layout) to read the
      // physical run bytes, bypassing the reader-side anti-join
      val runDirs = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$idx/vectors"))
          .iterator().asScala
          .filter(_.getFileName.toString.startsWith("run_"))
          .map(_.toString).toSeq
      }
      // same single-aggregation fusion as the immediate check above
      val rawStats = runDirs.map(d =>
        s.read.option("basePath", d).parquet(d))
        .reduce(_ unionByName _)
        .agg(fns.count(fns.lit(1)).as("cnt"),
          fns.sum(fns.when(col("vec_id") % 10 === 0, 1L).otherwise(0L))
            .as("doomed_left")).head()
      val physicalOk = rawStats.getLong(0) == n - nDel &&
        (rawStats.isNullAt(1) || rawStats.getLong(1) == 0L)
      // (4) logical sweep (gen+1), physical delete (gen+2), then
      // re-ingest one deleted id
      graft.streaming.AnnIngest.compact(s, idx, 2L)
      graft.streaming.AnnIngest.compact(s, idx, 3L)
      graft.streaming.AnnIngest.ingestBatch(
        typed.filter(col("vec_id") === 0), 4L, idx, nCells = 8)
      val back = graft.streaming.AnnIngest.readIndex(s, idx, None)
        .filter(col("vec_id") === 0).count()
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      Seq(
        ("immediate_exclusion", if (immediateOk) 1 else 0),
        ("query_excludes_deleted", if (selfHits == 0L) 1 else 0),
        ("physically_compacted_out", if (physicalOk) 1 else 0),
        ("reingest_after_sweep", if (back == 1L) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'immediate_exclusion' AS contract, 1 AS ok
        |UNION ALL SELECT 'query_excludes_deleted', 1
        |UNION ALL SELECT 'physically_compacted_out', 1
        |UNION ALL SELECT 'reingest_after_sweep', 1
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_embed_cov"   -> embedCov,
    "q_stream_ann_ingest" -> streamAnnIngestQ,
    "q_ann_ingest_retrain" -> annIngestRetrainQ,
    "q_ann_split"   -> annSplitQ,
    "q_ann_fold"    -> annFoldQ,
    "q_ann_delete"  -> annDeleteQ,
    "q_cosine_topk" -> cosineTopK,
    "q_ann_lsh"     -> annLsh,
    "q_ann_ivf"     -> annIvf,
    "q_ann_recall_lsh" -> annRecallLsh,
    "q_ann_recall_ivf" -> annRecallIvf,
    "q_ann_recall_auto" -> annRecallAuto,
    "q_mrr_ndcg"    -> mrrNdcgQ,
    "q_embed_quantize" -> embedQuantize,
    "q_dedup_embed" -> dedupEmbed,
    "q_semdedup"    -> semDedup,
    "q_embed_binary" -> embedBinary,
    "q_ann_hamming"  -> annHamming,
  )
}
