package graft

import graft.text.TextOps

/** Dedup / text-analysis queries over the `documents` table. */
object QueriesText {
  import QueryUtil.docs

  /** DuckDB CTEs mirroring TextOps.shingles: distinct 3-gram word shingles
    * (short docs → whole text). */
  private val shingleCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE text IS NOT NULL),
      |s AS (SELECT doc_id, CASE WHEN len(toks) >= 3
      |  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |       i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
      |  ELSE [array_to_string(toks, ' ')] END AS sh FROM t)""".stripMargin

  private def minhashSelect(numHashes: Int): String =
    (0 until numHashes).map(h =>
      s"  list_min(list_transform(sh, s -> md5('$h|' || s))) AS m_$h")
      .mkString(",\n")

  // ---- MinHash signatures --------------------------------------------------

  private val minhash: Q = Q(
    fn = (s, dir) => TextOps.minhash(docs(s, dir)),
    oracle = Some(
      s"""WITH $shingleCte
         |SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s
         |""".stripMargin))

  // ---- MinHash-LSH candidate pairs ----------------------------------------

  private val lshPairs: Q = Q(
    fn = (s, dir) => TextOps.lshPairs(TextOps.minhash(docs(s, dir), respread = true)),
    oracle = Some(
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         | AND a.doc_id < b.doc_id
         |""".stripMargin))

  // ---- exact n-gram Jaccard near-dup pairs --------------------------------

  private val jaccard: Q = Q(
    fn = (s, dir) => TextOps.jaccardPairs(docs(s, dir), 0.5, dfCap = 1000),
    // mirrors the Spark df cap: shingles in >1000 docs never pair; sizes
    // stay the full per-doc shingle counts
    oracle = Some(
      s"""WITH $shingleCte,
         |sh AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000),
         |shf AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM hot)),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter,
         |  round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) >= 0.5
         |""".stripMargin))

  // ---- dedup applied: survivors after near-dup removal ---------------------

  /** The consumer side of MinHash-LSH dedup: every doc named as the GREATER
    * member of a candidate pair is dropped (keep-first-id policy), via
    * anti-join — the corpus-scrub a training-data pipeline actually runs.
    * Note this is single-hop removal (b of (a,b) goes away even if a is
    * itself removed by an earlier pair) — the deterministic one-pass policy;
    * full transitive clustering needs iterated connected components. */
  private val dedupApply: Q = Q(
    fn = (s, dir) => {
      val docsDf = docs(s, dir)
      val pairs = TextOps.lshPairs(TextOps.minhash(docsDf, respread = true))
      val dups = pairs.select(org.apache.spark.sql.functions.col("doc_b"))
        .distinct()
      docsDf.join(dups,
          docsDf("doc_id") === dups("doc_b"), "left_anti")
        .groupBy("source")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_kept"))
    },
    oracle = Some(
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |dups AS (SELECT DISTINCT b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id)
         |SELECT source, count(*) AS n_kept
         |FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM dups WHERE dups.doc_b = d.doc_id)
         |GROUP BY source
         |""".stripMargin))

  // ---- transitive dedup clusters (bounded-round connected components) ------

  /** LSH candidate pairs → connected components (3 unrolled min-label
    * rounds, exact for clique-like dup clusters) → per-cluster sizes.
    * Closes the single-hop-removal gap of q_dedup_apply: a transitive
    * chain a~b~c collapses to one cluster labeled min(id). */
  private val dedupCc: Q = Q(
    fn = (s, dir) => {
      val pairs = TextOps.lshPairs(TextOps.minhash(docs(s, dir), respread = true))
      TextOps.dedupClusters(pairs, rounds = 3)
        .groupBy("cluster")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"))
    },
    oracle = Some {
      def round(prev: String, next: String) =
        s"""$next AS (SELECT doc_id, min(label) AS label FROM (
           |  SELECT doc_id, label FROM $prev
           |  UNION ALL
           |  SELECT e.dst AS doc_id, l.label
           |  FROM edges e JOIN $prev l ON e.src = l.doc_id) GROUP BY doc_id)"""
          .stripMargin
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS label FROM edges),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT label AS cluster, count(*) AS n_members
         |FROM l3 GROUP BY label
         |""".stripMargin
    })

  // ---- incremental cross-snapshot dedup ------------------------------------

  /** New-batch admission screen against a prior corpus: docs outside
    * 'src0' (the "new batch") checked against the 'src0' slice (the
    * "prior corpus") by exact content hash and MinHash band overlap.
    * All three verdict flags value-checked per doc. */
  private val incrementalDedupQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      TextOps.incrementalDedup(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"))
    },
    oracle = Some(
      s"""WITH $shingleCte,
         |d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |pb AS (SELECT DISTINCT band_id, band_hash
         |       FROM bands JOIN d USING (doc_id) WHERE d.source = 'src0'),
         |ph AS (SELECT DISTINCT h FROM d WHERE source = 'src0'),
         |nd AS (SELECT doc_id, h FROM d WHERE source <> 'src0'),
         |near AS (SELECT DISTINCT b.doc_id
         |         FROM bands b JOIN nd USING (doc_id)
         |         JOIN pb ON b.band_id = pb.band_id
         |                AND b.band_hash = pb.band_hash)
         |SELECT nd.doc_id,
         |  (ph.h IS NOT NULL) AS dup_exact,
         |  (near.doc_id IS NOT NULL) AS dup_near,
         |  (ph.h IS NULL AND near.doc_id IS NULL) AS kept
         |FROM nd LEFT JOIN ph ON nd.h = ph.h
         |LEFT JOIN near ON nd.doc_id = near.doc_id
         |""".stripMargin))

  // ---- streaming ingestion dedup gate --------------------------------------

  /** The streaming face of the admission screen
    * ([[graft.streaming.StreamOps.dedupIngestStream]]): docs arrive in 4
    * deterministic micro-batches (batch = doc_id % 4, forced one batch
    * per MemoryStream add), each screened against the persisted index of
    * ALL previously-seen docs. Every verdict row is value-checked: the
    * oracle replays "earlier batch contains my hash / shares one of my
    * bands" directly. */
  private val streamDedupIngestQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.col
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val d = docs(s, dir)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
      // harness-only: batch staging for MemoryStream — ONE collect,
      // partitioned driver-side (4 filtered collects = 4 scans)
      val staged = d.collect()
      val batches = (0 to 3).map(b => staged.filter(_._1 % 4 == b).toSeq)
      val tmp = s"/tmp/graft_sdi_${java.util.UUID.randomUUID()}"
      val ms = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.dedupIngestStream(
        ms.toDF().toDF("doc_id", "text"), s"$tmp/index", s"$tmp/out")
      try {
        batches.foreach { rows =>
          ms.addData(rows); q.processAllAvailable()
        }
      } finally q.stop()
      // materialize, then delete the tmp index/out tree — repeated bench
      // runs must not accumulate parquet trees in /tmp
      val out = s.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("dup_exact"), col("dup_near"),
          col("kept"))
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      out.toDF("doc_id", "dup_exact", "dup_near", "kept")
    },
    oracle = Some(
      s"""WITH $shingleCte,
         |d AS (SELECT doc_id, doc_id % 4 AS b, md5(text) AS h
         |      FROM documents),
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |bb AS (SELECT bands.*, d.b FROM bands JOIN d USING (doc_id)),
         |ex AS (SELECT DISTINCT n.doc_id
         |       FROM d n JOIN d p ON n.h = p.h AND p.b < n.b),
         |nr AS (SELECT DISTINCT n.doc_id
         |       FROM bb n JOIN bb p
         |         ON n.band_id = p.band_id AND n.band_hash = p.band_hash
         |        AND p.b < n.b)
         |SELECT d.doc_id,
         |  (ex.doc_id IS NOT NULL) AS dup_exact,
         |  (nr.doc_id IS NOT NULL) AS dup_near,
         |  (ex.doc_id IS NULL AND nr.doc_id IS NULL) AS kept
         |FROM d LEFT JOIN ex ON d.doc_id = ex.doc_id
         |LEFT JOIN nr ON d.doc_id = nr.doc_id
         |""".stripMargin))

  // ---- streaming ingestion gate, intra-batch mode ---------------------------

  /** The gate's `intraBatch = true` mode: within one micro-batch, the
    * smallest doc_id holding an exact hash / band key survives and every
    * other holder is flagged — the keep-first rule a production crawl
    * needs because its micro-batches are millions of docs. Duplicates
    * are PLANTED deterministically (the oracle replays the same
    * construction): every doc gets ONE twin — even docs +100000 (same
    * parity → SAME batch → the intra keep-first rule fires), odd docs
    * +200001 (lands in the EARLIER batch → the cross-batch screen
    * flags the original; the ranges are disjoint so twin ids never
    * collide). 2 batches by doc_id parity; every verdict row is
    * value-checked against "some earlier batch, or same batch with
    * smaller doc_id, holds my hash / one of my bands". */
  private val streamDedupIntraQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.col
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = docs(s, dir)
        .select(col("doc_id").cast("long"), col("text"))
      val d = base
        .union(base.select(col("doc_id") + org.apache.spark.sql.functions
          .when(col("doc_id") % 2 === 0, 100000L).otherwise(200001L),
          col("text")))
        .as[(Long, String)]
      // harness-only: batch staging for MemoryStream — ONE collect,
      // partitioned driver-side
      val staged = d.collect()
      val batches = (0 to 1).map(b => staged.filter(_._1 % 2 == b).toSeq)
      val tmp = s"/tmp/graft_sdx_${java.util.UUID.randomUUID()}"
      val ms = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.dedupIngestStream(
        ms.toDF().toDF("doc_id", "text"), s"$tmp/index", s"$tmp/out",
        intraBatch = true)
      try {
        batches.foreach { rows =>
          ms.addData(rows); q.processAllAvailable()
        }
      } finally q.stop()
      val out = s.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("dup_exact"), col("dup_near"),
          col("kept"))
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      out.toDF("doc_id", "dup_exact", "dup_near", "kept")
    },
    oracle = Some(
      s"""WITH dd AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + CASE WHEN doc_id % 2 = 0
         |    THEN 100000 ELSE 200001 END, text FROM documents),
         |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
         |s AS (SELECT doc_id, CASE WHEN len(toks) >= 3
         |  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
         |       i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         |  ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
         |d AS (SELECT doc_id, doc_id % 2 AS b, md5(text) AS h FROM dd),
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |bb AS (SELECT bands.*, d.b FROM bands JOIN d USING (doc_id)),
         |ex AS (SELECT DISTINCT n.doc_id
         |       FROM d n JOIN d p ON n.h = p.h
         |        AND (p.b < n.b OR (p.b = n.b AND p.doc_id < n.doc_id))),
         |nr AS (SELECT DISTINCT n.doc_id
         |       FROM bb n JOIN bb p
         |         ON n.band_id = p.band_id AND n.band_hash = p.band_hash
         |        AND (p.b < n.b OR (p.b = n.b AND p.doc_id < n.doc_id)))
         |SELECT d.doc_id,
         |  (ex.doc_id IS NOT NULL) AS dup_exact,
         |  (nr.doc_id IS NOT NULL) AS dup_near,
         |  (ex.doc_id IS NULL AND nr.doc_id IS NULL) AS kept
         |FROM d LEFT JOIN ex ON d.doc_id = ex.doc_id
         |LEFT JOIN nr ON d.doc_id = nr.doc_id
         |""".stripMargin))

  // ---- ingest gate retraction (takedown) ------------------------------------

  /** The gate's takedown path ([[graft.streaming.StreamOps.retractDocs]]):
    * after batch 0 (even doc_ids) is indexed, every doc_id ≡ 0 (mod 10)
    * is RETRACTED — its exact hash and band keys tombstoned — before
    * batch 1 (odd doc_ids) screens. The oracle replays the key-level
    * semantics exactly: an odd doc is a dup iff some batch-0 doc shares
    * its hash / a band AND that key is not among the retracted docs'
    * keys (key-level removal — a hash shared between a retracted and a
    * surviving batch-0 doc is gone for both, which is what retracting
    * content from a content-keyed index means). */
  private val streamDedupRetractQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions.col
      import s.implicits._
      val base = docs(s, dir)
        .select(col("doc_id").cast("long"), col("text"))
      val tmp = s"/tmp/graft_sdr_${java.util.UUID.randomUUID()}"
      graft.streaming.StreamOps.ingestBatch(
        base.filter(col("doc_id") % 2 === 0), 0L, s"$tmp/index",
        s"$tmp/out")
      graft.streaming.StreamOps.retractDocs(
        base.filter(col("doc_id") % 10 === 0), s"$tmp/index", "takedown")
      graft.streaming.StreamOps.ingestBatch(
        base.filter(col("doc_id") % 2 === 1), 1L, s"$tmp/index",
        s"$tmp/out")
      val out = s.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("dup_exact"), col("dup_near"),
          col("kept"))
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).iterator().asScala.toSeq.foreach(rm)
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(java.nio.file.Paths.get(tmp))
      out.toDF("doc_id", "dup_exact", "dup_near", "kept")
    },
    oracle = Some(
      s"""WITH $shingleCte,
         |d AS (SELECT doc_id, doc_id % 2 AS b, md5(text) AS h
         |      FROM documents),
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |bb AS (SELECT bands.*, d.b FROM bands JOIN d USING (doc_id)),
         |rh AS (SELECT DISTINCT h FROM d WHERE doc_id % 10 = 0),
         |rb AS (SELECT DISTINCT band_id, band_hash FROM bb
         |       WHERE doc_id % 10 = 0),
         |ex AS (SELECT DISTINCT n.doc_id
         |       FROM d n JOIN d p ON n.h = p.h AND p.b < n.b
         |       WHERE p.h NOT IN (SELECT h FROM rh)),
         |nr AS (SELECT DISTINCT n.doc_id
         |       FROM bb n JOIN bb p
         |         ON n.band_id = p.band_id AND n.band_hash = p.band_hash
         |        AND p.b < n.b
         |       WHERE NOT EXISTS (SELECT 1 FROM rb
         |         WHERE rb.band_id = p.band_id
         |           AND rb.band_hash = p.band_hash))
         |SELECT d.doc_id,
         |  (ex.doc_id IS NOT NULL) AS dup_exact,
         |  (nr.doc_id IS NOT NULL) AS dup_near,
         |  (ex.doc_id IS NULL AND nr.doc_id IS NULL) AS kept
         |FROM d LEFT JOIN ex ON d.doc_id = ex.doc_id
         |LEFT JOIN nr ON d.doc_id = nr.doc_id
         |""".stripMargin))

  // ---- LSH quality contract ------------------------------------------------

  /** MinHash-LSH candidate quality as ONE regression-guarded row: exact
    * Jaccard≥0.5 ground truth (computable at contract scale; production
    * uses the estimator), LSH candidate count, hits, recall, precision —
    * every number value-checked cross-engine. The ANN-recall analog for
    * the text-dedup family. */
  private val lshQualityQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      // both sides feed TWO consumers each (their own count agg + the
      // hit join) — persist and materialize so the shingle self-join and
      // the MinHash/banding pass run once, not twice (the bench drops
      // leftover blocks after measurement; outputs are bounded pair sets)
      val truth = TextOps.jaccardPairs(d, 0.5, dfCap = 1 << 20)
        .select("doc_a", "doc_b").persist()
      val cand = TextOps.lshPairs(TextOps.minhash(d, respread = true))
        .persist()
      truth.count(); cand.count()
      val hit = cand.join(truth, Seq("doc_a", "doc_b"))
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          when(col("n_true") > 0, round(
            col("n_hit").cast("double") / col("n_true"), 6))
            .otherwise(1.0).as("recall"),
          when(col("n_cand") > 0, round(
            col("n_hit").cast("double") / col("n_cand"), 6))
            .otherwise(1.0).as("precision"))
    },
    oracle = Some(
      s"""WITH $shingleCte,
         |shx AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         count(*)::BIGINT AS inter
         |       FROM shx a JOIN shx b
         |         ON a.g = b.g AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |sz AS (SELECT doc_id, len(sh)::BIGINT AS sz FROM s),
         |tp AS (SELECT doc_a, doc_b FROM ip
         |       JOIN sz sa ON ip.doc_a = sa.doc_id
         |       JOIN sz sb ON ip.doc_b = sb.doc_id
         |       WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6)
         |             >= 0.5),
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |agg AS (SELECT
         |  (SELECT count(*) FROM tp)::BIGINT AS n_true,
         |  (SELECT count(*) FROM cand)::BIGINT AS n_cand,
         |  (SELECT count(*) FROM cand JOIN tp USING (doc_a, doc_b))::BIGINT
         |    AS n_hit)
         |SELECT n_true, n_cand, n_hit,
         |  CASE WHEN n_true > 0
         |       THEN round(n_hit::DOUBLE / n_true, 6) ELSE 1.0 END
         |    AS recall,
         |  CASE WHEN n_cand > 0
         |       THEN round(n_hit::DOUBLE / n_cand, 6) ELSE 1.0 END
         |    AS precision
         |FROM agg
         |""".stripMargin))

  // ---- dedup cluster representative by quality -----------------------------

  /** Same LSH pair graph as q_dedup_cc, but per cluster KEEP the best doc
    * (max char length, min doc_id on ties) instead of an arbitrary member —
    * the CCNet/RefinedWeb "keep the highest-quality duplicate" rule. Every
    * doc gets a (cluster, kept) verdict; singletons keep themselves. */
  private val dedupKeepBestQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      // null-text docs have no content to score or dedup — ingest drop
      val d = docs(s, dir).filter(col("text").isNotNull)
      // the pair graph feeds dedupKeepBest's 3-round unrolled CC, whose
      // plan references `pairs` once per round — persist so the
      // MinHash/banding pass runs ONCE, not 3× (the r9 bench's
      // leftover-dropping made the recompute visible: +2.3 s). NO eager
      // count(): the CC's own first action fills the cache lazily — the
      // r10 bench showed a dedicated materialization pass costs more
      // (+2.0 s at sf0.1) than it saves. Harness.dropLeftovers reclaims
      // the block after measurement
      val pairs = TextOps.lshPairs(TextOps.minhash(d, respread = true))
        .persist()
      TextOps.dedupKeepBest(d, pairs, length(col("text")))
    },
    oracle = Some {
      def round(prev: String, next: String) =
        s"""$next AS (SELECT doc_id, min(label) AS label FROM (
           |  SELECT doc_id, label FROM $prev
           |  UNION ALL
           |  SELECT e.dst AS doc_id, l.label
           |  FROM edges e JOIN $prev l ON e.src = l.doc_id) GROUP BY doc_id)"""
          .stripMargin
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS label FROM edges),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")},
         |j AS (SELECT d.doc_id, coalesce(l.label, d.doc_id) AS cluster,
         |             length(d.text)::BIGINT AS score
         |      FROM documents d LEFT JOIN l3 l ON d.doc_id = l.doc_id
         |      WHERE d.text IS NOT NULL),
         |b1 AS (SELECT cluster, max(score) AS bs FROM j GROUP BY cluster),
         |b2 AS (SELECT j.cluster, min(j.doc_id) AS bid
         |       FROM j JOIN b1 ON j.cluster = b1.cluster AND j.score = b1.bs
         |       GROUP BY j.cluster)
         |SELECT j.doc_id, j.cluster, (j.doc_id = b2.bid) AS kept
         |FROM j JOIN b2 USING (cluster)
         |""".stripMargin
    })

  // ---- stratified (per-source) deterministic sampling ----------------------

  /** Per-source stratified sampling — the corpus-mixing step of an LLM
    * data pipeline (downsample over-represented sources). Deterministic
    * md5 thresholding (q_hash_sample pattern), with the RATE itself
    * derived from md5(source) so the query needs no source enumeration:
    * sources whose md5 first hex digit < '8' keep 25%, others 50%. Pure
    * narrow filter + groupBy(source) — one scan, one tiny shuffle; rates
    * in a real pipeline come from a broadcast config table instead. */
  private val stratifiedSample: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val hx = "'0123456789abcdef'"
      val rowH = "md5(cast(concat(cast(doc_id AS string), '|', source) AS binary))"
      val v = s"(instr($hx, substr($rowH, 1, 1)) - 1) * 16 + " +
        s"(instr($hx, substr($rowH, 2, 1)) - 1)"
      val srcDigit = s"instr($hx, substr(md5(cast(source AS binary)), 1, 1)) - 1"
      val kept = docs(s, dir)
        .filter(expr(s"$v < CASE WHEN $srcDigit < 8 THEN 64 ELSE 128 END"))
      kept.groupBy("source").agg(count(lit(1)).as("n_kept"))
    },
    oracle = Some {
      val hx = "'0123456789abcdef'"
      val rowH = "md5(cast(doc_id AS VARCHAR) || '|' || source)"
      val v = s"(instr($hx, substr($rowH, 1, 1)) - 1) * 16 + " +
        s"(instr($hx, substr($rowH, 2, 1)) - 1)"
      val srcDigit = s"instr($hx, substr(md5(source), 1, 1)) - 1"
      s"""SELECT source, count(*) AS n_kept
         |FROM documents
         |WHERE $v < CASE WHEN $srcDigit < 8 THEN 64 ELSE 128 END
         |GROUP BY source
         |""".stripMargin
    })

  // ---- MinHash Jaccard ESTIMATION on candidate pairs -----------------------

  /** The estimator the MinHash signatures exist for: for LSH candidate
    * pairs, estimate Jaccard as the fraction of agreeing minhash
    * components (E[agree] = J by the permutation argument) — the cheap
    * screen a pipeline applies before the exact [[TextOps.jaccardPairs]]
    * confirm. Signatures re-attach by id join (size-gated broadcast
    * pattern); one narrow comparison expression per pair. */
  private val minhashJaccardEst: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val sig = TextOps.minhash(docs(s, dir), respread = true)
      val pairs = TextOps.lshPairs(sig)
      val sa = sig.toDF(sig.columns.toIndexedSeq.map(c => s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.toIndexedSeq.map(c => s"b_$c"): _*)
      val agree = (0 until 8).map(h =>
        when(col(s"a_m_$h") === col(s"b_m_$h"), 1).otherwise(0))
        .reduce(_ + _)
      pairs
        .join(sa, col("doc_a") === col("a_doc_id"))
        .join(sb, col("doc_b") === col("b_doc_id"))
        .select(col("doc_a"), col("doc_b"),
          round(agree.cast("double") / 8, 6).as("jaccard_est"))
    },
    oracle = Some {
      val agree = (0 until 8).map(h =>
        s"CASE WHEN sa.m_$h = sb.m_$h THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(($agree)::DOUBLE / 8, 6) AS jaccard_est
         |FROM prs
         |JOIN sig sa ON doc_a = sa.doc_id
         |JOIN sig sb ON doc_b = sb.doc_id
         |""".stripMargin
    })

  // ---- exact (iterative) dedup clusters ------------------------------------

  /** Same LSH pair graph as q_dedup_cc but clustered by the ITERATIVE
    * checkpointed CC ([[TextOps.dedupClustersIterative]]) — exact for any
    * component diameter, convergence-checked per round. The oracle is
    * DuckDB's exact transitive closure via a recursive CTE (reach(s) is
    * every node reachable from s; undirected edges put s in its own reach
    * set, so min(reach) IS the component minimum). */
  private val dedupCcIter: Q = Q(
    fn = (s, dir) => {
      val pairs = TextOps.lshPairs(TextOps.minhash(docs(s, dir), respread = true))
      TextOps.dedupClustersIterative(pairs)
        .groupBy("cluster")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"))
    },
    oracle = Some(
      s"""WITH RECURSIVE $shingleCte,
         |sig AS (SELECT doc_id,
         |${minhashSelect(8)}
         |FROM s),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id,
         |         md5(m_0 || m_1 || m_2 || m_3) AS band_hash FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(m_4 || m_5 || m_6 || m_7) FROM sig),
         |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(s, d) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src),
         |lab AS (SELECT s AS doc_id, min(d) AS cluster FROM reach GROUP BY s)
         |SELECT cluster, count(*) AS n_members FROM lab GROUP BY cluster
         |""".stripMargin))

  // ---- SimHash near-dup pairs (hamming-banded) -----------------------------

  /** DuckDB CTE chain `toks`→`bits`→`sig` mirroring [[TextOps.simhash]]
    * at `bits` bits. Bit 63's weight is Long.MinValue, spelled
    * `(-...807 - 1)` because the positive literal 2^63 would parse as
    * HUGEINT; partial sums of the bit weights never overflow BIGINT
    * (bits 0–62 sum to ≤ 2^63−1 before the one negative term). */
  private def simhashSigCtes(bits: Int): String = {
    val sums = (0 until bits).map { j =>
      val di = j / 4 + 1
      val shift = 3 - (j % 4)
      s"  sum(CAST(floor((instr('0123456789abcdef', substr(h, $di, 1)) - 1)" +
        s" / ${1 << shift}) % 2 AS BIGINT)) AS s_$j"
    }.mkString(",\n")
    val simExpr = (0 until bits).map { j =>
      val w = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
      s"CASE WHEN 2 * s_$j >= n THEN $w ELSE 0 END"
    }.mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, count(*) AS n,
       |$sums
       |  FROM toks GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash
       |        FROM bits)""".stripMargin
  }

  /** 64-bit SimHash → 4×16-bit banded candidates (bucket-capped, the
    * [[TextOps.jaccardPairs]] df-cap policy) → exact hamming confirm
    * (xor + bit_count; DuckDB's ^ is POWER, so the oracle uses xor()).
    * `>>`+mask band extraction is shift-semantics-proof: the & keeps only
    * bits whose sources sit at position ≤ 63, identical under arithmetic
    * or logical shift. */
  private val simhashPairsQ: Q = Q(
    fn = (s, dir) => TextOps.simhashPairs(docs(s, dir), 64, maxHamming = 3,
      bandBits = 16, maxBucket = 1000),
    oracle = Some {
      val bandSelects = (0 until 4).map { k =>
        s"SELECT doc_id, $k AS band, (simhash >> ${k * 16}) & 65535 AS bv" +
          " FROM sig"
      }.mkString("\n          UNION ALL ")
      s"""WITH ${simhashSigCtes(64)},
         |bands AS (${bandSelects}),
         |hot AS (SELECT band, bv FROM bands
         |        GROUP BY 1, 2 HAVING count(*) > 1000),
         |bf AS (SELECT * FROM bands b WHERE NOT EXISTS (
         |  SELECT 1 FROM hot h WHERE h.band = b.band AND h.bv = b.bv)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bf a JOIN bf b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  bit_count(xor(sa.simhash, sb.simhash)) AS hamming
         |FROM cand
         |JOIN sig sa ON doc_a = sa.doc_id
         |JOIN sig sb ON doc_b = sb.doc_id
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
         |""".stripMargin
    })

  // ---- PII scrubbing (compliance pass) -------------------------------------

  /** The synthetic corpus carries no PII, so ~25% of docs get a
    * deterministic seeded contact line (md5-gated, q_csv_roundtrip
    * pattern) before the scrub — the query then proves masking, per-kind
    * counts, and the cleaned-text fingerprint all match the oracle's
    * identical RE2-compatible regex chain. */
  private val piiScrub: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val gate = substring(md5(col("text").cast("binary")), 1, 1)
      val seeded = docs(s, dir).withColumn("text",
        when(gate.isin("0", "1", "2", "3"),
          concat(col("text"), lit(" contact u"), col("doc_id"),
            lit("@mail.example.org or 555-123-4567")))
          .when(gate === "4",
            concat(col("text"), lit(" id 123-45-6789")))
          .otherwise(col("text")))
      TextOps.scrubPii(seeded)
        .select("doc_id", "n_email", "n_phone", "n_ssn", "clean_fp")
    },
    oracle = Some {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
      val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    CASE WHEN substr(md5(text), 1, 1) IN ('0','1','2','3')
         |      THEN text || ' contact u' || doc_id ||
         |           '@mail.example.org or 555-123-4567'
         |    WHEN substr(md5(text), 1, 1) = '4'
         |      THEN text || ' id 123-45-6789'
         |    ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$email'))::BIGINT AS n_email,
         |  len(regexp_extract_all(text, '$phone'))::BIGINT AS n_phone,
         |  len(regexp_extract_all(text, '$ssn'))::BIGINT AS n_ssn,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g'),
         |    '$ssn', '<SSN>', 'g')) AS clean_fp
         |FROM seeded
         |""".stripMargin
    })

  // ---- repetition signal (Gopher-style corpus hygiene) ---------------------

  private val repetition: Q = Q(
    fn = (s, dir) => TextOps.repetition(docs(s, dir)),
    oracle = Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(generate_series(1, len(toks) - 1),
        |         i -> array_to_string(list_slice(toks, i, i + 1), ' '))
        |    ELSE [array_to_string(toks, ' ')] END) AS bg FROM t),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
        |  max(c)::BIGINT AS top_bigram_cnt,
        |  round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_share
        |FROM c GROUP BY doc_id
        |""".stripMargin))

  // ---- SimHash fingerprints ------------------------------------------------

  private val simhashBits = 64

  private val simhash: Q = Q(
    fn = (s, dir) => TextOps.simhash(docs(s, dir), simhashBits),
    oracle = Some(
      s"""WITH ${simhashSigCtes(simhashBits)}
         |SELECT doc_id, simhash FROM sig
         |""".stripMargin))

  // ---- language ID ---------------------------------------------------------

  private val langId: Q = Q(
    fn = (s, dir) => TextOps.langId(docs(s, dir)),
    oracle = Some {
      val values = TextOps.lexicon
        .map { case (t, l) => s"('$t','$l')" }.mkString(", ")
      s"""WITH lex(t, lang) AS (VALUES $values),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |         FROM documents),
         |votes AS (SELECT doc_id, lang, count(*) AS votes
         |          FROM toks JOIN lex USING (t) GROUP BY 1, 2),
         |best AS (SELECT doc_id, lang, votes,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY votes DESC, lang) AS rn
         |  FROM votes)
         |SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
         |       coalesce(b.votes, 0) AS votes
         |FROM documents d
         |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
         |""".stripMargin
    })

  // ---- quality scoring (row-local) ----------------------------------------

  private val quality: Q = Q(
    fn = (s, dir) => TextOps.quality(docs(s, dir)),
    oracle = Some {
      val stopList = TextOps.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  length(text) AS n_chars,
         |  length(regexp_replace(text, ' ', '', 'g'))::DOUBLE
         |    / len(string_split(text, ' ')) AS mean_tok_len,
         |  length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
         |    / length(text) AS digit_ratio,
         |  length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE
         |    / length(text) AS upper_ratio,
         |  round(len(list_filter(string_split(text, ' '),
         |      t -> t IN ($stopList)))::DOUBLE
         |    / len(string_split(text, ' ')), 6) AS stopword_ratio
         |FROM documents
         |""".stripMargin
    })

  // ---- URL / domain provenance profiling -----------------------------------

  /** The synthetic corpus carries no URLs, so ~1/4 of docs get a
    * deterministic seeded link (md5-gated, the q_pii_scrub pattern)
    * before extraction — the query then proves regex extraction, domain
    * stripping, and the per-domain rollup against the oracle. */
  private val urlDomains: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val gate = substring(md5(col("text").cast("binary")), 1, 1)
      val seeded = docs(s, dir).withColumn("text",
        when(gate.isin("0", "1", "2"),
          concat(col("text"), lit(" see https://site"), col("doc_id") % 7,
            lit(".example.org/page")))
          .when(gate === "3",
            concat(col("text"), lit(" http://mirror.example.net and "),
              lit("https://site0.example.org/dup")))
          .otherwise(col("text")))
      TextOps.urlDomains(seeded)
    },
    oracle = Some(
      s"""WITH seeded AS (
         |  SELECT CASE WHEN substr(md5(text), 1, 1) IN ('0','1','2')
         |    THEN text || ' see https://site' || (doc_id % 7) ||
         |         '.example.org/page'
         |  WHEN substr(md5(text), 1, 1) = '3'
         |    THEN text || ' http://mirror.example.net and ' ||
         |         'https://site0.example.org/dup'
         |  ELSE text END AS text FROM documents),
         |urls AS (SELECT unnest(regexp_extract_all(text,
         |  '${TextOps.urlRegex}')) AS url FROM seeded)
         |SELECT regexp_replace(url, '^https?://', '') AS domain,
         |       count(*) AS n_urls
         |FROM urls GROUP BY domain
         |""".stripMargin))

  // ---- benchmark contamination screen --------------------------------------

  /** Benchmark shingles taken deterministically from doc 0's own text
    * (its first few 3-gram shingles), so the screen provably hits doc 0
    * plus any doc sharing those n-grams — an executable contamination
    * check with an exact oracle. */
  private val contamination: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      // 5 lexicographically-smallest shingles of doc 0 — sorted first
      // because DuckDB's list_distinct does NOT preserve occurrence
      // order, so any "first N" selection must be order-insensitive
      // headOption: a shingle-less doc 0 (null text — fuzz gate) means
      // an EMPTY benchmark, so nothing can be contaminated
      val bench = TextOps
        .withShingles(d.filter(col("doc_id") === 0), respread = false)
        .select(expr("slice(array_sort(sh), 1, 5)").as("b"))
        .collect().headOption.map(_.getSeq[String](0)).getOrElse(Seq.empty)
      TextOps.contamination(d, bench)
    },
    oracle = Some {
      // mirror: the 5 lexicographically-smallest shingles of doc 0
      s"""WITH $shingleCte,
         |bench AS (
         |  SELECT DISTINCT unnest(list_sort(sh)[1:5]) AS b
         |  FROM s WHERE doc_id = 0),
         |hits AS (
         |  SELECT doc_id, count(DISTINCT x.s) AS n_hits
         |  FROM (SELECT doc_id, unnest(sh) AS s FROM s) x
         |  JOIN bench ON x.s = bench.b
         |  GROUP BY doc_id)
         |SELECT doc_id, n_hits FROM hits WHERE n_hits > 0
         |""".stripMargin
    })

  // ---- document fingerprinting --------------------------------------------

  private val fingerprint: Q = Q(
    fn = (s, dir) => TextOps.fingerprint(docs(s, dir)),
    oracle = Some(
      """SELECT doc_id, md5(text) AS fp,
        |  md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp_norm
        |FROM documents
        |""".stripMargin))

  // ---- sequence packing (token-budget contiguous fill, sharded) ------------

  /** LLM-training sequence packing: each doc lands in a 512-token pack,
    * contiguous fill inside a deterministic md5 shard — 16 independent
    * windows so nothing serializes through one partition at 100 TB (a
    * global running sum would). pack = (shard, pack_in_shard). The shard
    * mod 16 equals the 6th md5 hex digit, which the oracle mirrors via
    * strpos — identical integer on both engines. */
  private val docPacking: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.text.TextOps.packSequences(
        docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        col("n_tokens"), budget = 512, numShards = 16)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |    (strpos('0123456789abcdef',
        |       substr(md5(cast(doc_id AS VARCHAR)), 6, 1)) - 1)::BIGINT
        |      AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, shard,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens, shard,
        |  floor((cum - n_tokens) / 512)::BIGINT AS pack_in_shard
        |FROM c
        |""".stripMargin))

  /** Concat-and-chunk (HF group_texts layout): per-shard concatenated
    * token stream cut into 512-token blocks; every doc's block span and
    * boundary-crossing flag value-checked via the same shard/window/floor
    * arithmetic as q_doc_packing. */
  private val concatChunkQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      // a null text is a ZERO-token doc (corpus accounting keeps the
      // row; packSequencesSplit's empty-chunk convention)
      graft.text.TextOps.concatChunk(
        docs(s, dir).select(col("doc_id"),
          coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
            .as("n_tokens")),
        col("n_tokens"), blockSize = 512, numShards = 16)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    coalesce(len(string_split(text, ' ')), 0)::BIGINT AS n_tokens,
        |    (strpos('0123456789abcdef',
        |       substr(md5(cast(doc_id AS VARCHAR)), 6, 1)) - 1)::BIGINT
        |      AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, shard,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t),
        |b AS (
        |  SELECT doc_id, n_tokens, shard,
        |    (cum - n_tokens)::BIGINT AS start_tok,
        |    floor((cum - n_tokens) / 512)::BIGINT AS first_block,
        |    CASE WHEN n_tokens = 0
        |         THEN floor((cum - n_tokens) / 512)::BIGINT
        |         ELSE floor((cum - 1) / 512)::BIGINT END AS last_block
        |  FROM c)
        |SELECT doc_id, n_tokens, shard, start_tok, first_block, last_block,
        |  last_block > first_block AS crosses_boundary
        |FROM b
        |""".stripMargin))

  /** Packing with a sequence-length ceiling: over-budget docs split into
    * ≤ maxSeqLen chunks before the shard fill (real LLM packing splits at
    * the model's sequence length). Oracle mirrors the chunk arithmetic —
    * explicit floor/least/greatest on both sides, shard = 6th md5 hex
    * digit (mod-16 of the first six). */
  private val docPackingSplit: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.text.TextOps.packSequencesSplit(
        docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        col("n_tokens"), budget = 512, maxSeqLen = 32, numShards = 16)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS doc_tokens
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, doc_tokens,
        |    unnest(generate_series(0,
        |      greatest(ceil(doc_tokens / 32.0)::BIGINT, 1) - 1)) AS chunk_idx
        |  FROM t),
        |c2 AS (
        |  SELECT doc_id, chunk_idx,
        |    least(32, doc_tokens - chunk_idx * 32)::BIGINT AS n_tokens,
        |    (strpos('0123456789abcdef',
        |       substr(md5(cast(doc_id AS VARCHAR) || '_'
        |         || cast(chunk_idx AS VARCHAR)), 6, 1)) - 1)::BIGINT AS shard
        |  FROM ch),
        |c3 AS (
        |  SELECT doc_id, chunk_idx, n_tokens, shard,
        |    sum(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY doc_id, chunk_idx) AS cum
        |  FROM c2)
        |SELECT doc_id, chunk_idx, n_tokens, shard,
        |  floor((cum - n_tokens) / 512)::BIGINT AS pack_in_shard
        |FROM c3
        |""".stripMargin))

  // ---- unigram logprob quality scoring (perplexity proxy) ------------------

  /** CCNet-style quality proxy: per-doc mean log10 unigram probability
    * against the corpus' own unigram LM (full vocab here = exact oracle
    * parity; production path caps + broadcasts the vocab). */
  private val unigramLp: Q = Q(
    fn = (s, dir) => graft.text.TextOps.unigramLogprob(
      docs(s, dir), vocabCap = None),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents),
        |tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        |vc AS (SELECT t, count(*)::DOUBLE AS c FROM tk GROUP BY t),
        |tot AS (SELECT sum(c) AS n FROM vc),
        |lp AS (SELECT t, log10(c / n) AS logp FROM vc, tot)
        |SELECT doc_id, round(avg(logp), 6) AS avg_logprob,
        |  count(*) AS n_tokens
        |FROM tk JOIN lp USING (t)
        |GROUP BY doc_id
        |""".stripMargin))

  // ---- token-budget top-mass selection -------------------------------------

  /** Histogram top-mass cut: keep the highest-stopword-ratio docs up to
    * a 15k-token budget via the two-pass bin selection (never a global
    * sort). Oracle replays binning, the descending cumulative, and the
    * suffix rule. */
  private val topMass: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val q = TextOps.quality(docs(s, dir))
        .select(col("doc_id"), col("stopword_ratio"), col("n_tokens"))
      TextOps.selectTopMass(q, col("stopword_ratio"), col("n_tokens"),
        budget = 15000L)
    },
    oracle = Some {
      val stopList = TextOps.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    round(len(list_filter(string_split(text, ' '),
         |        t -> t IN ($stopList)))::DOUBLE
         |      / len(string_split(text, ' ')), 6) AS score
         |  FROM documents),
         |d AS (SELECT doc_id,
         |  greatest(least(floor(score * 1000)::INT, 999), 0) AS bin,
         |  n_tokens FROM q
         |  WHERE score IS NOT NULL AND n_tokens IS NOT NULL),
         |b AS (SELECT bin, sum(n_tokens) AS tk FROM d GROUP BY bin),
         |c AS (SELECT bin, sum(tk) OVER (ORDER BY bin DESC) AS cum FROM b),
         |t AS (SELECT coalesce(min(bin), 2147483647) AS mk
         |      FROM c WHERE cum <= 15000)
         |SELECT doc_id, bin, n_tokens FROM d, t WHERE bin >= mk
         |""".stripMargin
    })

  // ---- winnowing fingerprints (MOSS) ---------------------------------------

  /** Winnowing k=4 w=4: every fingerprint value-checked — the oracle
    * recomputes the 8-hexdigit md5 gram hashes and the sliding-window
    * minima with the same arithmetic. */
  private val winnowQ: Q = {
    def hex8(e: String): String = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1)" +
        s" * (1::BIGINT << ${4 * (8 - i)})").mkString("(", " + ", ")")
    Q(
      fn = (s, dir) => TextOps.winnow(docs(s, dir), k = 4, w = 4),
      oracle = Some(
        s"""WITH base AS (
           |  SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '), t -> t <> '')
           |      AS toks
           |  FROM documents
           |  WHERE len(list_filter(string_split(lower(text), ' '),
           |    t -> t <> '')) > 0),
           |g AS (SELECT doc_id,
           |  CASE WHEN len(toks) >= 4 THEN
           |    list_transform(generate_series(1, len(toks) - 3), i ->
           |      ${hex8("array_to_string(list_slice(toks, i, i + 3), ' ')")})
           |  ELSE [${hex8("array_to_string(toks, ' ')")}] END AS gr
           |  FROM base),
           |f AS (SELECT doc_id,
           |  CASE WHEN len(gr) >= 4 THEN
           |    list_distinct(list_transform(generate_series(1, len(gr) - 3),
           |      j -> list_min(list_slice(gr, j, j + 3))))
           |  ELSE [list_min(gr)] END AS fps
           |  FROM g)
           |SELECT doc_id, unnest(fps) AS fp FROM f
           |""".stripMargin))
  }

  /** Winnow-pair overlap detection at k=3 w=3 (denser fingerprints so
    * the synthetic corpus yields real pairs), df-capped, value-checked
    * end to end: shared-fingerprint counts per doc pair. */
  private val winnowPairsQ: Q = {
    def hex8(e: String): String = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1)" +
        s" * (1::BIGINT << ${4 * (8 - i)})").mkString("(", " + ", ")")
    Q(
      fn = (s, dir) => TextOps.winnowPairs(docs(s, dir), k = 3, w = 3,
        minShared = 1, dfCap = 1000),
      oracle = Some(
        s"""WITH base AS (
           |  SELECT doc_id,
           |    list_filter(string_split(lower(text), ' '), t -> t <> '')
           |      AS toks
           |  FROM documents
           |  WHERE len(list_filter(string_split(lower(text), ' '),
           |    t -> t <> '')) > 0),
           |g AS (SELECT doc_id,
           |  CASE WHEN len(toks) >= 3 THEN
           |    list_transform(generate_series(1, len(toks) - 2), i ->
           |      ${hex8("array_to_string(list_slice(toks, i, i + 2), ' ')")})
           |  ELSE [${hex8("array_to_string(toks, ' ')")}] END AS gr
           |  FROM base),
           |f AS (SELECT doc_id,
           |  CASE WHEN len(gr) >= 3 THEN
           |    list_distinct(list_transform(generate_series(1, len(gr) - 2),
           |      j -> list_min(list_slice(gr, j, j + 2))))
           |  ELSE [list_min(gr)] END AS fps
           |  FROM g),
           |fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
           |byfp AS (SELECT fp, list_sort(list(doc_id)) AS ids
           |         FROM fp GROUP BY fp
           |         HAVING len(list(doc_id)) > 1
           |            AND len(list(doc_id)) <= 1000),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, f1.fp
           |      FROM fp a JOIN fp b
           |        ON a.fp = b.fp AND a.doc_id < b.doc_id
           |      JOIN byfp f1 ON f1.fp = a.fp)
           |SELECT doc_a, doc_b, count(*)::BIGINT AS n_shared
           |FROM p GROUP BY doc_a, doc_b
           |""".stripMargin))
  }

  // ---- URL canonicalization + canonical-URL dedup --------------------------

  /** Three fetch-variants per logical page (scheme/host case + default
    * port + trailing slash + utm tracking params) must collapse to ONE
    * canonical spelling with the min-doc_id keeper. The oracle replays
    * the same RE2 rewrite chain step for step. */
  private val urlCanonical: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val k = (col("doc_id") % 20).cast("string")
      val t = (col("doc_id") % 7).cast("string")
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://WWW.Site"), k, lit(".com/path")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("HTTPS://www.site"), k, lit(".COM:443/path/")))
        .otherwise(concat(lit("https://www.site"), k,
          lit(".com/path?utm_source=x&utm_id="), t))
      graft.text.TextOps.urlDedup(docs(s, dir).select(col("doc_id")), url)
    },
    oracle = Some(
      """WITH d AS (
        |  SELECT doc_id, doc_id % 20 AS k, doc_id % 7 AS t FROM documents),
        |u AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |         THEN 'https://WWW.Site' || k || '.com/path'
        |       WHEN doc_id % 3 = 1
        |         THEN 'HTTPS://www.site' || k || '.COM:443/path/'
        |       ELSE 'https://www.site' || k
        |         || '.com/path?utm_source=x&utm_id=' || t END AS url
        |  FROM d),
        |c AS (SELECT doc_id,
        |  lower(regexp_extract(url,
        |    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth0,
        |  regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest0
        |  FROM u),
        |c2 AS (SELECT doc_id, scheme,
        |  CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
        |       WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
        |       ELSE auth0 END AS auth,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(rest0, '#.*$', ''),
        |    '([?&])(utm_[^&]*&)+', '\1', 'g'),
        |    '[?&]utm_[^&]*$', ''),
        |    '\?$', ''),
        |    '/$', '') AS rest
        |  FROM c),
        |canon AS (SELECT doc_id, scheme || '://' || auth ||
        |  CASE WHEN rest = '' THEN '/' ELSE rest END AS canonical FROM c2)
        |SELECT canonical, count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS keep_doc
        |FROM canon GROUP BY canonical
        |""".stripMargin))

  // ---- hashing-trick features + quality classifier -------------------------

  /** Hashing-trick bag-of-ngrams (uni+bigram, 4096 buckets): fully
    * value-checked — the oracle re-derives each md5 bucket with the
    * 8-hexdigit positional arithmetic. */
  private val hashedNgrams: Q = Q(
    fn = (s, dir) => graft.text.QualityModel.hashedNgramFeatures(
      docs(s, dir), numBuckets = 4096),
    oracle = Some {
      val hexVal = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * " +
          s"(1::BIGINT << ${4 * (8 - i)})").mkString("(", "\n     + ", ")")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), t -> t <> '')
         |      AS toks
         |  FROM documents),
         |uni AS (SELECT doc_id, unnest(toks) AS g FROM base),
         |bx AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks) - 1)) AS i
         |  FROM base WHERE len(toks) >= 2),
         |bi AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g FROM bx),
         |grams AS (
         |  SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM bi),
         |h AS (SELECT doc_id, md5(g) AS m FROM grams)
         |SELECT doc_id,
         |  $hexVal % 4096 AS bucket,
         |  count(*)::BIGINT AS cnt
         |FROM h GROUP BY doc_id, bucket
         |""".stripMargin
    })

  /** Model-based quality filter contract: train the linear classifier on
    * the Gopher-rule weak label and score the corpus. The L-BFGS fit is
    * FP-order sensitive → boolean contract (like the k-means family):
    * full coverage, probabilities in range, and better-than-chance
    * separation of its own training labels (tolerant of a degenerate
    * single-class corpus). */
  private val qualityClassifier: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val d = docs(s, dir)
      val keep = TextOps.corpusFilter(d).select(col("doc_id"), col("keep"))
      val scored = graft.text.QualityModel.trainScore(
        d.join(keep, "doc_id"), col("keep")).cache()
      try {
        val n = scored.count()
        val nDocs = d.count()
        val outOfRange = scored.filter(col("quality_score") < 0.0 ||
          col("quality_score") > 1.0).count()
        val classes = scored.select("label").distinct().count()
        val aucOk =
          if (classes < 2) true
          else graft.text.QualityModel.aucOf(scored) >= 0.6
        Seq(
          ("full_coverage", if (n == nDocs) 1 else 0),
          ("scores_in_range", if (outOfRange == 0L) 1 else 0),
          ("separates_labels", if (aucOk) 1 else 0))
          .toDF("contract", "ok")
      } finally scored.unpersist(false)
    },
    oracle = Some(
      """SELECT 'full_coverage' AS contract, 1 AS ok
        |UNION ALL SELECT 'scores_in_range', 1
        |UNION ALL SELECT 'separates_labels', 1
        |""".stripMargin))

  // ---- Bloom-filter cross-batch dedup screen -------------------------------

  /** Membership screen contract: seen = even-id docs' fingerprints;
    * probing ALL docs must flag every even id (Bloom filters cannot
    * false-negative) and the odd-id false-positive rate must stay
    * within 5× the nominal 1% fpp. The filter bits are engine-internal,
    * so the cross-engine check is the contract, not the bitset. */
  private val bloomDedup: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      // ground truth is FINGERPRINT membership, not id parity: an
      // odd-id doc sharing its text with a seen even-id doc is a TRUE
      // positive (fuzz gate: duplicate-heavy fixtures read ~100% "fp
      // rate" under the parity proxy); null-text docs have no
      // fingerprint to screen
      val d = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      val seen = d.filter(col("doc_id") % 2 === 0)
      val truth = seen.select(col("fp").as("sfp")).distinct()
      val m = graft.text.BloomDedup
        .flagSeen(seen, d, "fp", expectedItems = 1L << 16, fpp = 0.01)
        .join(truth, col("fp") === col("sfp"), "left")
        .withColumn("in_seen", col("sfp").isNotNull)
        .agg(
          sum(when(col("in_seen") && !col("maybe_seen"), 1)
            .otherwise(0)).as("fn"),
          sum(when(!col("in_seen") && col("maybe_seen"), 1)
            .otherwise(0)).as("fp_cnt"),
          sum(when(!col("in_seen"), 1).otherwise(0)).as("neg"))
        .head()
      val fpRate = m.getLong(1).toDouble / math.max(m.getLong(2), 1L)
      Seq(
        ("no_false_negatives", if (m.getLong(0) == 0L) 1 else 0),
        ("fp_rate_bounded", if (fpRate <= 0.05) 1 else 0))
        .toDF("contract", "ok")
    },
    oracle = Some(
      """SELECT 'no_false_negatives' AS contract, 1 AS ok
        |UNION ALL SELECT 'fp_rate_bounded', 1
        |""".stripMargin))

  // ---- BM25 keyword relevance ----------------------------------------------

  /** BM25 of every doc against a fixed 4-term query, k1=1.2 b=0.75.
    * Oracle computes the same corpus stats and mirrors the scoring
    * formula term-by-term in the same left-to-right order (0.5 literals
    * forced to DOUBLE — DuckDB decimals must not enter the math). */
  private val bm25: Q = {
    val terms = Seq("spark", "join", "window", "hash")
    Q(
      fn = (s, dir) => TextOps.bm25(docs(s, dir), terms),
      oracle = Some {
        val dfCols = terms.zipWithIndex.map { case (t, i) =>
          s"    sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END)::BIGINT AS df_$i"
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
           |  FROM d)
           |SELECT doc_id, dl,
           |  round($scoreTerms, 6) AS bm25
           |FROM t, c
           |""".stripMargin
      })
  }

  // ---- bigram-interpolated logprob quality ---------------------------------

  /** Jelinek-Mercer bigram/unigram interpolated scorer (full vocab =
    * exact parity; production caps + broadcasts). Oracle builds the same
    * LM tables with the SAME division/interpolation operation order. */
  private val bigramLp: Q = Q(
    fn = (s, dir) => graft.text.TextOps.bigramLogprob(
      docs(s, dir), lambda = 0.8, vocabCap = None),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
        |  FROM documents),
        |tk AS (SELECT doc_id, unnest(toks) AS t FROM base),
        |uni AS (SELECT t, count(*)::DOUBLE AS cu FROM tk GROUP BY t),
        |tot AS (SELECT sum(cu) AS n FROM uni),
        |trx AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(1, len(toks) - 1)) AS i
        |  FROM base WHERE len(toks) >= 2),
        |tr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM trx),
        |big AS (SELECT w1, w2, count(*)::DOUBLE AS cb
        |        FROM tr GROUP BY w1, w2),
        |cond AS (SELECT w1, w2, cb / cu AS p_cond
        |         FROM big JOIN uni ON big.w1 = uni.t),
        |unip AS (SELECT t AS w2, cu / n AS p_uni FROM uni, tot)
        |SELECT doc_id,
        |  round(avg(log10(0.8 * p_cond + (1.0 - 0.8) * p_uni)), 6)
        |    AS avg_logprob,
        |  count(*) AS n_transitions
        |FROM tr JOIN cond USING (w1, w2) JOIN unip USING (w2)
        |GROUP BY doc_id
        |""".stripMargin))

  /** Interpolated Kneser-Ney bigram scoring (D=0.75): absolute discount +
    * continuation-count backoff, every per-doc mean log-prob value-checked
    * with the identical operation order in both engines. */
  private val knLp: Q = Q(
    fn = (s, dir) =>
      graft.text.TextOps.kneserNeyLogprob(docs(s, dir), discount = 0.75),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
        |  FROM documents),
        |trx AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(1, len(toks) - 1)) AS i
        |  FROM base WHERE len(toks) >= 2),
        |tr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM trx),
        |big AS (SELECT w1, w2, count(*)::DOUBLE AS cb
        |        FROM tr GROUP BY w1, w2),
        |ctx AS (SELECT w1, sum(cb) AS c1, count(*)::DOUBLE AS n1w1
        |        FROM big GROUP BY w1),
        |cont AS (SELECT w2, count(*)::DOUBLE AS n1w2 FROM big GROUP BY w2),
        |nt AS (SELECT count(*)::DOUBLE AS n_types FROM big)
        |SELECT doc_id,
        |  round(avg(log10(
        |    (greatest(coalesce(cb, 0.0) - 0.75, 0.0)
        |      + 0.75 * n1w1 * (n1w2 / n_types)) / c1)), 6) AS avg_logprob,
        |  count(*) AS n_transitions
        |FROM tr
        |LEFT JOIN big USING (w1, w2)
        |JOIN ctx USING (w1)
        |JOIN cont USING (w2)
        |CROSS JOIN nt
        |GROUP BY doc_id
        |""".stripMargin))

  // ---- corpus mixture weights ----------------------------------------------

  /** Per-source token shares + the resampling weight toward a uniform
    * mixture — the pre-sampling bookkeeping of a multi-source run. */
  private val mixture: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.text.TextOps.mixtureWeights(docs(s, dir),
        size(split(col("text"), " ")).cast("long"))
    },
    oracle = Some(
      """WITH per AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens)::DOUBLE AS n, count(*)::DOUBLE AS k
        |        FROM per)
        |SELECT source, n_docs, n_tokens,
        |  round(n_tokens / n, 6) AS token_share,
        |  round((1.0 / k) * n / n_tokens, 6) AS resample_weight
        |FROM per, tot
        |""".stripMargin))

  // ---- segment-level exact dedup (paragraph-dedup analog) ------------------

  /** CCNet/Dolma-style paragraph dedup over single-line docs: fixed
    * 20-token segments, global keep-first by (doc_id, seg_idx), docs
    * reassembled from surviving segments (possibly empty — rows never
    * vanish). Oracle mirrors the segmentation arithmetic and the
    * keep-first rule with a window rank. */
  private val segmentDedup: Q = Q(
    fn = (s, dir) => TextOps.segmentDedup(docs(s, dir), segLen = 20),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |seg AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      greatest(ceil(len(toks) / 20.0)::BIGINT, 1) - 1)) AS seg_idx
        |  FROM t),
        |s2 AS (
        |  SELECT doc_id, seg_idx,
        |    array_to_string(list_slice(toks,
        |      seg_idx * 20 + 1, seg_idx * 20 + 20), ' ') AS seg
        |  FROM seg),
        |r AS (
        |  SELECT doc_id, seg_idx, seg,
        |    row_number() OVER (PARTITION BY seg
        |      ORDER BY doc_id, seg_idx) AS rn
        |  FROM s2)
        |SELECT doc_id, count(*)::BIGINT AS n_segments,
        |  coalesce(sum(CASE WHEN rn = 1 THEN 1 END), 0)::BIGINT AS n_kept,
        |  coalesce(array_to_string(
        |    list(seg ORDER BY seg_idx) FILTER (WHERE rn = 1), ' '), '')
        |    AS text_dedup
        |FROM r GROUP BY doc_id
        |""".stripMargin))

  // ---- temperature-flattened mixture ---------------------------------------

  /** α=0.5 temperature sampling weights (XLM-R rule). Oracle mirrors the
    * share→pow→renormalize→ratio chain in the same operation order. */
  private val mixtureTemp: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.text.TextOps.mixtureTemperature(docs(s, dir),
        size(split(col("text"), " ")).cast("long"), alpha = 0.5)
    },
    oracle = Some(
      """WITH per AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |    n_tokens / sum(n_tokens) OVER () AS sh
        |  FROM per),
        |p AS (SELECT *, pow(sh, 0.5) AS pa FROM w),
        |t AS (SELECT *, pa / sum(pa) OVER () AS tgt FROM p)
        |SELECT source, n_docs, n_tokens,
        |  round(sh, 6) AS token_share,
        |  round(tgt, 6) AS target_share,
        |  round(tgt / sh, 6) AS resample_weight
        |FROM t
        |""".stripMargin))

  /** Intra-doc scope: only segments repeated WITHIN one document are
    * dropped (keep-first by seg_idx); cross-doc repeats survive. */
  private val segmentDedupDoc: Q = Q(
    fn = (s, dir) => TextOps.segmentDedup(docs(s, dir), segLen = 20,
      perDoc = true),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |seg AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      greatest(ceil(len(toks) / 20.0)::BIGINT, 1) - 1)) AS seg_idx
        |  FROM t),
        |s2 AS (
        |  SELECT doc_id, seg_idx,
        |    array_to_string(list_slice(toks,
        |      seg_idx * 20 + 1, seg_idx * 20 + 20), ' ') AS seg
        |  FROM seg),
        |r AS (
        |  SELECT doc_id, seg_idx, seg,
        |    row_number() OVER (PARTITION BY doc_id, seg
        |      ORDER BY seg_idx) AS rn
        |  FROM s2)
        |SELECT doc_id, count(*)::BIGINT AS n_segments,
        |  coalesce(sum(CASE WHEN rn = 1 THEN 1 END), 0)::BIGINT AS n_kept,
        |  coalesce(array_to_string(
        |    list(seg ORDER BY seg_idx) FILTER (WHERE rn = 1), ' '), '')
        |    AS text_dedup
        |FROM r GROUP BY doc_id
        |""".stripMargin))

  // ---- corpus filter (keep/drop decision with reason) ----------------------

  /** Gopher-style keep/drop per doc, first failing rule as the reason —
    * the decision stage over the row-local quality signals. */
  private val corpusFilter: Q = Q(
    fn = (s, dir) => TextOps.corpusFilter(docs(s, dir)),
    oracle = Some {
      val stopList = TextOps.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    length(regexp_replace(text, ' ', '', 'g'))::DOUBLE
         |      / len(string_split(text, ' ')) AS mean_tok_len,
         |    round(len(list_filter(string_split(text, ' '),
         |        t -> t IN ($stopList)))::DOUBLE
         |      / len(string_split(text, ' ')), 6) AS stopword_ratio
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    CASE WHEN n_tokens < 30 THEN 'too_short'
         |         WHEN mean_tok_len > 5.0 THEN 'long_tokens'
         |         WHEN stopword_ratio < 0.03 THEN 'low_stopwords'
         |         ELSE 'ok' END AS reason
         |  FROM q)
         |SELECT doc_id, reason,
         |  CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS keep
         |FROM r
         |""".stripMargin
    })

  // ---- shard manifest ------------------------------------------------------

  /** The shard-export manifest as a query: per md5-shard doc/token
    * counts, id range, and the order-independent content fingerprint
    * (sum of 60-bit md5 prefixes, exact via decimal/hugeint, compared as
    * a string). Value-checks the integrity math under ShardSink. */
  private val shardManifestQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.sources.ShardSink.manifestOf(
        docs(s, dir).withColumn("shard",
          graft.sources.ShardSink.shardCol(16)))
    },
    oracle = Some {
      val hv = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)::HUGEINT * " +
          s"(1::HUGEINT << ${4 * (15 - i)})").mkString("(", "\n     + ", ")")
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
         |      AS n_toks,
         |    (strpos('0123456789abcdef',
         |       substr(md5(cast(doc_id AS VARCHAR)), 6, 1)) - 1)::BIGINT
         |      AS shard,
         |    md5(cast(doc_id AS VARCHAR) || '|' || coalesce(text, ''))
         |      AS m
         |  FROM documents)
         |SELECT shard, count(*)::BIGINT AS n_docs,
         |  sum(n_toks)::BIGINT AS n_tokens,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         |  cast(sum($hv) AS VARCHAR) AS content_sum
         |FROM t GROUP BY shard
         |""".stripMargin
    })

  // ---- code-vs-prose detection ---------------------------------------------

  /** Code-likeness signals (punct/operator/identifier densities as exact
    * ppm integers) + the 2-of-3 vote — all value-checked. */
  private val codeSignalsQ: Q = Q(
    fn = (s, dir) => TextOps.codeSignals(docs(s, dir)),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    length(regexp_replace(text, '[^{}\[\]();]', '', 'g'))::BIGINT
        |      AS punct,
        |    length(text)::BIGINT AS n_chars,
        |    len(list_filter(toks, t -> list_contains(
        |      ['=', '==', '!=', '->', '=>', '::', '&&', '||', '+=', '-='],
        |      t)))::BIGINT AS op_tok,
        |    len(list_filter(toks,
        |      t -> regexp_matches(t, '^[a-z]+([A-Z][a-z0-9]*)+$')
        |        OR regexp_matches(t, '^[a-z0-9]+(_[a-z0-9]+)+$')))::BIGINT
        |      AS ident_tok,
        |    len(toks)::BIGINT AS n_toks
        |  FROM base),
        |p AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars > 0
        |         THEN floor(punct * 1000000 / n_chars)::BIGINT
        |         ELSE 0 END AS punct_ppm,
        |    CASE WHEN n_toks > 0
        |         THEN floor(op_tok * 1000000 / n_toks)::BIGINT
        |         ELSE 0 END AS op_ppm,
        |    CASE WHEN n_toks > 0
        |         THEN floor(ident_tok * 1000000 / n_toks)::BIGINT
        |         ELSE 0 END AS ident_ppm
        |  FROM m)
        |SELECT doc_id, punct_ppm, op_ppm, ident_ppm,
        |  ((CASE WHEN punct_ppm >= 20000 THEN 1 ELSE 0 END +
        |    CASE WHEN op_ppm >= 50000 THEN 1 ELSE 0 END +
        |    CASE WHEN ident_ppm >= 100000 THEN 1 ELSE 0 END) >= 2)
        |    AS is_code_like
        |FROM p
        |""".stripMargin))

  // ---- C4 blocklist filter -------------------------------------------------

  /** Blocklist screen with an auditable verdict: kept flag, which listed
    * words hit, how many tokens matched — all value-checked. */
  private val blocklistQ: Q = Q(
    fn = (s, dir) =>
      TextOps.blocklistFilter(docs(s, dir), Seq("slow", "merge", "window"))
        // the operator's array API → a flat CSV string for the compare
        // harness (array cells are unhashable in the driver's sort)
        .withColumn("hits", org.apache.spark.sql.functions.concat_ws(",",
          org.apache.spark.sql.functions.col("hits"))),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id,
        |    coalesce(list_filter(string_split(lower(text), ' '),
        |      t -> t <> ''), []) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(list_sort(list_intersect(list_distinct(toks),
        |    ['slow', 'merge', 'window']))) = 0 AS kept,
        |  coalesce(array_to_string(list_sort(list_intersect(
        |    list_distinct(toks), ['slow', 'merge', 'window'])), ','), '')
        |    AS hits,
        |  len(list_filter(toks,
        |    t -> list_contains(['slow', 'merge', 'window'], t)))::BIGINT
        |    AS n_hit_tokens
        |FROM base
        |""".stripMargin))

  // ---- corpus data card ----------------------------------------------------

  /** Per-source datasheet rollup: doc/token counts, length distribution,
    * dominant language + share. Every number value-checked. */
  private val dataCardQ: Q = Q(
    fn = (s, dir) => TextOps.dataCard(docs(s, dir)),
    oracle = Some(
      """WITH base AS (
        |  SELECT source, lang,
        |    len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT
        |      AS n_toks,
        |    n_chars
        |  FROM documents),
        |s1 AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(n_toks)::BIGINT AS n_tokens,
        |    min(n_toks) AS min_doc_tokens,
        |    max(n_toks) AS max_doc_tokens,
        |    round(avg(n_toks), 6) AS mean_doc_tokens,
        |    round(avg(n_chars), 6) AS mean_doc_chars
        |  FROM base GROUP BY source),
        |sl AS (SELECT source, lang, count(*)::BIGINT AS cnt
        |       FROM base GROUP BY source, lang),
        |s2 AS (
        |  SELECT source,
        |    first(lang ORDER BY cnt DESC, lang DESC) AS top_lang,
        |    first(cnt ORDER BY cnt DESC, lang DESC) AS top_lang_docs,
        |    count(DISTINCT lang)::BIGINT AS n_langs
        |  FROM sl GROUP BY source)
        |SELECT s1.source, n_docs, n_tokens, min_doc_tokens, max_doc_tokens,
        |  mean_doc_tokens, mean_doc_chars, top_lang, top_lang_docs, n_langs,
        |  round(top_lang_docs::DOUBLE / n_docs, 6) AS top_lang_share
        |FROM s1 JOIN s2 ON s1.source = s2.source
        |""".stripMargin))

  // ---- leakage-safe grouped split ------------------------------------------

  /** 80/10/10 split hashed on `source` — all docs of a source land in one
    * split (near-dup leakage guard). Bucket arithmetic value-checked via
    * the same md5 positional math as q_dsir. */
  private val groupedSplitQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      TextOps.groupedSplit(docs(s, dir), col("source"))
    },
    oracle = Some {
      val hexVal = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * " +
          s"(1::BIGINT << ${4 * (8 - i)})").mkString("(", "\n     + ", ")")
      s"""WITH h AS (SELECT doc_id, source, md5(source) AS m
         |           FROM documents),
         |b AS (SELECT doc_id, source AS grp, $hexVal % 10000 AS bucket
         |      FROM h)
         |SELECT doc_id, grp, bucket,
         |  CASE WHEN bucket < 8000 THEN 'train'
         |       WHEN bucket < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b
         |""".stripMargin
    })

  // ---- full Gopher repetition suite ----------------------------------------

  /** Top-{2,3,4}-gram char fraction + duplicated-{5..10}-gram char
    * coverage per doc (Rae et al. 2021 Table A1) — every fraction
    * value-checked; the oracle mirrors the gram hashing, lexicographic
    * most-frequent tie-break and positional coverage union. */
  private val gopherRep: Q = Q(
    fn = (s, dir) => TextOps.gopherRepetition(docs(s, dir)),
    oracle = Some {
      val topNs = 2 to 4
      val dupNs = 5 to 10
      def wCte(n: Int) =
        s"""w$n AS (SELECT doc_id, i,
           |  md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
           |    AS h,
           |  list_sum(list_transform(list_slice(toks, i, i + ${n - 1}),
           |    t -> length(t)))::BIGINT AS gc
           |  FROM b2, unnest(generate_series(1, len(toks) - ${n - 1})) u(i)
           |  WHERE len(toks) >= $n),
           |g$n AS (SELECT doc_id, h, count(*)::BIGINT AS cnt, max(gc) AS gc
           |        FROM w$n GROUP BY doc_id, h)""".stripMargin
      val tCtes = topNs.map(n =>
        s"""t$n AS (SELECT doc_id,
           |  first(cnt * gc ORDER BY cnt DESC, gc DESC, h DESC) AS mass
           |  FROM g$n GROUP BY doc_id)""".stripMargin)
      val cCtes = dupNs.map(n =>
        s"""c$n AS (SELECT w.doc_id, list_sort(list(w.i)) AS starts
           |  FROM w$n w JOIN g$n g
           |    ON w.doc_id = g.doc_id AND w.h = g.h AND g.cnt >= 2
           |  GROUP BY w.doc_id)""".stripMargin)
      val topSel = topNs.map(n =>
        s"""  CASE WHEN tot_chars > 0 THEN
           |    round(coalesce(t$n.mass, 0)::DOUBLE / tot_chars, 6)
           |  ELSE 0.0 END AS top_${n}gram_frac""".stripMargin)
      val dupSel = dupNs.map(n =>
        s"""  CASE WHEN tot_chars > 0 THEN round(coalesce(list_sum(
           |    list_transform(list_filter(generate_series(1, len(b.toks)),
           |      j -> len(list_filter(coalesce(c$n.starts, []),
           |             i -> i <= j AND j < i + $n)) > 0),
           |      j -> length(b.toks[j]))), 0)::DOUBLE / tot_chars, 6)
           |  ELSE 0.0 END AS dup_${n}gram_frac""".stripMargin)
      val joins = (topNs.map(n => s"LEFT JOIN t$n USING (doc_id)") ++
        dupNs.map(n => s"LEFT JOIN c$n USING (doc_id)")).mkString("\n")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), t -> t <> '')
         |      AS toks
         |  FROM documents),
         |b2 AS (SELECT doc_id, toks,
         |  coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
         |    ::BIGINT AS tot_chars FROM base),
         |${(topNs ++ dupNs).map(wCte).mkString(",\n")},
         |${tCtes.mkString(",\n")},
         |${cCtes.mkString(",\n")}
         |SELECT b.doc_id,
         |${(topSel ++ dupSel).mkString(",\n")}
         |FROM b2 b
         |$joins
         |""".stripMargin
    })

  // ---- exact-substring duplicated-span scrub (Lee et al. 2021) -------------

  /** Cross-doc repeated 8-token spans removed from every doc but the
    * first (min doc_id) occurrence; docs rebuilt from surviving tokens.
    * Every rebuilt string and removal count is value-checked — the oracle
    * mirrors the window-hash, keep-first and coverage arithmetic. */
  private val spanScrub: Q = Q(
    fn = (s, dir) => TextOps.scrubDupSpans(docs(s, dir), k = 8),
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
        |d AS (SELECT h, min(doc_id) AS min_doc FROM w GROUP BY h
        |      HAVING min(doc_id) <> max(doc_id)),
        |cov AS (SELECT w.doc_id, list_sort(list(w.i)) AS starts
        |        FROM w JOIN d USING (h) WHERE w.doc_id <> d.min_doc
        |        GROUP BY w.doc_id),
        |r AS (
        |  SELECT b.doc_id, b.toks, coalesce(c.starts, []) AS st,
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

  // ---- benchmark decontamination scrub -------------------------------------

  /** Docs 0-9 act as the "benchmark"; every 8-token span of the remaining
    * corpus matching a bench window verbatim is cut out and the doc
    * rebuilt. All rebuilt strings and counts value-checked. */
  private val decontaminateQ: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      TextOps.decontaminate(d.filter(col("doc_id") >= 10),
        d.filter(col("doc_id") < 10), k = 8)
    },
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
        |bh AS (SELECT DISTINCT h FROM w WHERE doc_id < 10),
        |cov AS (SELECT w.doc_id, list_sort(list(w.i)) AS starts
        |        FROM w JOIN bh USING (h) WHERE w.doc_id >= 10
        |        GROUP BY w.doc_id),
        |r AS (
        |  SELECT b.doc_id, b.toks,
        |    list_filter(generate_series(1, len(b.toks)),
        |      j -> len(list_filter(coalesce(c.starts, []),
        |             i -> i <= j AND j < i + 8)) = 0) AS kept
        |  FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id
        |  WHERE b.doc_id >= 10)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  len(toks) - len(kept) AS n_removed,
        |  coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '),
        |    '') AS scrubbed_text
        |FROM r
        |""".stripMargin))

  // ---- DSIR importance weights (target-domain selection) -------------------

  /** DSIR log importance weights with source='src0' as the target domain:
    * every bucket count, the Laplace-smoothed log-ratio, and the per-doc
    * weighted sum are value-checked cross-engine (same md5 positional
    * arithmetic as q_hashed_ngrams). */
  private val dsir: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.text.Dsir.importanceWeights(docs(s, dir),
        col("source") === "src0")
    },
    oracle = Some {
      val hexVal = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * " +
          s"(1::BIGINT << ${4 * (8 - i)})").mkString("(", "\n     + ", ")")
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(lower(text), ' '), t -> t <> '')
         |      AS toks
         |  FROM documents),
         |uni AS (SELECT doc_id, source, unnest(toks) AS g FROM base),
         |bx AS (
         |  SELECT doc_id, source, toks,
         |    unnest(generate_series(1, len(toks) - 1)) AS i
         |  FROM base WHERE len(toks) >= 2),
         |bi AS (SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS g
         |       FROM bx),
         |grams AS (
         |  SELECT doc_id, source, g FROM uni
         |  UNION ALL SELECT doc_id, source, g FROM bi),
         |h AS (SELECT doc_id, source, $hexVal % 4096 AS bucket
         |      FROM (SELECT doc_id, source, md5(g) AS m FROM grams)),
         |f AS (SELECT doc_id, source, bucket, count(*)::BIGINT AS cnt
         |      FROM h GROUP BY doc_id, source, bucket),
         |rc AS (SELECT bucket, sum(cnt) AS cr FROM f GROUP BY bucket),
         |tc AS (SELECT bucket, sum(cnt) AS ct FROM f
         |       WHERE source = 'src0' GROUP BY bucket),
         |tot AS (SELECT (SELECT sum(cr) FROM rc) AS tr,
         |               (SELECT coalesce(sum(ct), 0) FROM tc) AS tt),
         |lam AS (
         |  SELECT rc.bucket,
         |    log10((coalesce(tc.ct, 0) + 1)::DOUBLE / (tt + 4096))
         |      - log10((rc.cr + 1)::DOUBLE / (tr + 4096)) AS lam
         |  FROM rc LEFT JOIN tc USING (bucket), tot)
         |SELECT f.doc_id,
         |  round(sum(f.cnt * lam.lam), 6) AS dsir_logw,
         |  sum(f.cnt)::BIGINT AS n_grams,
         |  round(sum(f.cnt * lam.lam), 6) > 0 AS kept
         |FROM f JOIN lam USING (bucket) GROUP BY f.doc_id
         |""".stripMargin
    })

  // ---- C4-style per-domain quality cap -------------------------------------

  /** Top-25 docs per source-domain by stopword-ratio quality, via the
    * bounded TopKAgg (domains × k rows shuffled — a head domain never
    * serializes through one window task). Oracle = the row_number window
    * the aggregator is contractually equal to. */
  private val domainTopK: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val q = TextOps.quality(docs(s, dir))
      // scoreless (null-text) docs can't be ranked (fuzz gate)
      val withSrc = docs(s, dir).select(col("doc_id"), col("source"))
        .join(q.select(col("doc_id"), col("stopword_ratio")), "doc_id")
        .filter(col("stopword_ratio").isNotNull)
      TextOps.domainTopK(withSrc, col("source"), col("stopword_ratio"), 25)
    },
    oracle = Some {
      val stopList = TextOps.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    round(len(list_filter(string_split(text, ' '),
         |        t -> t IN ($stopList)))::DOUBLE
         |      / len(string_split(text, ' ')), 6) AS s
         |  FROM documents),
         |r AS (SELECT doc_id, source, s,
         |  row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id)
         |    AS rank
         |  FROM q WHERE s IS NOT NULL)
         |SELECT source AS domain, rank, doc_id, s AS score
         |FROM r WHERE rank <= 25
         |""".stripMargin
    })

  // ---- encoding health (ftfy-style triage) ---------------------------------

  /** Mojibake/control-char triage over a deterministically corrupted copy
    * (docs with id % 7 = 0 get one U+FFFD and one BEL appended) — both
    * engines corrupt identically, then count by char-class strip. */
  private val encodingQuality: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val corrupted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit("\uFFFD\u0007")))
          .otherwise(col("text")).as("text"))
      TextOps.encodingQuality(corrupted)
    },
    oracle = Some(
      """WITH c AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || chr(65533) || chr(7)
        |         ELSE text END AS text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    (length(text) - length(replace(text, chr(65533), '')))::BIGINT
        |      AS n_replacement,
        |    (length(text) - length(regexp_replace(text,
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')))::BIGINT
        |      AS n_control,
        |    length(text)::BIGINT AS n_chars
        |  FROM c)
        |SELECT doc_id, n_replacement, n_control, n_chars,
        |  round((n_replacement + n_control) / n_chars::DOUBLE, 6)
        |    AS bad_ratio,
        |  coalesce((n_replacement + n_control) / n_chars::DOUBLE <= 0.01,
        |    TRUE) AS is_clean
        |FROM m
        |""".stripMargin))

  // ---- CCNet head/middle/tail perplexity buckets ---------------------------

  /** Tercile cut of the unigram-LM doc scores (exact quantile + full
    * vocab at test scale for oracle parity; accuracy and vocabCap are the
    * production knobs). */
  private val pplBuckets: Q = Q(
    fn = (s, dir) => TextOps.pplBuckets(docs(s, dir), vocabCap = None,
      accuracy = Int.MaxValue),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents),
        |tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        |vc AS (SELECT t, count(*)::DOUBLE AS c FROM tk GROUP BY t),
        |tot AS (SELECT sum(c) AS n FROM vc),
        |lp AS (SELECT t, log10(c / n) AS logp FROM vc, tot),
        |sc AS (
        |  SELECT doc_id, round(avg(logp), 6) AS avg_logprob,
        |    count(*) AS n_tokens
        |  FROM tk JOIN lp USING (t) GROUP BY doc_id),
        |cut AS (
        |  SELECT quantile_disc(avg_logprob, 1.0/3) AS b1,
        |         quantile_disc(avg_logprob, 2.0/3) AS b2
        |  FROM sc)
        |SELECT doc_id, avg_logprob, n_tokens,
        |  CASE WHEN avg_logprob >= b2 THEN 'head'
        |       WHEN avg_logprob >= b1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc, cut
        |""".stripMargin))

  // ---- corpus snapshot diff (recrawl bookkeeping) --------------------------

  /** Snapshot diff: next = prev minus ids ≡9 (mod 10), ids ≡0 edited,
    * plus fresh ids ≡5 offset by 10⁶. The Spark side full-outer-joins on
    * content hash; the oracle derives the expected statuses INDEPENDENTLY
    * from the id arithmetic — a stronger check than mirroring the join. */
  private val snapshotDiff: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 10 =!= 9)
        .select(col("doc_id"),
          // coalesce: a null-text doc must still CHANGE when edited
          // (concat(NULL, ...) is NULL = "not changed at all")
          when(col("doc_id") % 10 === 0,
            concat(coalesce(col("text"), lit("")), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 1000000).as("doc_id"),
            lit("added doc").as("text")))
      TextOps.snapshotDiff(d, next)
    },
    oracle = Some(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 9 THEN 'deleted'
        |       WHEN doc_id % 10 = 0 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id, 'added' AS status
        |FROM documents WHERE doc_id % 10 = 5
        |""".stripMargin))

  /** Deflate-compressibility signal — values are deflate-implementation
    * bound (not SQL-reproducible), so the oracle checks invariants:
    * corpus coverage (value-checked count + byte total), every ratio
    * positive and bounded, and the planted contract that a highly
    * repetitive payload compresses strictly better than the corpus
    * median doc. */
  private lazy val compressRatioQ: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, sum}
      val d = TextOps.compressibility(docs(s, dir)).cache()
      try {
        val n = d.count()
        val byteTotal = d.agg(sum("n_bytes")).head().getLong(0)
        // the ratio bound is meaningful once deflate's fixed header
        // amortizes — a 1-byte doc "compresses" to 9 bytes (9e6 ppm)
        // without anything being wrong (fuzz gate, edge mode)
        val bad = d.filter(col("n_bytes") >= 64 &&
          (col("n_compressed") <= 0 ||
            col("ratio_ppm") <= 0 || col("ratio_ppm") > 2000000L)).count()
        // planted contract: "ab" * 2000 must compress below every real
        // doc's ratio percentile — repetition detection actually fires
        val repeated = ("ab" * 2000)
        val plantedRatio = TextOps.compressibility(
          Seq((999999999L, repeated)).toDF("doc_id", "text"))
          .head().getAs[Long]("ratio_ppm")
        val medianRatio = d.stat.approxQuantile("ratio_ppm",
          Array(0.5), 0.0).head
        Seq(
          ("n_docs", n, 1L),
          ("bytes_total", byteTotal, 1L),
          ("ratios_bounded", bad, if (bad == 0L) 1L else 0L),
          ("planted_repetition_detected", 0L,
            if (plantedRatio < medianRatio / 2) 1L else 0L))
          .toDF("metric", "value", "ok")
      } finally d.unpersist(false)
    },
    oracle = Some(
      """SELECT 'n_docs' AS metric, count(*)::BIGINT AS value,
        |  1::BIGINT AS ok FROM documents
        |UNION ALL
        |SELECT 'bytes_total',
        |  sum(octet_length(encode(text)))::BIGINT, 1 FROM documents
        |UNION ALL SELECT 'ratios_bounded', 0, 1
        |UNION ALL SELECT 'planted_repetition_detected', 0, 1
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_dsir"           -> dsir,
    "q_span_scrub"     -> spanScrub,
    "q_decontaminate"  -> decontaminateQ,
    "q_gopher_rep"     -> gopherRep,
    "q_grouped_split"  -> groupedSplitQ,
    "q_data_card"      -> dataCardQ,
    "q_blocklist"      -> blocklistQ,
    "q_compress_ratio" -> compressRatioQ,
    "q_code_signals"   -> codeSignalsQ,
    "q_shard_manifest" -> shardManifestQ,
    "q_domain_topk"    -> domainTopK,
    "q_encoding_quality" -> encodingQuality,
    "q_ppl_buckets"    -> pplBuckets,
    "q_snapshot_diff"  -> snapshotDiff,
    "q_doc_packing"    -> docPacking,
    "q_doc_packing_split" -> docPackingSplit,
    "q_concat_chunk"   -> concatChunkQ,
    "q_unigram_logprob" -> unigramLp,
    "q_mixture_weights" -> mixture,
    "q_corpus_filter"  -> corpusFilter,
    "q_segment_dedup"  -> segmentDedup,
    "q_segment_dedup_doc" -> segmentDedupDoc,
    "q_bigram_logprob" -> bigramLp,
    "q_kn_logprob"     -> knLp,
    "q_bm25"           -> bm25,
    "q_bloom_dedup"    -> bloomDedup,
    "q_mixture_temperature" -> mixtureTemp,
    "q_hashed_ngrams"  -> hashedNgrams,
    "q_url_canonical"  -> urlCanonical,
    "q_winnow"         -> winnowQ,
    "q_winnow_pairs"   -> winnowPairsQ,
    "q_top_mass"       -> topMass,
    "q_quality_classifier" -> qualityClassifier,
    "q_minhash"       -> minhash,
    "q_lsh_pairs"     -> lshPairs,
    "q_dedup_apply"   -> dedupApply,
    "q_dedup_cc"      -> dedupCc,
    "q_dedup_keep_best" -> dedupKeepBestQ,
    "q_lsh_quality"   -> lshQualityQ,
    "q_incremental_dedup" -> incrementalDedupQ,
    "q_stream_dedup_ingest" -> streamDedupIngestQ,
    "q_stream_dedup_intra" -> streamDedupIntraQ,
    "q_stream_dedup_retract" -> streamDedupRetractQ,
    "q_dedup_cc_iter" -> dedupCcIter,
    "q_stratified_sample" -> stratifiedSample,
    "q_minhash_est"   -> minhashJaccardEst,
    "q_url_domains"   -> urlDomains,
    "q_contamination" -> contamination,
    "q_ngram_jaccard" -> jaccard,
    "q_simhash"       -> simhash,
    "q_simhash_pairs" -> simhashPairsQ,
    "q_pii_scrub"     -> piiScrub,
    "q_repetition"    -> repetition,
    "q_lang_id"       -> langId,
    "q_quality"       -> quality,
    "q_fingerprint"   -> fingerprint,
    "q_zipf_stats"    -> zipfStats,
  )

  /** Vocabulary diagnostics: vocab size, hapax share, top-100 head mass,
    * Zipf slope (OLS of ln freq on ln rank over the head). Head cut is a
    * bounded distributed top-k with a md5-id tie-break the oracle
    * replays; OLS margin vs the 1e-6 rounding is ~7 orders, so the
    * distributed-sum FP order cannot flip the compare. */
  private lazy val zipfStats: Q = Q(
    fn = (s, dir) => TextOps.zipfStats(docs(s, dir), topK = 100),
    oracle = Some(
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |tok AS (SELECT t FROM toks WHERE len(t) > 0),
        |counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        |g AS (SELECT count(*) AS vocab_size, sum(c)::BIGINT AS total_tokens,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_count
        |  FROM counts),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC,
        |    ('0x' || substr(md5(t), 1, 15))::BIGINT ASC) AS rank
        |  FROM counts QUALIFY rank <= 100),
        |o AS (SELECT count(*)::DOUBLE AS k,
        |  sum(ln(rank)) AS sx, sum(ln(c)) AS sy,
        |  sum(ln(rank) * ln(c)) AS sxy, sum(ln(rank) * ln(rank)) AS sxx,
        |  sum(c)::BIGINT AS top_c FROM ranked)
        |SELECT vocab_size, total_tokens, hapax_count,
        |  round(hapax_count::DOUBLE / vocab_size, 6) AS hapax_frac,
        |  round(top_c::DOUBLE / total_tokens, 6) AS top_mass,
        |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope
        |FROM g, o
        |""".stripMargin))
}
