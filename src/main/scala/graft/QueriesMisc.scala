package graft

import org.apache.spark.sql.functions._

/** Joins, set ops, sorts/top-k, repartition, time/string utilities,
  * multimodal image decode (SURVEY §2.1, §2.5, §2.6, §2.8, §2.9). */
object QueriesMisc {
  import QueryUtil._

  // ---- §2.5 multi-way join with broadcast dims -----------------------------

  private val joinEnrich: Q = Q(
    fn = (s, dir) => {
      val l = li(s, dir)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      // dims are orders-of-magnitude smaller than lineitem: broadcast all
      // three so the fact table never shuffles
      l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        // exact integer-scaled revenue (QueryUtil.revenueExact): a
        // double-sum's rounded last digit is summation-order-sensitive
        // at .005 boundaries — r16 fuzz flipped this very query
        .agg(QueryUtil.revenueExact(QueryUtil.scoreTenthMilsCol)
            .as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"))
    },
    oracle = Some(
      s"""SELECT n_name, ${QueryUtil.revenueExactSql} AS revenue,
         |  count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |""".stripMargin))

  // ---- §2.5 semi / anti joins ----------------------------------------------

  private val semiAnti: Q = Q(
    fn = (s, dir) => {
      val l = li(s, dir)
      val bigOrders = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 150000)
      val semi = l.join(broadcast(bigOrders), l("l_orderkey") ===
        bigOrders("o_orderkey"), "left_semi").count()
      val anti = l.join(broadcast(bigOrders), l("l_orderkey") ===
        bigOrders("o_orderkey"), "left_anti").count()
      import s.implicits._
      Seq((semi, anti)).toDF("n_semi", "n_anti")
    },
    oracle = Some(
      """SELECT
        |  (SELECT count(*) FROM lineitem WHERE EXISTS (
        |     SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
        |       AND o_totalprice > 150000)) AS n_semi,
        |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        |     SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
        |       AND o_totalprice > 150000)) AS n_anti
        |""".stripMargin))

  // ---- §2.6 global top-N ---------------------------------------------------

  private val topN: Q = Q(
    fn = (s, dir) => li(s, dir)
      .orderBy(scoreCol.desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(scoreCol, 4).as("score")),
    oracle = Some(
      s"""SELECT l_orderkey, l_linenumber, round($scoreSql, 4) AS score
         |FROM lineitem
         |ORDER BY $scoreSql DESC, l_orderkey, l_linenumber
         |LIMIT 20
         |""".stripMargin))

  // ---- §2.6 exact frequent items (top-3 per column) ------------------------

  private val freqItems: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val stacked = d.select(expr(
        "stack(2, 'l_returnflag', l_returnflag, 'l_linestatus', l_linestatus)" +
          " as (col_name, v)"))
      val counts = stacked.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("col_name").orderBy(col("n").desc, col("v").asc)
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("col_name", "rnk", "v", "n")
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT 'l_returnflag' AS col_name, l_returnflag AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem),
        |c AS (SELECT col_name, v, count(*) AS n FROM u GROUP BY 1, 2),
        |r AS (SELECT col_name, v, n, row_number() OVER (
        |        PARTITION BY col_name ORDER BY n DESC, v) AS rnk FROM c)
        |SELECT col_name, rnk, v, n FROM r WHERE rnk <= 3
        |""".stripMargin))

  // ---- §2.5 union of eval sets ---------------------------------------------

  private val unionSets: Q = Q(
    fn = (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val setA = o.filter(col("o_orderstatus") === "F")
        .withColumn("eval_set", lit("setA"))
      val setB = o.filter(col("o_totalprice") > 200000)
        .withColumn("eval_set", lit("setB"))
      setA.unionByName(setB)
        .groupBy("eval_set")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT 'setA' AS eval_set, o_totalprice FROM orders
        |  WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'setB', o_totalprice FROM orders WHERE o_totalprice > 200000)
        |SELECT eval_set, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM u GROUP BY eval_set
        |""".stripMargin))

  // ---- §2.9 random shuffle / repartition -----------------------------------

  private val shuffleRepartition: Q = Q(
    fn = (s, dir) => {
      // the reference's `norm -shuffle` re-spreads output files
      // (core/shuffle/MapReduceShuffle.java:40-100): repartition + verify
      // content is preserved by aggregating after the shuffle
      val d = li(s, dir).repartition(64)
      d.agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 4).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },
    oracle = Some(
      """SELECT count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |""".stripMargin))

  // ---- §2.8 date → unix time (ConvertToUnixTimeUDF) ------------------------

  private val unixTime: Q = Q(
    fn = (s, dir) => li(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        // l_shipdate is TIMESTAMP_NTZ; session TZ is UTC so the cast
        // interprets the wall clock as UTC — matching DuckDB's naive epoch
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms")),
    oracle = Some(
      """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS ship_ms
        |FROM lineitem
        |""".stripMargin))

  // ---- §2.8 log concat / split round trip ----------------------------------

  private val concatSplit: Q = Q(
    fn = (s, dir) => {
      // the operator under test is the concat/split string plumbing —
      // the NUMBER is serialized via %.2f of a ±1e12-clamped value
      // because raw double→string casts pick engine-specific scientific
      // thresholds ('1.0E300' vs '1e+300') and %.2f of huge doubles
      // prints Java's shortest-repr digits vs C's exact binary
      // expansion (fuzz gate); nulls map to '' explicitly (concat_ws
      // SKIPS nulls, DuckDB's || propagates them — both wrong here)
      val c = lit(1e12)
      val q = col("l_quantity")
      val qc = when(q > c, c).when(q < -c, -c).otherwise(q)
      val qs = when(q.isNull, lit("")).otherwise(format_string("%.2f", qc))
      li(s, dir)
        .withColumn("log_line", concat_ws("|",
          col("l_orderkey").cast("string"),
          coalesce(col("l_returnflag"), lit("")),
          coalesce(col("l_linestatus"), lit("")), qs))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("log_line"),
          size(split(col("log_line"), "\\|")).as("n_fields"),
          split(col("log_line"), "\\|").getItem(1).as("field_2"))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber,
        |    cast(l_orderkey AS VARCHAR) || '|'
        |      || coalesce(l_returnflag, '') || '|'
        |      || coalesce(l_linestatus, '') || '|'
        |      || coalesce(printf('%.2f',
        |           CASE WHEN l_quantity > 1e12 THEN 1e12
        |                WHEN l_quantity < -1e12 THEN -1e12
        |                ELSE l_quantity END), '')
        |      AS log_line
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, log_line,
        |  len(string_split(log_line, '|')) AS n_fields,
        |  string_split(log_line, '|')[2] AS field_2
        |FROM t
        |""".stripMargin))

  // ---- multimodal: opaque binary columns + REAL image decode --------------

  private val multimodal: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      // real multimodal column: each doc carries an opaque binary payload
      // — a deterministic solid-gray PNG whose dims/level derive from
      // doc_id — decoded back by the production javax.imageio path
      // (ImageOps.decodeImages, JDK-only). PNG is lossless, so the oracle
      // can recompute the decoded dims/mean-luma arithmetically.
      val payloads = docs(s, dir)
        .select(col("doc_id").cast("long"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = 4 + (id % 13).toInt
            val h = 4 + (id % 7).toInt
            (id, graft.media.ImageOps.syntheticPng(w, h, (id % 256).toInt))
          }
        }
        .toDF("doc_id", "payload")
      graft.media.ImageOps.decodeImages(payloads)
    },
    oracle = Some(
      """SELECT doc_id, 4 + doc_id % 13 AS width, 4 + doc_id % 7 AS height,
        |  (doc_id % 256)::DOUBLE AS mean_luma, TRUE AS decode_ok
        |FROM documents
        |""".stripMargin))

  /** Perceptual image fingerprint: deterministic 8×8 pattern PNG per doc
    * (pixels arithmetic in `doc_id / 10` — duplicate groups of exactly
    * 10 docs at EVERY scale factor, so band buckets never cross the
    * hot-bucket cap and pair counts stay linear in the corpus),
    * hashed through the REAL decode+aHash path; the oracle recomputes the
    * 64 threshold bits arithmetically (integer 64·v ≥ Σv compare, bit 63
    * via the two's-complement weight, same trick as the SimHash CTE). */
  private val imagePhash: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir).select(col("doc_id").cast("long"))
        .as[Long]
        .mapPartitions(_.map(id =>
          (id, graft.media.ImageOps.patternPng(id / 10))))
        .toDF("doc_id", "payload")
      graft.media.ImageOps.aHash64(payloads)
    },
    oracle = Some(
      """WITH px AS (
        |  SELECT doc_id, xs.x AS x, ys.y AS y,
        |    ((doc_id // 10) * 31 + xs.x * 7 + ys.y * 13) % 256 AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 7)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |t AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
        |b AS (
        |  SELECT p.doc_id,
        |    CAST(sum(CASE WHEN 64 * p.v >= t.sv THEN
        |      CASE WHEN p.y * 8 + p.x = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << (p.y * 8 + p.x)) END
        |      ELSE 0 END) AS BIGINT) AS phash
        |  FROM px p JOIN t USING (doc_id)
        |  GROUP BY p.doc_id)
        |SELECT doc_id, phash, TRUE AS decode_ok FROM b
        |""".stripMargin))

  /** Image dedup end-to-end: aHash → EXACT-duplicate clusters by direct
    * phash grouping. At hamming 0 equal hashes ARE the cluster, so the
    * right plan is one groupBy — no pair expansion (quadratic in group
    * size), no band buckets, no hot-bucket cap to mirror; the banded
    * hamming path ([[graft.media.ImageOps.imageNearDupPairs]]) is for
    * genuine near-dups and is spec-covered. Oracle groups the
    * arithmetically-recomputed phash (NOT the plant key), so accidental
    * aHash collisions across pattern groups stay parity-exact. */
  private val imageDedup: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir).select(col("doc_id").cast("long"))
        .as[Long]
        .mapPartitions(_.map(id =>
          (id, graft.media.ImageOps.patternPng(id / 10))))
        .toDF("doc_id", "payload")
      val hashed = graft.media.ImageOps.aHash64(payloads)
        .filter(col("decode_ok"))
      val groups = hashed.groupBy("phash")
        .agg(min("doc_id").as("cluster"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
      hashed.join(groups, "phash").select(col("doc_id"), col("cluster"))
    },
    oracle = Some(
      """WITH px AS (
        |  SELECT doc_id, xs.x AS x, ys.y AS y,
        |    ((doc_id // 10) * 31 + xs.x * 7 + ys.y * 13) % 256 AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 7)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |t AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
        |b AS (
        |  SELECT p.doc_id,
        |    CAST(sum(CASE WHEN 64 * p.v >= t.sv THEN
        |      CASE WHEN p.y * 8 + p.x = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << (p.y * 8 + p.x)) END
        |      ELSE 0 END) AS BIGINT) AS phash
        |  FROM px p JOIN t USING (doc_id)
        |  GROUP BY p.doc_id),
        |g AS (SELECT phash, min(doc_id) AS cluster, count(*) AS n
        |      FROM b GROUP BY phash)
        |SELECT b.doc_id, g.cluster
        |FROM b JOIN g USING (phash) WHERE g.n > 1
        |""".stripMargin))

  // ---- multimodal: frame-sampling over opaque payloads ---------------------

  /** The frame-sample plumbing for video/audio payloads: chunk the opaque
    * payload into fixed 32-byte "frames", keep every 4th (stride sampling),
    * fingerprint each — schema/partitioning/batch shape are the real
    * pipeline; the codec is the deterministic chunker (no media libs in
    * this container). */
  private val frameSample: Q = Q(
    fn = (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          // empty docs have NO frames: Spark's sequence(0, -1) counts
          // DOWN to [0, -1] instead of being empty (fuzz gate)
          posexplode(expr(
            """CASE WHEN length(text) > 0 THEN transform(
              |  sequence(0, cast(ceil(length(text) / 32.0) AS int) - 1),
              |  i -> substr(text, i * 32 + 1, 32))
              |ELSE cast(array() AS array<string>) END""".stripMargin))
            .as(Seq("frame_idx", "frame")))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"),
          md5(col("frame").cast("binary")).as("frame_md5")),
    oracle = Some(
      """SELECT doc_id, f.i AS frame_idx,
        |  length(substr(text, (f.i * 32 + 1)::INT, 32)) AS frame_len,
        |  md5(substr(text, (f.i * 32 + 1)::INT, 32)) AS frame_md5
        |FROM documents,
        |  LATERAL (SELECT unnest(generate_series(0,
        |    ceil(length(text) / 32.0)::BIGINT - 1)) AS i) f
        |WHERE f.i % 4 = 0
        |""".stripMargin))

  // ---- multimodal: REAL audio decode (javax.sound WAV) ---------------------

  /** Audio twin of q_multimodal: each doc carries a deterministic PCM16
    * mono WAV whose rate/length/samples derive from doc_id, decoded back
    * by the production javax.sound path (AudioOps.decodeAudio, JDK-only).
    * WAV is lossless, so every decoded number — rate, frames, duration,
    * mean |amplitude| — is re-derived arithmetically by the oracle. */
  private val audioMeta: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 8 + (id % 5).toInt
            val rate = 8000 + 1000 * (id % 3).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7) % 65536) - 32768).toShort)
            (id, graft.media.AudioOps.syntheticWav(rate, samples))
          }
        }
        .toDF("doc_id", "payload")
      graft.media.AudioOps.decodeAudio(payloads)
    },
    oracle = Some(
      """WITH p AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS n,
        |    8000 + 1000 * (doc_id % 3) AS rate
        |  FROM documents),
        |v AS (
        |  SELECT p.doc_id, p.n, p.rate,
        |    abs((p.doc_id * 31 + f.i * 7) % 65536 - 32768) AS a
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, p.n - 1)) AS i) f)
        |SELECT doc_id, rate::BIGINT AS sample_rate, 1::BIGINT AS channels,
        |  n::BIGINT AS n_frames,
        |  n::DOUBLE / rate AS duration_sec,
        |  sum(a)::DOUBLE / count(*) AS mean_abs_amp,
        |  TRUE AS decode_ok
        |FROM v GROUP BY doc_id, rate, n
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_audio_meta"    -> audioMeta,
    "q_frame_sample"  -> frameSample,
    "q_join_enrich"   -> joinEnrich,
    "q_semi_anti"     -> semiAnti,
    "q_topn"          -> topN,
    "q_freq_items"    -> freqItems,
    "q_union_sets"    -> unionSets,
    "q_shuffle"       -> shuffleRepartition,
    "q_unixtime"      -> unixTime,
    "q_concat_split"  -> concatSplit,
    "q_multimodal"    -> multimodal,
    "q_image_phash"   -> imagePhash,
    "q_image_dedup"   -> imageDedup,
    "q_image_resize"  -> imageResize,
    "q_audio_vad"     -> audioVad,
    "q_audio_resample" -> audioResample,
  )

  /** Stride-decimation resample through real WAV decode: kept-sample
    * energy and positional checksum pin every 3rd sample cross-engine. */
  private lazy val audioResample: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 8 + (id % 5).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7) % 65536) - 32768).toShort)
            (id, graft.media.AudioOps.syntheticWav(8000, samples))
          }
        }
        .toDF("doc_id", "payload")
      graft.media.AudioOps.decimate(payloads, factor = 3)
    },
    oracle = Some(
      """WITH p AS (SELECT doc_id, 8 + doc_id % 5 AS n FROM documents),
        |v AS (
        |  SELECT p.doc_id, p.n, f.i,
        |    abs((p.doc_id * 31 + f.i * 7) % 65536 - 32768) AS a
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, p.n - 1)) AS i) f
        |  WHERE f.i % 3 = 0)
        |SELECT doc_id, 8000 AS src_rate, 2666 AS out_rate,
        |  any_value(n)::BIGINT AS n_in, count(*)::BIGINT AS n_out,
        |  sum(a)::BIGINT AS out_energy,
        |  sum(a * (i // 3 + 1))::BIGINT AS out_checksum,
        |  TRUE AS decode_ok
        |FROM v GROUP BY doc_id
        |""".stripMargin))

  /** Audio activity (VAD/silence-trim) windows over real WAV decode:
    * deterministic PCM payloads, pure-integer window activity compare —
    * every count/energy/boundary value-checked arithmetically. */
  private lazy val audioVad: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 8 + (id % 5).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7) % 65536) - 32768).toShort)
            (id, graft.media.AudioOps.syntheticWav(8000, samples))
          }
        }
        .toDF("doc_id", "payload")
      graft.media.AudioOps.activityWindows(payloads)
    },
    oracle = Some(
      """WITH p AS (SELECT doc_id, 8 + doc_id % 5 AS n FROM documents),
        |v AS (
        |  SELECT p.doc_id, p.n, f.i // 4 AS w,
        |    abs((p.doc_id * 31 + f.i * 7) % 65536 - 32768) AS a
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, p.n - 1)) AS i) f),
        |wins AS (SELECT doc_id, any_value(n) AS n, w, sum(a) AS sa,
        |           count(*) AS c FROM v GROUP BY doc_id, w),
        |act AS (SELECT doc_id, n, w, sa, c,
        |    CASE WHEN sa >= 8192 * c THEN 1 ELSE 0 END AS active
        |  FROM wins)
        |SELECT doc_id, any_value(n)::BIGINT AS n_samples,
        |  count(*)::BIGINT AS n_windows,
        |  sum(active)::BIGINT AS n_active,
        |  sum(sa)::BIGINT AS energy_sum,
        |  coalesce(min(CASE WHEN active = 1 THEN w END), -1)::BIGINT
        |    AS first_active,
        |  coalesce(max(CASE WHEN active = 1 THEN w END), -1)::BIGINT
        |    AS last_active,
        |  TRUE AS decode_ok
        |FROM act GROUP BY doc_id
        |""".stripMargin))

  /** Multimodal RESIZE step: 16×8 deterministic pattern PNGs through the
    * real decode + box-filter downsample to 4×4
    * ([[graft.media.ImageOps.resizeBox]] — our own raster loop, not
    * Graphics2D, so every pooled cell is arithmetic in doc_id and the
    * positional checksum pins all 16 cells cross-engine). */
  private lazy val imageResize: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, dir).select(col("doc_id").cast("long"))
        .as[Long]
        .mapPartitions(_.map(id =>
          (id, graft.media.ImageOps.pngOf(16, 8, (x, y) => {
            val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
            (v << 16) | (v << 8) | v
          }))))
        .toDF("doc_id", "payload")
      graft.media.ImageOps.resizeBox(payloads, tw = 4, th = 4)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(
      """WITH px AS (
        |  SELECT doc_id, xs.x AS x, ys.y AS y,
        |    (doc_id * 31 + xs.x * 7 + ys.y * 13) % 256 AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 15)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |cells AS (
        |  SELECT doc_id, x // 4 AS cx, y // 2 AS cy,
        |    CAST(floor(sum(v) / count(*)) AS BIGINT) AS p
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id, 16 AS src_w, 8 AS src_h, 4 AS thumb_w, 4 AS thumb_h,
        |  sum(p)::BIGINT AS luma_sum, min(p) AS luma_min, max(p) AS luma_max,
        |  sum(p * (cy * 4 + cx + 1))::BIGINT AS checksum,
        |  TRUE AS decode_ok
        |FROM cells GROUP BY doc_id
        |""".stripMargin))
}
