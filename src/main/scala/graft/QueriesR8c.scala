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

  val all: Map[String, Q] = Map(
    "q_hll_distinct" -> hllDistinct,
  )
}
