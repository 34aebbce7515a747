package graft

import org.apache.spark.sql.functions._

import graft.ops.StatsPipeline

/** The `shifu stats` catalog itself as an oracle-verified result set: one
  * row per candidate column with the ColumnStats fields the reference
  * persists to ColumnConfig.json (`container/obj/ColumnStats.java:37-142`)
  * — moments, missing counts, and the KS/IV metrics from the per-bin
  * vectors. Exercises `StatsPipeline.profileNumeric` end to end (both
  * scans + driver `StatsMath`), catalog-out. */
object QueriesCatalog {
  import QueryUtil._

  private val cols = Seq("l_quantity", "l_discount", "l_tax")

  private val catalogStats: Q = Q(
    fn = (s, dir) => {
      val profiles = StatsPipeline.profileNumeric(li(s, dir), cols, isPos)
      import s.implicits._
      cols.map { c =>
        val p = profiles(c)
        val st = p.stats
        (p.columnName, st.totalCount, st.missingCount,
          st.min.get, st.max.get,
          math.rint(st.mean.get * 1e6) / 1e6,
          math.rint(st.stdDev.get * 1e6) / 1e6,
          math.rint(st.ks.get * 1e6) / 1e6,
          math.rint(st.iv.get * 1e6) / 1e6,
          p.binning.binBoundary.length.toLong)
      }.toDF("column_name", "total_cnt", "missing_cnt", "min_v", "max_v",
        "mean_v", "std_v", "ks", "iv", "n_bins")
    },
    oracle = Some {
      val k = binK
      val per = cols.map { c =>
        val arms = (1 until k).reverse
          .map(i => s"WHEN $c >= mn + (mx - mn) * $i / $k THEN $i")
          .mkString(" ")
        s"""SELECT '$c' AS column_name, total_cnt, missing_cnt, min_v, max_v,
           |  mean_v, std_v, ks, iv, n_bins FROM (
           |WITH a AS (
           |  SELECT count($c) AS cnt,
           |    sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS miss,
           |    sum($c) AS s1, sum($c * $c) AS s2,
           |    min($c) AS mn, max($c) AS mx
           |  FROM lineitem),
           |b AS (
           |  SELECT CASE WHEN $c IS NULL THEN $k $arms ELSE 0 END AS bin_id,
           |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
           |  FROM lineitem, a),
           |bins AS (
           |  SELECT bin_id, sum(pos)::DOUBLE AS cp,
           |    (count(*) - sum(pos))::DOUBLE AS cn
           |  FROM b GROUP BY bin_id),
           |tot AS (SELECT sum(cp) AS sp, sum(cn) AS sn FROM bins),
           |r AS (
           |  SELECT bin_id, cp / sp AS p, cn / sn AS n,
           |    sum(cp / sp) OVER (ORDER BY bin_id) AS cump,
           |    sum(cn / sn) OVER (ORDER BY bin_id) AS cumn
           |  FROM bins, tot),
           |m AS (
           |  SELECT round(100 * max(abs(cump - cumn)), 6) AS ks,
           |    round(sum((p - n) * ln((p + 1e-10) / (n + 1e-10))), 6) AS iv
           |  FROM r)
           |SELECT cnt + miss AS total_cnt, miss AS missing_cnt,
           |  mn AS min_v, mx AS max_v,
           |  round(s1 / cnt, 6) AS mean_v,
           |  round(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 6) AS std_v,
           |  ks, iv, ${k}::BIGINT AS n_bins
           |FROM a, m)""".stripMargin
      }.mkString("\nUNION ALL\n")
      per + "\n"
    })

  val all: Map[String, Q] = Map("q_catalog_stats" -> catalogStats)
}
