package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats

/** Mergeable quantile sketches (Greenwald–Khanna, via Spark's own
  * `QuantileSummaries` — the engine `percentile_approx`/`approxQuantile`
  * run on) with a stable text serialization.
  *
  * This is the piece that closes the ONE honest gap in the incremental
  * catalog path: a finalized catalog keeps median/p25/p75 as plain
  * numbers, which do not merge — so [[StatsMerge.merge]] surrenders them.
  * Persist each partition's SKETCH alongside its catalog and quantiles
  * survive any merge tree: sketches merge associatively with the same
  * ε-guarantee (|rank error| ≤ ε·n) as a single-pass build.
  *
  * Scale shape: one scan builds sketches for ALL requested columns at
  * once — per-partition inserts, then a treeReduce of compressed
  * summaries; each summary is O(1/ε · log(εn)) samples, so the driver
  * receives kilobytes per column regardless of row count (the same
  * contract as the engine's internal percentile aggregation).
  */
object QuantileSketch {

  val DefaultRelativeError = 0.001

  /** One scan → a sketch per column. Nulls and NaNs are skipped (the
    * same convention as the stats pipeline's percentile aggregate). */
  def buildFor(df: DataFrame, cols: Seq[String],
               relativeError: Double = DefaultRelativeError)
      : Map[String, QuantileSummaries] = {
    require(cols.nonEmpty, "need at least one column")
    require(relativeError > 0, s"relativeError must be > 0")
    val n = cols.length
    val rows = df.select(cols.map(c =>
      org.apache.spark.sql.functions.col(c).cast("double")): _*)
    val re = relativeError
    val merged = rows.rdd
      .mapPartitions { it =>
        val sums = Array.fill(n)(new QuantileSummaries(
          QuantileSummaries.defaultCompressThreshold, re))
        it.foreach { r =>
          var i = 0
          while (i < n) {
            if (!r.isNullAt(i)) {
              val v = r.getDouble(i)
              if (!v.isNaN) sums(i) = sums(i).insert(v)
            }
            i += 1
          }
        }
        Iterator.single(sums.map(_.compress()))
      }
      .treeReduce { (a, b) =>
        a.zip(b).map { case (x, y) => x.merge(y) }
      }
    cols.zip(merged).toMap
  }

  /** Quantile lookup; None on an empty sketch. */
  def quantile(q: QuantileSummaries, prob: Double): Option[Double] =
    q.query(prob)

  /** Stable text form: `count|relativeError|v:g:d,v:g:d,...` — survives
    * a JSON string field or a sidecar file; `deserialize` reconstructs a
    * query- and merge-ready summary. */
  def serialize(q: QuantileSummaries): String = {
    val c = q.compress()
    s"${c.count}|${c.relativeError}|" +
      c.sampled.map(s => s"${s.value}:${s.g}:${s.delta}").mkString(",")
  }

  def deserialize(s: String): QuantileSummaries = {
    val parts = s.split("\\|", 3)
    require(parts.length == 3, s"malformed sketch: '$s'")
    val count = parts(0).toLong
    val re = parts(1).toDouble
    val sampled =
      if (parts(2).isEmpty) Array.empty[Stats]
      else parts(2).split(",").map { t =>
        val Array(v, g, d) = t.split(":")
        Stats(v.toDouble, g.toLong, d.toLong)
      }
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, re,
      sampled, count, true)
  }

  /** [[StatsMerge.merge]] plus sketch-backed quantiles: the merged
    * profile carries median/p25/p75 from the MERGED sketch instead of
    * surrendering them. Returns the merged sketch too so a catalog
    * chain (day 1 ⊕ day 2 ⊕ …) stays incremental. */
  def mergeWithSketches(a: graft.catalog.ColumnProfile,
                        b: graft.catalog.ColumnProfile,
                        sa: QuantileSummaries, sb: QuantileSummaries)
      : (graft.catalog.ColumnProfile, QuantileSummaries) = {
    val merged = StatsMerge.merge(a, b)
    val sketch = sa.compress().merge(sb.compress())
    val withQ = merged.copy(stats = merged.stats.copy(
      p25 = sketch.query(0.25),
      median = sketch.query(0.5),
      p75 = sketch.query(0.75)))
    (withQ, sketch)
  }
}
