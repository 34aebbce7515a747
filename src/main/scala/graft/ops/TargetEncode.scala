package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Out-of-fold smoothed mean target encoding — the leakage-protected
  * categorical encoder (Micci-Barreca, SIGKDD Expl. 2001 smoothing; the
  * out-of-fold discipline is standard competition/production practice).
  * WOE (the reference's encoder, `Normalize.woe`) folds each row's OWN
  * target into its encoding — fine for frozen-catalog scoring, but a
  * leak when the encoding feeds a trainer on the same rows. Here row r
  * in fold f is encoded from the target mass of every OTHER fold:
  *
  *   enc(cat, f) = (posAll(cat) − posFold(cat, f) + prior·m)
  *               / (cntAll(cat) − cntFold(cat, f) + m)
  *
  * with `prior` the global positive rate and `m` the smoothing
  * pseudo-count (unseen / thin categories shrink toward the prior).
  *
  * Scale shape: ONE groupBy over (category, fold) — partial-aggregated,
  * the exchange moves |cats|·folds rows regardless of corpus size — a
  * driver-free rollup to per-category totals, and a size-gated broadcast
  * join back. Folds hash deterministically from a caller-supplied key
  * (md5 positional math), so the assignment is reproducible at any
  * parallelism and in the DuckDB oracle. All mass arithmetic runs on
  * 0/1 longs — exact sums, no FP-order nondeterminism.
  */
object TargetEncode {

  /** `df` plus `fold` and `enc` columns. `target` must evaluate to 0/1;
    * `key` is the deterministic row identity the fold hashes from. */
  def oofMean(df: DataFrame, cat: Column, target: Column, key: Column,
              folds: Int = 5, smoothing: Double = 20.0): DataFrame = {
    require(folds >= 2, s"need >= 2 folds, got $folds")
    require(smoothing > 0, s"smoothing must be > 0: $smoothing")
    val fold = pmod(
      conv(substring(md5(key.cast("string").cast("binary")), 1, 8),
        16, 10).cast("long"), lit(folds.toLong))
    val rows = df.withColumn("__cat", cat.cast("string"))
      .withColumn("fold", fold)
      .withColumn("__t", target.cast("long"))
    val g = rows.agg(sum("__t").as("p"), count(lit(1)).as("n")).head()
    val prior = g.getLong(0).toDouble / g.getLong(1)
    // coalesce: a (cat, fold) cell whose EVERY target is NULL sums to
    // NULL, which would poison enc for the cell and silently fall back
    // to the prior — a null target carries zero positive mass but the
    // row still counts (r16 fuzz, skew x nulls: a collapsed hot key put
    // an entire cell behind one null-flag slice)
    val perFold = rows.groupBy("__cat", "fold")
      .agg(coalesce(sum("__t"), lit(0L)).as("fold_pos"),
        count(lit(1)).as("fold_n"))
    // per-category totals from the already-tiny fold table
    val perCat = perFold.groupBy("__cat")
      .agg(sum("fold_pos").as("all_pos"), sum("fold_n").as("all_n"))
    val encMap = perFold.join(perCat, "__cat")
      .withColumn("enc",
        (col("all_pos") - col("fold_pos") + lit(prior * smoothing)) /
          (col("all_n") - col("fold_n") + lit(smoothing)))
      .select("__cat", "fold", "enc")
    rows
      .join(PlanHints.gatedBroadcast(encMap), Seq("__cat", "fold"), "left")
      .withColumn("enc", coalesce(col("enc"), lit(prior)))
      .drop("__cat", "__t")
  }
}
