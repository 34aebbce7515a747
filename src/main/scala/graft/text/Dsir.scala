package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram bag is under a TARGET (in-domain) distribution than under
  * the RAW corpus distribution, log w(x) = Σ_g [log p_t(bucket(g)) −
  * log p_r(bucket(g))], then keep/resample by that weight. This is the
  * principled replacement for binary quality classifiers when the goal is
  * "make the corpus look like the target domain".
  *
  * Scale shape: both bucket models ride the hashing trick
  * ([[QualityModel.hashedNgramFeatures]] — fixed `numBuckets`-dim space,
  * no vocabulary table), so the model side is TWO map-side-combined
  * groupBys ending in ≤ numBuckets rows; the log-ratio table λ is a few
  * KB, broadcast; scoring is one narrow join plus a doc-keyed partial
  * aggregation. Nothing anywhere is proportional to corpus size except
  * the single token scan.
  */
object Dsir {

  /** (doc_id, dsir_logw, n_grams, kept) for every raw doc with ≥1 token.
    * `isTarget` marks the in-domain exemplar slice inside `raw`;
    * smoothing is add-one over the bucket domain. `kept` thresholds the
    * ROUNDED weight so the decision is engine-exact. */
  def importanceWeights(raw: DataFrame, isTarget: Column,
                        numBuckets: Int = 4096,
                        threshold: Double = 0.0): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val feats = QualityModel.hashedNgramFeatures(raw, numBuckets)
    // ONE bucket model pass for BOTH distributions: attach the target
    // flag (id-keyed join, ids+flag only) and dual-sum per bucket, then
    // collect the ≤ numBuckets bucket table once — totals and λ are
    // driver math, with no lineage-recomputing scalar actions. The gram
    // stream is materialized twice total (model pass + scoring pass),
    // down from ~5 scans in the separate-raw/target formulation.
    val flags = raw.select(col("doc_id"), isTarget.as("is_t"))
    val buckets = feats.join(flags, "doc_id")
      .groupBy("bucket")
      .agg(sum("cnt").as("cr"),
        sum(when(col("is_t"), col("cnt")).otherwise(0L)).as("ct"))
      .as[(Long, Long, Long)].collect()
    val totR = buckets.map(_._2).sum
    val totT = buckets.map(_._3).sum
    val lam = buckets.toSeq.map { case (bucket, cr, ct) =>
      (bucket,
        math.log10((ct + 1).toDouble / (totT + numBuckets)) -
          math.log10((cr + 1).toDouble / (totR + numBuckets)))
    }.toDF("bucket", "lam")
    // λ is ≤ numBuckets rows — unconditionally broadcastable
    feats.join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(round(sum(col("cnt") * col("lam")), 6).as("dsir_logw"),
        sum("cnt").as("n_grams"))
      .withColumn("kept", col("dsir_logw") > threshold)
  }
}
