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
    val feats = QualityModel.hashedNgramFeatures(raw, numBuckets)
    val tfeats = QualityModel.hashedNgramFeatures(
      raw.filter(isTarget), numBuckets)
    val rawCnt = feats.groupBy("bucket").agg(sum("cnt").as("cr"))
    val tgtCnt = tfeats.groupBy("bucket").agg(sum("cnt").as("ct"))
    val totR = rawCnt.agg(coalesce(sum("cr"), lit(0L))).head().getLong(0)
    val totT = tgtCnt.agg(coalesce(sum("ct"), lit(0L))).head().getLong(0)
    val lam = rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .select(col("bucket"),
        (log10((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          lit((totT + numBuckets).toDouble)) -
          log10((col("cr") + 1).cast("double") /
            lit((totR + numBuckets).toDouble))).as("lam"))
    // λ is ≤ numBuckets rows — unconditionally broadcastable
    feats.join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(round(sum(col("cnt") * col("lam")), 6).as("dsir_logw"),
        sum("cnt").as("n_grams"))
      .withColumn("kept", col("dsir_logw") > threshold)
  }
}
