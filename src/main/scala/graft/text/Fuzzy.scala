package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching via symmetric-delete banding (the SymSpell
  * candidate rule): two strings are within edit distance 1 iff their
  * {self} ∪ {all 1-deletions} variant sets intersect — substitution at
  * position i makes both share the delete-at-i variant, insertion makes
  * the shorter string itself a variant of the longer. So candidate
  * generation is a narrow (L+1)-way explode + ONE hash-bucket groupBy on
  * the variant, and only in-bucket pairs pay the exact `levenshtein`
  * verification — the same bucket-then-confirm discipline as MinHash-LSH
  * and the hyperplane ANN, transplanted to typo/entity resolution.
  * An all-pairs formulation would be a cross join (10⁸ distinct terms →
  * 10¹⁶ comparisons); this shuffles terms × (L+1) short strings.
  */
object Fuzzy {

  /** Undirected (a < b) pairs of `termCol` values within edit distance 1.
    * `bucketCap` drops pathological variant buckets (a hub variant like a
    * very common 3-char stem would emit ~|bucket|²/2 pairs) — the same
    * df-cap skew guard as the shingle path; sized so normal vocabularies
    * never hit it. */
  def editDistance1Pairs(terms: DataFrame, termCol: String = "t",
                         bucketCap: Int = 1000): DataFrame = {
    val variants = terms.select(col(termCol).as("t"))
      .select(col("t"), explode(expr(
        """array_union(array(t),
          |  transform(sequence(1, length(t)),
          |    i -> concat(substring(t, 1, i - 1),
          |                substring(t, i + 1, length(t) - i))))"""
          .stripMargin)).as("v"))
    // explicit-width bucket shuffle: the stage reading this exchange
    // carries the pair fan-out + levenshtein filter, which AQE
    // coalescing would otherwise serialize (interleaved A/B r16: ~3x
    // on q_fuzzy_join) — see Spread.fanoutExchange
    graft.ops.Spread.fanoutExchange(variants, Seq(col("v")))
      .groupBy("v")
      .agg(array_sort(collect_set(col("t"))).as("ts"))
      .filter(size(col("ts")) > 1 && size(col("ts")) <= bucketCap)
      .select(explode(expr(
        """flatten(transform(ts, x ->
          |  filter(transform(ts, y -> struct(x AS a, y AS b)),
          |         p -> p.a < p.b)))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
      .filter(levenshtein(col("a"), col("b")) <= 1)
  }
}
