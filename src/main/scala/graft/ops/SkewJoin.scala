package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for EXTREME build-side-replicable key skew.
  *
  * The reference spreads skewed group keys with a random 0-299 salt
  * (`udf/AddColumnNumUDF.java:146`, `StatsSpdtI.pig:57`); the engine
  * normally leaves join skew to AQE's runtime split
  * (`spark.sql.adaptive.skewJoin` — AqeSkewJoinSpec proves it fires).
  * AQE splits a skewed PARTITION, but a single hot KEY still lands every
  * one of its rows in one task when the other side can't broadcast.
  * Salting is the remaining tool: replicate each dim row S ways, salt
  * each fact row into one of the S replicas — the hot key's rows spread
  * over S tasks, at the price of an S× dim-side blowup (use only when
  * dim is small relative to the skew, yet too big / too mid-plan to
  * broadcast).
  *
  * The salt is `pmod(rand, S)` per fact row: which replica a row joins
  * has NO effect on the join result (every replica carries the full dim
  * row), so result equality with the plain join is exact regardless of
  * the random draw — q_salted_join value-checks that.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted S ways. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt >= 1, s"salt=$salt")
    val saltedFact = fact.withColumn("__salt",
      pmod((rand(7L) * salt).cast("int"), lit(salt)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
