package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the engine's replacement for the reference's
  * hand-rolled 300-way group-key salting (`AddColumnNumUDF.java:146`,
  * SURVEY §4): a pathologically skewed join key is split at RUNTIME by
  * adaptive execution, no salting code anywhere. Thresholds are lowered so
  * the effect is observable at test scale. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // 200k rows on ONE key + a uniform tail; right side small but
    // non-broadcastable by conf
    val left = s.range(200000).select(lit(1L).as("k"),
        col("id").cast("double").as("x"))
      .union(s.range(5000).select((col("id") % 100 + 2).as("k"),
        col("id").cast("double").as("x")))
    val right = s.range(101).select((col("id") + 1).as("k"),
      (col("id") * 10).as("y"))
    val joined = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    // collect() drives THIS queryExecution (head() would plan a separate
    // limited query), so executedPlan below is the adaptive FINAL plan
    val row = joined.collect().head
    assert(row.getLong(0) === 205000L)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$finalPlan")
  }
}
