package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): for a
  * shuffle join on NON-partitioned data, a selective dim-side filter
  * should inject a bloom filter built from the dim keys and probe it
  * at the fact scan — the row-level sibling of DPP (DppSpec) and the
  * engine's free semi-join pushdown at 100 TB. */
class RuntimeBloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selective dim filter injects a runtime bloom filter into the " +
    "fact-side scan of a shuffle join") {
    val factDir = java.nio.file.Files.createTempDirectory("rbf").toString
    val dimDir = java.nio.file.Files.createTempDirectory("rbfdim").toString
    (0 until 200000).map(i => (i.toLong, i.toLong % 1000))
      .toDF("id", "k").write.mode("overwrite").parquet(factDir)
    (0 until 1000).map(i => (i.toLong, s"name$i"))
      .toDF("k", "name").write.mode("overwrite").parquet(dimDir)
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get(
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtimeFilter.number.threshold" ->
        spark.conf.get("spark.sql.optimizer.runtimeFilter.number.threshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      // force a shuffle join (no broadcast): the bloom filter is the only
      // way dim selectivity can reach the fact scan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      // the default 10GB application-side threshold assumes cluster scale;
      // drop it so the 200k-row local fixture qualifies
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "1KB")
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir)
        .filter(col("name") === "name7") // 1 of 1000 keys survives
      val joined = fact.join(dim, Seq("k"))
      assert(joined.count() === 200L)
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") ||
        plan.contains("bloom_filter_agg"),
        s"optimized plan should probe an injected bloom filter:\n" +
          plan.take(2500))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
