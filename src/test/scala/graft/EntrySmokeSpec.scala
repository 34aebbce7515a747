package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke over the driver contract at sf0.001. */
class EntrySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly oracle-free") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("a sample of queries runs at sf0.001") {
    Seq("q_stats_moments", "q_confusion_sweep", "q_minhash", "q_join_enrich")
      .foreach { name =>
        assert(SparkEntry.queries(name)(spark, dir).count() > 0, name)
      }
  }
}
