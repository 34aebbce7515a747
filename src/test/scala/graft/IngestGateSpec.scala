package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion-dedup gate (StreamOps.ingestBatch): cross-batch
  * verdicts and the foreachBatch retry-idempotency contract. */
class IngestGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def decisions(outDir: String) =
    spark.read.parquet(outDir)
      .select("doc_id", "dup_exact", "dup_near", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))

  test("batch 0 admits everything; a later batch flags exact and " +
    "near duplicates of anything previously seen") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gate1").toString
    val b0 = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "completely different text about distributed query engines")
    graft.streaming.StreamOps.ingestBatch(b0, 0L, s"$tmp/idx", s"$tmp/out")
    assert(decisions(s"$tmp/out").toSet === Set(
      (1L, false, false, true), (2L, false, false, true)))
    val b1 = docs(
      3L -> "the quick brown fox jumps over the lazy dog today", // = doc 1
      4L -> "an entirely novel document with its own words only")
    graft.streaming.StreamOps.ingestBatch(b1, 1L, s"$tmp/idx", s"$tmp/out")
    val d = decisions(s"$tmp/out").toSet
    // identical text: exact dup AND band-identical near dup
    assert(d.contains((3L, true, true, false)))
    assert(d.contains((4L, false, false, true)))
    assert(d.size === 4)
  }

  test("intraBatch=true applies keep-first-by-doc_id WITHIN a batch — " +
    "default mode admits within-batch duplicates, intra mode flags all " +
    "but the smallest doc_id, and retry idempotency still holds") {
    val sharedA = "twin document text repeated inside one micro batch"
    val sharedB = "twin document text repeated inside one micro batch too"
    val batch = docs(
      7L -> sharedA, // intra-exact dup of 5 (and near: identical bands)
      5L -> sharedA, // smallest holder of sharedA — survives
      6L -> sharedB, // near-dup of 5/7 (one shingle off -> shares bands)
      9L -> "a wholly unrelated document about something else entirely")
    // default: all admitted (batch screens only against earlier state)
    val t1 = java.nio.file.Files.createTempDirectory("graft_gate3").toString
    graft.streaming.StreamOps.ingestBatch(batch, 0L, s"$t1/idx", s"$t1/out")
    assert(decisions(s"$t1/out").forall(_._4), "default admits the batch")
    // intraBatch: 5 keeps (smallest), 7 is exact+near, 6 at least near
    val t2 = java.nio.file.Files.createTempDirectory("graft_gate4").toString
    graft.streaming.StreamOps.ingestBatch(batch, 0L, s"$t2/idx", s"$t2/out",
      intraBatch = true)
    val d = decisions(s"$t2/out").sortBy(_._1).toSeq
    assert(d.contains((5L, false, false, true)))
    assert(d.contains((7L, true, true, false)))
    assert(d.contains((9L, false, false, true)))
    val six = d.find(_._1 == 6L).get
    assert(!six._2 && six._3 && !six._4, s"6 should be intra near-dup: $six")
    // retry with the same batchId: bit-identical (intra keys are a pure
    // function of the batch — no self-probing introduced)
    graft.streaming.StreamOps.ingestBatch(batch, 0L, s"$t2/idx", s"$t2/out",
      intraBatch = true)
    assert(decisions(s"$t2/out").sortBy(_._1).toSeq === d)
    // a SECOND batch still screens cross-batch: the survivor's text is
    // now prior state, so a re-arrival is an (exact) cross-batch dup
    graft.streaming.StreamOps.ingestBatch(docs(11L -> sharedA), 1L,
      s"$t2/idx", s"$t2/out", intraBatch = true)
    assert(decisions(s"$t2/out").toSet.contains((11L, true, true, false)))
  }

  test("retrying a batch with the same batchId is idempotent: verdicts " +
    "and index end bit-identical, no double rows, no self-matching") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gate2").toString
    val b0 = docs(1L -> "seed document text that later batches duplicate")
    graft.streaming.StreamOps.ingestBatch(b0, 0L, s"$tmp/idx", s"$tmp/out")
    val b1 = docs(
      2L -> "seed document text that later batches duplicate", // dup of 1
      3L -> "fresh text that only this batch contains anywhere")
    graft.streaming.StreamOps.ingestBatch(b1, 1L, s"$tmp/idx", s"$tmp/out")
    val first = decisions(s"$tmp/out").sorted.toSeq
    val hashesFirst = spark.read.parquet(s"$tmp/idx/hashes")
      .select("h").collect().map(_.getString(0)).sorted.toSeq
    // the RETRY: same batch, same id (foreachBatch redelivery)
    graft.streaming.StreamOps.ingestBatch(b1, 1L, s"$tmp/idx", s"$tmp/out")
    val second = decisions(s"$tmp/out").sorted.toSeq
    assert(second === first) // no appended duplicates, same verdicts
    // crucially the retried batch did NOT probe its own first attempt:
    // doc 3 stays kept (it would read as a dup of itself otherwise)
    assert(second.contains((3L, false, false, true)))
    assert(second.contains((2L, true, true, false)))
    val hashesSecond = spark.read.parquet(s"$tmp/idx/hashes")
      .select("h").collect().map(_.getString(0)).sorted.toSeq
    assert(hashesSecond === hashesFirst) // index unchanged by the retry
  }
}
