package graft.tools

/** Second-JVM reader for the cross-process MVCC drill: PLAN a read
  * against the CURRENT manifest (which pins the concrete file listing
  * — Spark's InMemoryFileIndex lists at DataFrame creation), signal
  * `planned`, wait until the writer process has compacted AND swept to
  * the next manifest generation, then EXECUTE the stale plan and print
  * its row count.
  *
  * This is the one-generation-retention claim across real process
  * boundaries: "a reader that planned against manifest K survives
  * K+1's cleanup" — previously spec'd only in-process.
  *
  * Usage: graft.tools.ReaderProbe <gate|ann> <indexDir> <flagDir>
  * Prints `ROWS=<n>` on success; any FileNotFound from the swept dirs
  * crashes the JVM → non-zero exit, which the spec asserts against. */
object ReaderProbe {
  def main(args: Array[String]): Unit = {
    val Array(kind, dir, flagDir) = args.take(3)
    val spark = Harness.session()
    val df = kind match {
      case "gate" =>
        graft.streaming.IngestIndex.readAll(spark, dir, "hashes", "h")
      case "ann" =>
        graft.streaming.AnnIngest.readIndex(spark, dir, None)
      case other => sys.error(s"unknown kind $other")
    }
    df.queryExecution.executedPlan // freeze analysis + physical plan
    val p = java.nio.file.Paths.get(flagDir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("planned"), "ok")
    val deadline = System.nanoTime() + 120L * 1000L * 1000L * 1000L
    while (!java.nio.file.Files.exists(p.resolve("swept")) &&
      System.nanoTime() < deadline) Thread.sleep(100)
    require(java.nio.file.Files.exists(p.resolve("swept")),
      "writer never signalled the sweep")
    println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
