package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.streaming.IngestIndex

/** Second-JVM half of the CROSS-PROCESS writer-lease drill.
  *
  * The in-suite lease drills (contention stress, heartbeat, stale
  * takeover) all run threads of ONE process, where the `heldLeases`
  * monitor serializes contenders before the file protocol is even
  * consulted. This main exercises the file protocol from a genuinely
  * separate JVM — no Spark session, just a Hadoop `FileSystem` (the
  * lease is metadata-only), so the subprocess starts in ~a second.
  *
  * Usage: `LeaseProbe <indexDir> hold <holdMs> [beatMs]` acquires the
  * lease through the real `withWriterLeaseFs` path, prints `HELD`,
  * sleeps `holdMs` (heartbeat running), releases, prints `RELEASED`.
  * `LeaseProbe <indexDir> try` attempts one acquisition: prints
  * `ACQUIRED` and exits 0, or exits 3 on the loud another-writer
  * refusal. Exit codes, not log scraping, carry the verdict. */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    if (args.length > 3) IngestIndex.LeaseBeatMs = args(3).toLong
    val fs = new Path(dir).getFileSystem(new Configuration())
    mode match {
      case "hold" =>
        val holdMs = args(2).toLong
        IngestIndex.withWriterLeaseFs(fs, dir) {
          println("HELD"); Console.flush()
          Thread.sleep(holdMs)
        }
        println("RELEASED"); Console.flush()
      case "try" =>
        try {
          IngestIndex.withWriterLeaseFs(fs, dir) { () }
          println("ACQUIRED"); Console.flush()
        } catch {
          case e: IllegalStateException =>
            System.err.println(e.getMessage)
            sys.exit(3)
        }
      case other =>
        System.err.println(s"unknown mode '$other'"); sys.exit(2)
    }
  }
}
