package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Physical layout of the streaming ingest-gate's dedup index — the
  * piece that makes [[StreamOps.dedupIngestStream]]'s per-batch cost
  * INDEPENDENT of stream history, i.e. the part of the 100 TB/day
  * design claim the naive "re-read every batch=N dir" layout could not
  * meet. LSM-shaped, three mechanisms:
  *
  *  1. '''Deltas + size-tiered runs.''' Each micro-batch appends a
  *     small UNpartitioned `batch=<id>` delta (overwrite mode — the
  *     retry idempotency shape is unchanged). [[compact]] periodically
  *     folds the new deltas into a '''hash-prefix-partitioned run'''
  *     (`run_<id>_<k>/hp=XX/`, `hp` = first [[HashPrefixLen]] hex chars
  *     of the key) and then merges runs of the SAME power-of-two size
  *     class, binary-counter style (Bentley–Saxe): the live index is a
  *     set of ≤ log₂(n) runs with geometrically separated sizes. A
  *     normal compaction therefore costs O(deltas folded); a merge
  *     touching the biggest run happens only every time the corpus
  *     DOUBLES, so each key is rewritten O(log n) times over the index
  *     lifetime — never "the whole base every cycle" (the round-10
  *     layout's one scale defect: md5 keys are uniform, so every delta
  *     touches every `hp=` partition and partition-scoped folding alone
  *     bounds nothing). The new run set is committed by a single
  *     `manifest.json` pointer swap — no window in which index rows
  *     exist nowhere; a crash mid-compaction leaves at worst orphan
  *     `run_*` dirs that the next compaction deletes. (On an object
  *     store the same manifest-pointer commit applies verbatim.)
  *  2. '''Bloom pre-screen.''' Every delta and every run carries a
  *     Bloom sidecar over its keys. A batch row whose key misses ALL
  *     blooms is '''guaranteed new''' (no false negatives) and never
  *     touches the index; only the maybe-seen suspects proceed to the
  *     exact probe joins, so a mostly-clean crawl batch costs ~zero
  *     index IO. False positives only cost a probe — decisions stay
  *     exact and bit-identical with or without the screen. Sidecars are
  *     cached driver-side by path ([[readBloom]]), so steady-state
  *     batches re-read NO sidecar bytes from the FS.
  *  3. '''Prefix-pruned probes.''' The suspects' distinct `hp`
  *     prefixes (≤ 16^[[HashPrefixLen]] values, collected driver-side)
  *     become a partition filter on every run scan — the exact join
  *     reads only the run partitions that could possibly match
  *     (`PartitionFilters` in the scan, spec-asserted), instead of the
  *     whole corpus index.
  *
  * Bloom sizing: delta sidecars share a fixed [[BloomItems]] geometry
  * so they OR-merge into one probe filter; each run's sidecar is sized
  * to its true row count at write (runs of different sizes probe
  * separately — [[mightContainAny]] groups by geometry). A delta larger
  * than [[BloomItems]] only degrades the sidecar's FP rate — more rows
  * probe the index, none are misjudged.
  */
object IngestIndex {

  /** MAX hex chars of the key used as the run partition column `hp`:
    * 2 → 256 partitions, enough that a pruned probe reads ≲1/256 of
    * a big run per suspect prefix while keeping file counts sane.
    * Suspect prefixes are always collected at THIS width and truncated
    * per run at probe time. */
  val HashPrefixLen = 2

  /** Runs below this row count use a 1-hex-char `hp` (16 partitions),
    * at-or-above use [[HashPrefixLen]] (256). A fixed 256-partition
    * geometry set compaction's FLOOR cost: every run write touched
    * ~256 partition dirs however small the run (md5 keys are uniform),
    * so compacting a few-thousand-key index cost ~10 s of pure file-op
    * overhead at sf0.1. Per-run widths remove that floor; each run's
    * width is self-described by its `_w<N>` name suffix, so the probe
    * never guesses (and a run never changes width in place — runs are
    * immutable, width is fixed at write). */
  val HpWidthThreshold: Long = 1L << 20

  /** Hex-prefix width for a run of `rows` distinct keys. */
  private[streaming] def widthFor(rows: Long): Int =
    if (rows < HpWidthThreshold) 1 else HashPrefixLen

  /** A run's hp width, parsed from its self-describing `_w<N>` name
    * suffix; legacy suffix-less runs were all written at
    * [[HashPrefixLen]]. */
  private[streaming] def widthOf(runName: String): Int =
    "_w(\\d+)$".r.findFirstMatchIn(runName).map(_.group(1).toInt)
      .getOrElse(HashPrefixLen)

  /** `hp` partition value for a key at `width` hex chars: a letter
    * prefix keeps an all-digit prefix ("07") from being type-inferred
    * back as an INT partition column, which would silently break the
    * string `isin` pruning filter. */
  private[streaming] def hpOf(key: Column,
      width: Int = HashPrefixLen): Column =
    concat(lit("x"), substring(key, 1, width))

  /** Shared delta-sidecar Bloom geometry (must be identical across
    * deltas for OR-merge); ~1.2 MB at 1% FPP. */
  val BloomItems: Long = 1L << 20
  val BloomFpp: Double = 0.01

  /** The two index families: exact md5 hashes and MinHash band keys. */
  private[streaming] val Kinds = Seq("hashes", "bands")

  private def fsFor(sp: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(sp.sparkContext.hadoopConfiguration)

  // ---- manifest -----------------------------------------------------------

  /** One compacted run: dir name under `<indexDir>/<kind>/` plus its
    * row count (what the size-tiered merge policy keys on). */
  final case class Run(name: String, rows: Long)

  /** The index's committed state: highest delta id folded into runs,
    * per-kind run lists (biggest first), and — for the ANN index — the
    * name of the centroids file queries must use ([[AnnIngest]]
    * retrain-at-compaction; None = the original `centroids.json`). */
  final case class Manifest(maxCompacted: Long,
                            runs: Map[String, Seq[Run]],
                            cents: Option[String] = None)

  /** Driver-side row count from parquet FOOTERS — no Spark job. Lists
    * part files recursively under each dir (partitioned layouts
    * included) and sums footer block counts. The drill-family wall
    * time is job-count × fixed dispatch overhead, so a metadata-only
    * count must not pay a job; at object-store scale this is the same
    * O(files) listing that scan planning pays, minus the dispatch. */
  private[streaming] def footerRows(sp: SparkSession,
      dirs: Seq[String]): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = sp.sparkContext.hadoopConfiguration
    def files(p: Path, f: FileSystem): Seq[Path] =
      f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) files(s.getPath, f)
        else if (s.getPath.getName.endsWith(".parquet") ||
                 s.getPath.getName.startsWith("part-")) Seq(s.getPath)
        else Nil
      }
    dirs.map { d =>
      val p = new Path(d)
      val f = p.getFileSystem(conf)
      if (!f.exists(p)) 0L
      else files(p, f).map { fp =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(fp, conf))
        try r.getRecordCount finally r.close()
      }.sum
    }.sum
  }

  /** Upper bound on the live index's row count from the manifest alone
    * (metadata-only — no Spark job): summed run counts of the two key
    * kinds. Unfolded deltas are excluded; they are batch-sized and the
    * caller adds its own batch. Used to size foreachBatch shuffle
    * widths: the batch body joins against the ACCUMULATED index, so a
    * trickle batch into a large production index must not serialize
    * the index-facing shuffles to one partition. */
  private[streaming] def liveRowsBound(sp: SparkSession,
      indexDir: String): Long =
    readManifest(sp, indexDir).runs
      .filter { case (k, _) => Kinds.contains(k) }
      .values.flatten.map(_.rows).sum

  /** The manifest is the single commit point of a compaction; it is a
    * 1-line JSON file, rewritten atomically-enough (create + rename by
    * the FS client) and tiny to re-read per batch. */
  private[streaming] def readManifest(sp: SparkSession, indexDir: String)
      : Manifest = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(s"$indexDir/manifest.json")
    if (!fs.exists(p)) Manifest(-1L, Map.empty)
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val mc = "\"maxCompacted\"\\s*:\\s*(-?\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(-1L)
      val cents = "\"cents\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(txt).map(_.group(1))
      // kind sections: "kind": [{"name": "...", "rows": N}, ...]
      val kindRe = "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r
      val runRe =
        "\\{\\s*\"name\"\\s*:\\s*\"([^\"]+)\"\\s*,\\s*\"rows\"\\s*:\\s*(\\d+)\\s*\\}".r
      val runs = kindRe.findAllMatchIn(txt).map { m =>
        m.group(1) -> runRe.findAllMatchIn(m.group(2))
          .map(r => Run(r.group(1), r.group(2).toLong)).toSeq
      }.toMap.filter(_._2.nonEmpty)
      // fail-fast on a pre-tiered-layout manifest ("base": "base_vK"
      // with no runs): silently parsing it as "no runs" would make
      // every probe skip the whole compacted corpus — admitting every
      // duplicate. No supported migration: rebuild the index.
      if (runs.isEmpty &&
          "\"base\"\\s*:\\s*\"".r.findFirstIn(txt).isDefined)
        throw new IllegalStateException(
          s"$indexDir/manifest.json uses the legacy single-base layout;" +
            " rebuild the index (probing it as empty would silently" +
            " re-admit every previously-seen document)")
      Manifest(mc, runs, cents)
    }
  }

  /** Commit-time FENCE: immediately before a manifest publish, verify
    * that the lease this thread holds for `indexDir` (if any) still
    * carries its acquisition token. The heartbeat makes usurpation of
    * a LIVE writer near-impossible, and the ownership-checked release
    * reports one after the fact — but a writer that somehow lost its
    * lease mid-operation (heartbeat thread died, manual lease delete,
    * clock skew past the stale threshold) must fail its COMMIT, not
    * overwrite the new holder's manifest with a state that never saw
    * the new holder's writes. One tiny file read per writer op. A
    * thread holding no lease for this index (bootstrap/test paths)
    * skips the check. */
  private def fenceCheck(fs: FileSystem, indexDir: String): Unit = {
    val key = fs.makeQualified(new Path(indexDir)).toString
    val me = Thread.currentThread().getId
    val tokenOpt = heldLeases.synchronized {
      heldLeases.get(key).filter(_.thread == me).map(_.token)
    }
    tokenOpt.foreach { token =>
      val cur = readLease(fs, leasePath(indexDir)).flatMap(leaseToken)
      if (!cur.contains(token))
        throw new IllegalStateException(
          s"lease on $indexDir was lost mid-operation (now held by " +
            s"${cur.getOrElse("nobody")}) — refusing to commit the " +
            "manifest over the new writer's state")
    }
  }

  /** Publish the manifest via write-temp-then-rename(OVERWRITE): the
    * rename is the atomic commit on HDFS-like filesystems and the local
    * FS, so a concurrent reader sees the OLD manifest or the NEW one,
    * never a truncated in-place overwrite (which would read as "empty
    * index" and silently skip the whole prior state). Fenced: a writer
    * whose lease was usurped mid-operation fails here ([[fenceCheck]])
    * instead of clobbering the new holder's commits. */
  private[streaming] def writeManifest(sp: SparkSession, indexDir: String,
                                       m: Manifest): Unit = {
    val fs = fsFor(sp, indexDir)
    fenceCheck(fs, indexDir)
    val runsJson = m.runs.toSeq.sortBy(_._1).map { case (kind, rs) =>
      "\"" + kind + "\": [" + rs.map(r =>
        s"""{"name": "${r.name}", "rows": ${r.rows}}""").mkString(", ") + "]"
    }.mkString("{", ", ", "}")
    val centsJson = m.cents.map(c => s""", "cents": "$c"""").getOrElse("")
    val tmp = new Path(s"$indexDir/manifest.json.tmp")
    val dst = new Path(s"$indexDir/manifest.json")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"maxCompacted": ${m.maxCompacted}$centsJson, "runs": $runsJson}"""
        .getBytes("UTF-8"))
    finally out.close()
    renameOverwrite(fs, sp.sparkContext.hadoopConfiguration, tmp, dst)
  }

  /** Atomic-publish rename: tmp → dst with OVERWRITE semantics, so a
    * concurrent reader sees the old file or the new one, never a gap or
    * a truncation. Shared by the manifest and the ANN quantizer. */
  private[streaming] def renameOverwrite(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      tmp: Path, dst: Path): Unit = {
    val qTmp = fs.makeQualified(tmp)
    val qDst = fs.makeQualified(dst)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(qDst.toUri, conf)
    fc.rename(qTmp, qDst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // ---- writer lease ---------------------------------------------------------

  /** Age past which a `_writer.lease` is presumed abandoned (crashed
    * writer) and may be taken over. Crash anywhere inside a leased op
    * is already SAFE for the index itself — every writer commits via
    * overwrite-idempotent dirs or the manifest rename — and a LIVE
    * holder refreshes the file's mtime every [[LeaseBeatMs]] from a
    * daemon heartbeat, so however slow the op, only a genuinely dead
    * writer's lease ever reaches this age. */
  val LeaseStaleMs: Long = 10 * 60 * 1000L

  /** Heartbeat period: the lease HOLDER refreshes `_writer.lease`'s
    * mtime this often from a daemon thread, so a live writer's lease
    * can never age past [[LeaseStaleMs]] — a legitimately slow op (a
    * full retrain at real scale runs well past 10 minutes) is never
    * usurped as "stale"; takeover now only ever fires on genuinely
    * dead writers. Test seam: specs shrink it to drill the beat. */
  @volatile private[graft] var LeaseBeatMs: Long = LeaseStaleMs / 4

  private def leasePath(indexDir: String) = new Path(s"$indexDir/_writer.lease")

  /** Single shared daemon scheduler for all held leases' heartbeats —
    * one parked thread JVM-wide, not one per lease. */
  private lazy val leaseHeart =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat")
        t.setDaemon(true); t
      })

  private def leaseBody(token: String): String =
    s"""{"owner": "pid${ProcessHandle.current().pid()}@${
      java.net.InetAddress.getLocalHost.getHostName}", "token": "$token"}"""

  private def readLease(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  private def leaseToken(body: String): Option[String] =
    "\"token\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(body)
      .map(_.group(1))

  /** Leases held by THIS JVM (qualified index path → holder record):
    * a caller may legitimately nest writer ops under one lease (e.g.
    * `withWriterLease { ingestBatch(...); compact(...) }` as a single
    * writer transaction), and same-THREAD nesting must not
    * self-deadlock on the file. A DIFFERENT thread of the same JVM is
    * a different writer — it must fail exactly like a second process
    * would, not silently ride the holder's lease. `token` is this
    * acquisition's unique identity (written into the file): release
    * and heartbeat verify it, so a holder that somehow lost the file
    * to a takeover can never delete the NEW holder's lease. */
  private case class Held(thread: Long, depth: Int, token: String,
      beat: java.util.concurrent.ScheduledFuture[_])
  private val heldLeases =
    scala.collection.mutable.Map.empty[String, Held]

  private def acquireFileLease(fs: FileSystem, indexDir: String,
      token: String): Unit = {
    val p = leasePath(indexDir)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false) // create-if-absent = the acquisition
        try out.write(leaseBody(token).getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    val status =
      try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    if (status.isEmpty) {
      // the lease VANISHED between the failed create and the stat —
      // the holder released. This is NOT takeover territory: we never
      // observed a stale file, so the rename-to-claim below could only
      // ever reap a lease some NEW writer just created (the mtime
      // guard cannot fire without an observed mtime to compare
      // against). Re-try the create once; losing that race to another
      // live writer is the ordinary fresh-holder refusal.
      if (tryCreate()) return
      throw new IllegalStateException(
        s"another writer acquired the lease on $indexDir as it was " +
          "released — retry after it finishes")
    }
    val fresh = status.exists(s =>
      System.currentTimeMillis() - s.getModificationTime < LeaseStaleMs)
    if (fresh) {
      val owner = readLease(fs, p).getOrElse("(unreadable)")
      throw new IllegalStateException(
        s"another writer holds the lease on $indexDir: $owner — " +
          "refusing to interleave (two writers racing the manifest " +
          "read->write can silently drop a tombstone record or a run " +
          s"list update); retry after it finishes, or delete ${p} if " +
          "that writer is known dead")
    }
    // Stale: presume a crashed writer and take over by RENAME-to-claim
    // — the rename is atomic on HDFS-like stores, so two takeover
    // racers cannot both claim, and a bare delete can never hit a
    // lease some OTHER taker just re-created (the delete->create
    // TOCTOU of the naive protocol). If the claimed file turns out to
    // be fresher than the one we stat'ed (it was replaced inside our
    // stat window by a new live holder), put it back and fail loudly.
    val staleMtime = status.map(_.getModificationTime)
    // a takeover that crashed between its rename and its delete left
    // an orphan reap file behind; collect aged ones while we are here
    // (the age gate keeps an IN-FLIGHT takeover's reap safe)
    try fs.listStatus(new Path(indexDir)).foreach { st =>
      if (st.getPath.getName.startsWith("_writer.lease.reap.") &&
          System.currentTimeMillis() - st.getModificationTime >
            LeaseStaleMs) { fs.delete(st.getPath, false); () }
    } catch { case _: java.io.IOException => () }
    val reap = new Path(s"$indexDir/_writer.lease.reap.$token")
    val claimed =
      try fs.rename(p, reap)
      catch { case _: java.io.IOException => false }
    if (!claimed)
      throw new IllegalStateException(
        s"lost the stale-lease takeover race on $indexDir — another " +
          "writer claimed it first; retry after it finishes")
    val reapedMtime =
      try Some(fs.getFileStatus(reap).getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    if (staleMtime.isDefined && reapedMtime.isDefined &&
        reapedMtime != staleMtime) {
      // we reaped a DIFFERENT file than the stale one we observed — a
      // live writer re-acquired inside the window; restore and back off
      try { fs.rename(reap, p); () }
      catch { case _: java.io.IOException => () }
      throw new IllegalStateException(
        s"lease on $indexDir changed during the stale takeover — a new " +
          "writer acquired it; retry after it finishes")
    }
    fs.delete(reap, false)
    if (!tryCreate())
      throw new IllegalStateException(
        s"lost the stale-lease takeover race on $indexDir — another " +
          "writer claimed it first; retry after it finishes")
  }

  /** One heartbeat: refresh the lease's mtime IF it still carries our
    * token. A token mismatch means we were usurped (should be
    * impossible while beating — it takes a manual lease delete or an
    * external actor); the beat then stops touching the file and the
    * release path reports it. */
  private def beatOnce(fs: FileSystem, indexDir: String,
      token: String): Unit = {
    val p = leasePath(indexDir)
    try {
      if (readLease(fs, p).flatMap(leaseToken).contains(token))
        fs.setTimes(p, System.currentTimeMillis(), -1)
    } catch { case _: java.io.IOException => () }
  }

  /** Run `body` holding the index's SINGLE-WRITER lease.
    *
    * Writers (delta append, compaction, retraction/deletion) each
    * read-modify-write shared state (the manifest, tombstone dirs)
    * with no other concurrency control: two invocations racing — a
    * `gate --retract` while a `gate --feed` drain compacts, or two
    * `annindex` processes — can interleave a manifest read→write and
    * silently drop a tombstone record or a run-list update. READERS
    * stay lease-free: the manifest pointer swap plus one-generation
    * retention already gives them MVCC-lite safety.
    *
    * Protocol: create-if-absent of `_writer.lease` (atomic on
    * HDFS-like filesystems and the local FS) acquires, stamping a
    * unique token; a daemon heartbeat refreshes the mtime every
    * [[LeaseBeatMs]] while held (a live slow writer never looks
    * stale); release deletes the file ONLY if it still carries this
    * acquisition's token (also on failure — crash-left leases age out
    * via [[LeaseStaleMs]] rename-to-claim takeover). Same-JVM nesting
    * re-enters without touching the file. Every public writer op takes
    * the lease itself, so CLI verbs and streams are covered
    * transitively; wrap several ops in one `withWriterLease` to make
    * them a single writer transaction.
    *
    * DEPLOYMENT NOTE (object stores): the protocol needs atomic
    * create-if-absent and atomic rename — true on HDFS and ABFS, NOT
    * on S3A (create(p, false) is check-then-create and rename is
    * copy+delete there). Acquisition ENFORCES this: an s3a/s3n/s3
    * `indexDir` fails loudly unless
    * `spark.sql.graft.lease.allowNonAtomicStore=true` (session conf;
    * external writers set `graft.lease.allowNonAtomicStore` in the
    * Hadoop conf) explicitly accepts that the commit-time
    * [[fenceCheck]] — which downgrades silent interleaving to a loud
    * failed commit — is the only interleaving defense there. On S3,
    * prefer an HDFS/ABFS `indexDir` or a consistency layer. */
  def withWriterLease[T](sp: SparkSession, indexDir: String)(body: => T): T =
    withWriterLeaseFs(fsFor(sp, indexDir), indexDir,
      sp.conf.get("spark.sql.graft.lease.allowNonAtomicStore", "false")
        .toBoolean)(body)

  /** Schemes whose create-if-absent / rename are NOT atomic — the
    * lease protocol's cross-process mutual exclusion silently degrades
    * there (see the deployment note on [[withWriterLease]]). */
  private val NonAtomicSchemes = Set("s3a", "s3n", "s3")

  /** Fail acquisition on a store that cannot give the lease protocol
    * its atomicity, unless explicitly waived. */
  private def requireAtomicStore(fs: FileSystem, indexDir: String,
      allow: Boolean): Unit = {
    val scheme = Option(fs.getScheme).map(_.toLowerCase).getOrElse("")
    if (NonAtomicSchemes(scheme) && !allow)
      throw new IllegalStateException(
        s"writer lease on $indexDir: filesystem scheme '$scheme' has no " +
          "atomic create-if-absent/rename, so the lease protocol cannot " +
          "guarantee writer mutual exclusion there. Point the index at an " +
          "HDFS/ABFS path, or set " +
          "spark.sql.graft.lease.allowNonAtomicStore=true to accept the " +
          "commit-time fence check as the only interleaving defense.")
  }

  /** [[withWriterLease]] against an explicit FileSystem — the whole
    * protocol is metadata-only (create-if-absent, stat, rename,
    * setTimes), so an EXTERNAL writer needs no SparkSession to
    * participate. `tools.LeaseProbe` drives this from a separate JVM;
    * the cross-process drill in IngestIndexSpec rides on it. */
  private[graft] def withWriterLeaseFs[T](fs: FileSystem,
      indexDir: String, allowNonAtomic: Boolean = false)(body: => T): T = {
    requireAtomicStore(fs, indexDir, allowNonAtomic ||
      (fs.getConf != null &&
        fs.getConf.getBoolean("graft.lease.allowNonAtomicStore", false)))
    val key = fs.makeQualified(new Path(indexDir)).toString
    val me = Thread.currentThread().getId
    // ALL same-process acquisition/release state changes happen under
    // ONE monitor, including the lease-file create and delete: the
    // local FS's create-if-absent is exists-then-create (NOT atomic),
    // and the threaded stress spec caught a release's delete opening a
    // window in which several contenders' creates all succeeded at
    // once. Under the monitor, same-process contenders fully
    // serialize; CROSS-process mutual exclusion rides on the store's
    // create-if-absent, which is atomic on HDFS-like filesystems (the
    // deployment this index targets — the local-FS microsecond TOCTOU
    // between separate processes is accepted and documented).
    heldLeases.synchronized {
      heldLeases.get(key) match {
        case Some(h) if h.thread == me =>
          heldLeases(key) = h.copy(depth = h.depth + 1)
        case Some(h) =>
          throw new IllegalStateException(
            s"another writer (thread ${h.thread} of this process) holds " +
              s"the lease on $indexDir — refusing to interleave")
        case None =>
          val token = java.util.UUID.randomUUID().toString
          acquireFileLease(fs, indexDir, token)
          val beat = leaseHeart.scheduleWithFixedDelay(
            () => beatOnce(fs, indexDir, token),
            LeaseBeatMs, LeaseBeatMs,
            java.util.concurrent.TimeUnit.MILLISECONDS)
          heldLeases(key) = Held(me, 1, token, beat)
      }
    }
    var primary: Throwable = null
    try body
    catch { case t: Throwable => primary = t; throw t }
    finally heldLeases.synchronized {
      val h = heldLeases(key)
      if (h.depth > 1) heldLeases(key) = h.copy(depth = h.depth - 1)
      else {
        h.beat.cancel(false)
        heldLeases.remove(key)
        // ownership-checked release: delete ONLY a lease that still
        // carries this acquisition's token. Deleting unconditionally
        // would, after a (manual or stale-misjudged) takeover, remove
        // the USURPER's live lease and open the index to a third
        // writer while the usurper is mid-compaction.
        val p = leasePath(indexDir)
        readLease(fs, p).flatMap(leaseToken) match {
          case Some(t) if t == h.token => fs.delete(p, false); ()
          case Some(other) =>
            val usurped = new IllegalStateException(
              s"lease on $indexDir was taken over mid-operation (now " +
                s"held by token $other) — this writer's commits may " +
                "have interleaved with the new holder's; verify the " +
                "manifest before trusting the index")
            // when the body ALSO failed (typically the fenceCheck on
            // its commit), its exception is the root cause — attach
            // the release's report instead of replacing it from the
            // finally block
            if (primary != null) primary.addSuppressed(usurped)
            else throw usurped
          case None => () // already gone (manual delete) — nothing to release
        }
      }
    }
  }

  // ---- deltas -------------------------------------------------------------

  /** Delta dirs of `kind` with maxCompacted < id < batchId, oldest
    * first. Listing cost is O(deltas since compaction), the bounded
    * quantity the layout is built around. */
  private[streaming] def deltaDirs(sp: SparkSession, indexDir: String,
      kind: String, maxCompacted: Long, batchId: Long): Seq[(Long, String)] = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(s"$indexDir/$kind")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .map(d => (d.getName.stripPrefix("batch=").toLong, d.toString))
      .filter { case (id, _) => id > maxCompacted && id < batchId }
      .sortBy(_._1)
  }

  /** Run dirs of `kind` present on disk (live or orphaned — the caller
    * diffs against the manifest). */
  private[streaming] def runDirsOnDisk(sp: SparkSession, indexDir: String,
      kind: String): Seq[String] = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(s"$indexDir/$kind")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("run_") || n.startsWith("base_v"))
  }

  private def bloomPath(indexDir: String, kind: String, name: String) =
    new Path(s"$indexDir/blooms/${kind}_$name.bloom")

  /** Driver-side sidecar cache, keyed by sidecar path. Sidecar files
    * are immutable once written (a foreachBatch retry overwrites a
    * delta with bit-identical content — the write path is
    * deterministic), so entries never go stale; deletes evict. Bounded
    * by eviction at compaction plus a hard cap. */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()

  private def cachePut(p: Path, bf: BloomFilter): Unit = {
    if (bloomCache.size > 256) bloomCache.clear()
    bloomCache.put(p.toString, bf); ()
  }

  private def writeBloom(fs: FileSystem, p: Path, bf: BloomFilter): Unit = {
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
    cachePut(p, bf)
  }

  private def readBloom(fs: FileSystem, p: Path): Option[BloomFilter] =
    Option(bloomCache.get(p.toString)).map(Some(_)).getOrElse {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bf = try BloomFilter.readFrom(in) finally in.close()
        cachePut(p, bf)
        Some(bf)
      }
    }

  private def deleteBloom(fs: FileSystem, p: Path): Unit = {
    fs.delete(p, false)
    bloomCache.remove(p.toString); ()
  }

  /** Driver-resident cache sizes, for the soak harnesses' leak gauges
    * (tools.IngestSoak records them per compaction): Bloom sidecars
    * must track the live run/delta set (log n by size-tiering + hard
    * cap), tombFastOk the live tombstone dir-sets. */
  private[graft] def driverCacheSizes: (Int, Int) =
    (bloomCache.size, tombFastOk.size)

  /** Write one batch's delta of `kind` (distinct single-column `key`
    * rows) plus its Bloom sidecar, both in overwrite mode so a
    * foreachBatch retry leaves them bit-identical. The sidecar is
    * DELIBERATELY built by reading the written delta back: (a) sidecar
    * and rows can never disagree, and (b) the read-back packs the
    * delta's files into ONE scan task, so exactly one BloomFilter is
    * allocated — building from the pre-write frame instead costs one
    * 1.2 MB bloom + merge PER SHUFFLE PARTITION, because AQE cannot
    * coalesce the distinct() inside a streaming foreachBatch (measured:
    * +1.9 s on q_stream_dedup_ingest at 32 partitions). Written
    * rows-first (a retry that crashed between the two re-does both);
    * [[writeBloom]] seeds the driver cache, so later batches read the
    * sidecar from memory, not the FS. */
  private[streaming] def writeDelta(keys: DataFrame, indexDir: String,
      kind: String, batchId: Long): Unit = {
    val sp = keys.sparkSession
    val dir = s"$indexDir/$kind/batch=$batchId"
    keys.write.mode("overwrite").parquet(dir)
    val keyCol = keys.columns.head
    val bf = sp.read.parquet(dir).stat
      .bloomFilter(keyCol, BloomItems, BloomFpp)
    writeBloom(fsFor(sp, indexDir),
      bloomPath(indexDir, kind, s"batch=$batchId"), bf)
  }

  // ---- retraction tombstones ----------------------------------------------

  /** Tombstone dir root for `kind`'s retracted keys. */
  private def tombsDir(indexDir: String, kind: String) =
    s"$indexDir/tombs_$kind"

  /** Register `keys` (single key column) of `kind` for RETRACTION —
    * the gate's takedown: future arrivals of content holding these
    * keys are re-admitted as if never seen. Probes anti-join live
    * tombstones immediately (the Bloom screen may still route a
    * retracted key to the probe — a false positive costs a read, never
    * a wrong decision); [[compact]] folds them into every run it
    * writes and sweeps each tombstone once no live run predates it,
    * plus one reader-retention generation. Overwrite mode per tag →
    * idempotent re-issue. NOTE the key-sharing caveat: a hash/band key
    * shared with OTHER documents is removed for them too (that is what
    * retracting content means for an index keyed by content). */
  private[streaming] def retractKeys(sp: SparkSession, indexDir: String,
      kind: String, keys: DataFrame, tag: String): Unit = {
    require(tag.matches("[A-Za-z0-9_\\-]+"),
      s"retraction tag must be [A-Za-z0-9_-]+, got '$tag'")
    // a tag the manifest has already APPLIED must not be re-issued
    // with different content: the sweep condition proves runs are
    // clean of what was applied UNDER THAT NAME, so extending an
    // applied tag could sweep before the new keys are removed —
    // silently undoing a takedown. (Overwriting a not-yet-applied tag
    // remains allowed: that is the idempotent-retry shape.)
    val m = readManifest(sp, indexDir)
    val applied = (m.runs.getOrElse(s"tombs_$kind", Nil) ++
      m.runs.getOrElse(s"tswept_$kind", Nil)).map(_.name).toSet
    if (applied.contains(s"t_$tag"))
      throw new IllegalArgumentException(
        s"retraction tag '$tag' was already applied by a compaction — " +
          "issue the additional keys under a fresh tag")
    // SOURCE-SCOPE the retraction: it excludes keys only from sources
    // (deltas/runs) that exist NOW. Without the bound, the exclusion
    // also ate the key's own RE-INGESTION — the admitted re-arrival's
    // key vanished from every probe view (and compaction physically
    // dropped it), so each further arrival of retracted-then-re-added
    // content was admitted as a duplicate until the sweep. Writers are
    // lease-serialized, so every future batch/compaction id is > the
    // max source id observed here.
    val bound = 1L + math.max(m.maxCompacted,
      deltaDirs(sp, indexDir, kind, Long.MinValue, Long.MaxValue)
        .map(_._1).maxOption.getOrElse(-1L))
    keys.distinct().withColumn("tb_bound", lit(bound))
      .write.mode("overwrite")
      .parquet(s"${tombsDir(indexDir, kind)}/t_$tag")
  }

  /** Source id of a run or delta dir name — the compaction id that
    * wrote a run (`run_<id>_…`) or a delta's batch id (`batch=<id>`),
    * the axis retraction bounds are scoped on. Unrecognized names read
    * 0: conservatively INSIDE every retraction's scope (guessing "new"
    * would resurrect retracted content). */
  private[streaming] def srcIdOf(dir: String): Long = {
    val n = dir.split("/").last
    "run_(\\d+)_\\d+".r.findFirstMatchIn(n).map(_.group(1).toLong)
      .orElse("batch=(\\d+)".r.findFirstMatchIn(n).map(_.group(1).toLong))
      .getOrElse(0L)
  }

  /** Live retraction tombstones of one kind, normalized to
    * (`keyName`, tb_bound).
    *
    * Fast path: production dirs all carry the key under `keyName`, so
    * ONE mergeSchema multi-path read covers every live dir (under
    * sustained takedown pressure the per-dir loop put one scan relation
    * per live dir into EVERY probe plan — part of the measured
    * wave-regime tax). mergeSchema reconciles legacy dirs missing
    * `tb_bound` (their rows read null → MaxValue = "exclude from every
    * source", the pre-scoping behavior). A null key in the fast read
    * means some dir holds its key under a DIFFERENT (legacy) name —
    * silently keeping the null row would stop that tombstone from
    * excluding anything, so such a set is served by the per-dir loop
    * (which renames a single-column legacy dir to `keyName`) instead.
    * The null-key validation is one small job, cached per live dir-set
    * (tombstone dirs are immutable; sweeps change the SET and thus the
    * cache key), so steady-state probe-plan builds stay lazy. */
  private[streaming] def readTombs(sp: SparkSession, dirs: Seq[String],
      keyName: String): DataFrame = {
    val fast = sp.read.option("mergeSchema", "true").parquet(dirs: _*)
    def slow = dirs.map { d =>
      val df = sp.read.parquet(d)
      val nonBound = df.columns.filterNot(_ == "tb_bound")
      // select the key BY NAME when present; a single-column legacy dir
      // (written under the caller's own key name) stays readable, but a
      // dir with extra columns and no `keyName` fails loudly instead of
      // silently treating an arbitrary column as the retraction key
      val keyCol =
        if (nonBound.contains(keyName)) keyName
        else if (nonBound.length == 1) nonBound.head
        else throw new IllegalStateException(
          s"tombstone dir $d has no '$keyName' column and an ambiguous " +
            s"schema [${df.columns.mkString(", ")}]")
      val bound =
        if (df.columns.contains("tb_bound")) col("tb_bound").cast("long")
        else lit(Long.MaxValue)
      df.select(col(keyCol).as(keyName), bound.as("tb_bound"))
    }.reduce(_ unionByName _)
    if (!fast.columns.contains(keyName)) slow
    else {
      val ck = (keyName +: dirs.sorted).mkString(" ")
      val fastOk = Option(tombFastOk.get(ck)).map(_.booleanValue)
        .getOrElse {
          val v = fast.filter(col(keyName).isNull).isEmpty
          if (tombFastOk.size > 256) tombFastOk.clear()
          tombFastOk.put(ck, java.lang.Boolean.valueOf(v))
          v
        }
      if (fastOk) {
        val bound =
          if (fast.columns.contains("tb_bound"))
            coalesce(col("tb_bound").cast("long"), lit(Long.MaxValue))
          else lit(Long.MaxValue)
        fast.select(col(keyName), bound.as("tb_bound"))
      } else slow
    }
  }

  /** Per-dir-set verdict cache for [[readTombs]]'s fast path: true =
    * every dir carries the key under the index's key name, the single
    * mergeSchema scan is sound; false = mixed legacy naming, per-dir
    * loop. Bounded the same way as the Bloom sidecar cache. */
  private val tombFastOk =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Live (not yet swept) tombstone dirs of `kind`. */
  private[streaming] def tombDirs(sp: SparkSession, indexDir: String,
      kind: String): Seq[String] = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(tombsDir(indexDir, kind))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.toString)
      .filter(_.split("/").last.startsWith("t_")).sorted
  }

  // ---- probe --------------------------------------------------------------

  /** All prior index state of `kind` visible to `batchId`:
    * (live run dirs, delta dirs, Bloom filters if COMPLETE, live
    * retraction-tombstone dirs). An incomplete sidecar set (legacy
    * dirs, mid-write crash) returns None for the blooms — the probe
    * then skips the pre-screen and reads the index exactly, never
    * wrongly. */
  private[streaming] case class Prior(runs: Seq[String],
                                      deltas: Seq[String],
                                      blooms: Option[Seq[BloomFilter]],
                                      tombs: Seq[String] = Nil)

  private[streaming] def prior(sp: SparkSession, indexDir: String,
      kind: String, batchId: Long): Prior = {
    val fs = fsFor(sp, indexDir)
    val m = readManifest(sp, indexDir)
    val runs = m.runs.getOrElse(kind, Nil)
    // a manifest-referenced run dir is guaranteed present (committed
    // before the manifest, retained one generation after supersession)
    // — a missing one is index corruption, and silently probing
    // without it would re-admit every duplicate it held
    runs.find(r => !fs.exists(new Path(s"$indexDir/$kind/${r.name}")))
      .foreach(r => throw new IllegalStateException(
        s"index run $indexDir/$kind/${r.name} is referenced by the " +
          "manifest but missing on disk — the index is corrupted; " +
          "restore it or rebuild from the source feed"))
    val deltas = deltaDirs(sp, indexDir, kind, m.maxCompacted, batchId)
    val runBlooms = runs.map(r =>
      readBloom(fs, bloomPath(indexDir, kind, r.name)))
    val deltaBlooms = deltas.map { case (id, _) =>
      readBloom(fs, bloomPath(indexDir, kind, s"batch=$id")) }
    val all = runBlooms ++ deltaBlooms
    val blooms = if (all.forall(_.isDefined)) Some(all.flatten) else None
    Prior(runs.map(r => s"$indexDir/$kind/${r.name}"),
      deltas.map(_._2), blooms, liveTombDirs(sp, indexDir, kind, m))
  }

  /** Tombstone dirs a CURRENT-manifest reader must anti-join: all t_*
    * dirs on disk EXCEPT the logically-swept (tswept_<kind>) ones —
    * those stay on disk one generation for in-flight readers of the
    * PREVIOUS manifest, but their exclusions are proven applied to
    * every source this manifest references (the sweep condition), so a
    * new probe plan drops them and reaches the tombstone-free fast
    * path a whole generation earlier. (tools.IngestSoak classifies its
    * batches with this same definition.) */
  private[graft] def liveTombDirs(sp: SparkSession, indexDir: String,
      kind: String, manifest: Manifest = null): Seq[String] = {
    val m = if (manifest != null) manifest else readManifest(sp, indexDir)
    val swept = m.runs.getOrElse(s"tswept_$kind", Nil).map(_.name).toSet
    tombDirs(sp, indexDir, kind).filterNot(d => swept(d.split("/").last))
  }

  /** Exact copy of a Bloom filter (serialize round-trip — the public
    * sketch API has no clone). [[mightContainAny]] must NOT
    * `mergeInPlace` into a cached filter: the mutation would fold other
    * files' keys into the cached bits, inflating the FP rate a little
    * more every batch until the screen routes everything. */
  private def copyOf(bf: BloomFilter): BloomFilter = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bos.toByteArray))
  }

  /** Might `key` appear in ANY of `bfs`? Geometry-compatible filters
    * are OR-merged (into a fresh copy — never mutating a cached
    * filter); the probe is then one UDF broadcast per distinct
    * geometry (merged deltas + per-size run sidecars). */
  private[streaming] def mightContainAny(df: DataFrame,
      bfs: Seq[BloomFilter], key: Column): Column = {
    val groups = bfs.groupBy(_.bitSize()).values.toSeq.map { g =>
      if (g.lengthCompare(1) == 0) g.head
      else g.tail.foldLeft(copyOf(g.head)) { (acc, b) =>
        acc.mergeInPlace(b); acc
      }
    }
    groups.map(bf => graft.text.BloomDedup.probe(df, bf, key))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Full current-manifest read of `kind` — the reader-side serving
    * frame with no Bloom pre-screen (hps = None) and the live-tombstone
    * anti-join applied. Drill seam for the cross-process MVCC drill
    * (tools.ReaderProbe): the plan — and its pinned file listing — is
    * built against the manifest as of THIS call. */
  private[graft] def readAll(sp: SparkSession, indexDir: String,
      kind: String, keyName: String): DataFrame =
    readPruned(sp, prior(sp, indexDir, kind, Long.MaxValue), keyName, None)

  /** Read prior `kind` rows as a single-column `keyName` frame, pruned:
    * only run partitions whose `hp` appears in `hps` are scanned
    * (deltas are small and unpartitioned — read whole). `hps = None`
    * means "no suspect information" — read everything (exact fallback
    * when sidecars are incomplete). Retracted keys (live tombstones)
    * are anti-joined out — a no-op plan when none exist. */
  private[streaming] def readPruned(sp: SparkSession, pr: Prior,
      keyName: String, hps: Option[Seq[String]]): DataFrame = {
    def prunedRun(d: String) = {
      val full = sp.read.option("basePath", d).parquet(d)
      // suspect prefixes are collected at the MAX width; truncate to
      // this run's own width (self-described by its name) so the isin
      // values match its coarser partition values
      val w = widthOf(d.split("/").last)
      hps.fold(full)(ps =>
        full.filter(col("hp").isin(ps.map(_.take(1 + w)).distinct: _*)))
    }
    if (pr.tombs.isEmpty) {
      // the steady no-retraction path keeps the cheapest plan: one
      // multi-path delta scan, no per-source bookkeeping
      (pr.runs.map(prunedRun(_).select(col(keyName))) ++ (
        if (pr.deltas.isEmpty) None
        else Some(sp.read.parquet(pr.deltas: _*).select(col(keyName)))))
        .reduceOption(_ union _)
        .getOrElse(sp.emptyDataFrame
          .select(lit("").as(keyName)).limit(0))
    } else {
      // a retraction is pending: every key carries its SOURCE id so
      // the anti-join can scope the exclusion to pre-retraction
      // sources (a key re-ingested after the retraction must stay
      // visible as dup-screen prior state). Delta dirs are NAMED
      // `batch=<id>`, so ONE multi-path read with their parent as
      // basePath recovers the source id as a partition column — the
      // same single-scan shape as the no-tombstone path (per-dir
      // reads here made sustained takedown pressure cost ~1.6x and
      // GROW with the live-dir count; IngestSoak retractEvery A/B)
      val frames =
        pr.runs.map(d => prunedRun(d)
          .select(col(keyName), lit(srcIdOf(d)).as("src_id"))) ++ (
          if (pr.deltas.isEmpty) Nil
          else {
            // the basePath trick REQUIRES every delta dir to be named
            // `batch=<id>` — guaranteed today because deltaDirs lists
            // only batch=* dirs; if delta naming ever changes, fail
            // here rather than silently reading a wrong src_id scope
            require(pr.deltas.forall(_.split("/").last.startsWith("batch=")),
              s"delta dirs must be batch=<id>-named for the partition-" +
                s"column src_id recovery: ${pr.deltas.mkString(", ")}")
            val parent = pr.deltas.head.substring(0,
              pr.deltas.head.lastIndexOf('/'))
            Seq(sp.read.option("basePath", parent)
              .parquet(pr.deltas: _*)
              .select(col(keyName), col("batch").cast("long").as("src_id")))
          })
      val all = frames.reduceOption(_ union _)
        .getOrElse(sp.emptyDataFrame
          .select(lit("").as(keyName), lit(0L).as("src_id")).limit(0))
      antiJoinTombs(all, readTombs(sp, pr.tombs, keyName),
        keyName, pr.tombs).drop("src_id")
    }
  }

  /** Row-count ceiling under which a live tombstone set is broadcast
    * into the serving path's anti-join. Between a retraction and its
    * sweep, EVERY probe/read pays the exclusion — with a handful of
    * tombstoned keys the shuffled anti-join would repartition the whole
    * pruned index scan just to drop a few rows. Broadcasting turns it
    * into a shuffle-free BroadcastHashJoin on the probe side; larger
    * tombstone sets (bulk takedowns) keep the shuffled join. */
  val TombBroadcastMax = 10000L

  /** Driver-side cache of the broadcast-or-shuffle sizing decision,
    * keyed by the tombstone DIR SET plus each dir's modification
    * time, file count, and total byte length:
    * the serving path would otherwise pay one (tiny) sizing job per
    * probe for as long as a tombstone is live. A new retraction
    * changes the dir set; an overwrite — a not-yet-applied-tag retry,
    * or a tag legitimately REUSED after its sweep (the applied-set
    * check only covers the current manifest) — bumps the mtime, so a
    * reused tag with different content can never ride a stale verdict
    * into an oversized broadcast. Bounded by a hard cap like
    * [[bloomCache]]. */
  private val tombSizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[streaming] def tombsSmall(sp: SparkSession, dirs: Seq[String],
      tombs: => DataFrame): Boolean = {
    // key = dir + mtime + file count + total bytes: mtime alone has
    // 1-second granularity on many filesystems, so a tag overwritten
    // twice within the same second with a much larger id set could
    // ride the first write's stale "small" verdict into broadcasting
    // an oversized tombstone set — the size fields catch that
    val k = dirs.sorted.map { d =>
      val fs = fsFor(sp, d)
      val (mt, cnt, len) = try {
        val st = fs.getFileStatus(new Path(d))
        val files = fs.listStatus(new Path(d))
        (st.getModificationTime, files.length, files.map(_.getLen).sum)
      } catch { case _: Throwable => (-1L, -1, -1L) }
      s"$d@$mt@$cnt@$len"
    }.mkString("|")
    Option(tombSizeCache.get(k)).map(_.booleanValue).getOrElse {
      if (tombSizeCache.size > 256) tombSizeCache.clear()
      val v = tombs
        .limit(TombBroadcastMax.toInt + 1).count() <= TombBroadcastMax
      tombSizeCache.put(k, v)
      v
    }
  }

  /** Anti-join `rows` (which must carry a `src_id` column) against
    * normalized (`keyName`, tb_bound) tombstones, broadcasting the
    * tombstone side when it is small (≤ [[TombBroadcastMax]] rows —
    * checked with an early-exit limit+count through [[tombsSmall]]'s
    * cache, so the sizing probe runs once per live tombstone set, not
    * once per probe). The exclusion is SOURCE-SCOPED: only rows whose
    * source predates the retraction's bound match — the key equality
    * stays the hash-join key, the bound rides as the join's extra
    * condition. */
  private[streaming] def antiJoinTombs(rows: DataFrame, tombs: DataFrame,
      keyName: String, dirs: Seq[String]): DataFrame = {
    val t = (if (tombsSmall(rows.sparkSession, dirs, tombs))
      broadcast(tombs) else tombs)
      .withColumnRenamed(keyName, "tb_k")
    rows.join(t,
      rows(keyName) === t("tb_k") && rows("src_id") < t("tb_bound"),
      "left_anti")
  }

  /** The full routed probe for one kind: Bloom-screen `keys` (single
    * key column) against `pr`, collect the suspects' hash prefixes,
    * return the pruned prior rows to exact-join against. With complete
    * sidecars and zero suspects this reads NO index bytes at all. */
  private[streaming] def probeRows(sp: SparkSession, pr: Prior,
      keys: DataFrame, keyName: String): DataFrame = {
    if (pr.runs.isEmpty && pr.deltas.isEmpty)
      return sp.emptyDataFrame.select(lit("").as(keyName)).limit(0)
    val hps: Option[Seq[String]] = pr.blooms match {
      case Some(bfs) =>
        val suspects = keys
          .filter(mightContainAny(keys, bfs, col(keyName)))
        Some(suspects
          .select(hpOf(col(keyName)).as("hp"))
          .distinct().collect().map(_.getString(0)).toSeq)
      case None => None // incomplete sidecars: exact unpruned fallback
    }
    if (hps.exists(_.isEmpty))
      sp.emptyDataFrame.select(lit("").as(keyName)).limit(0)
    else readPruned(sp, pr, keyName, hps)
  }

  // ---- compaction ---------------------------------------------------------

  /** Power-of-two size class for the binary-counter merge policy. */
  private def sizeClass(rows: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(math.max(rows, 1L))

  /** Write `df`'s distinct keys as an hp-partitioned run named
    * `<baseName>_w<width>`, sidecar sized to the true row count. One
    * shuffle keyed on hp → ~one file per populated partition. The
    * distinct keys are persisted and COUNTED FIRST: the row count
    * picks the run's hp width ([[widthFor]] — small runs write 16
    * partition dirs, not 256, removing the old fixed-geometry
    * compaction floor), and the count is deterministic, so a
    * compaction retry rewrites the same name with the same content.
    * The bloom sidecar is still built from a read-back of the written
    * files (one packed scan task → exactly one filter allocated; see
    * [[writeDelta]]). `forceWidth` lets specs exercise the wide-run
    * geometry without a million-key corpus. */
  private[streaming] def writeRun(sp: SparkSession, indexDir: String,
      kind: String, keyName: String, baseName: String, df: DataFrame,
      forceWidth: Option[Int] = None,
      rowsHint: Option[Long] = None): Run = {
    // `rowsHint` (an input-row upper bound the caller reads off the
    // manifest / delta footers) derives the shuffle width of the
    // distinct + hp exchange — compactions run inside foreachBatch
    // where AQE is off, so these otherwise keep the full configured
    // width however small the fold is (Spread.withBatchWidth caps at
    // the session width: identical at production run sizes)
    def body(): Run = {
    val keys = df.select(col(keyName)).distinct().persist()
    try {
      val n = keys.count()
      val w = forceWidth.getOrElse(widthFor(n))
      val name = s"${baseName}_w$w"
      val dir = s"$indexDir/$kind/$name"
      keys.withColumn("hp", hpOf(col(keyName), w))
        .repartition(col("hp"))
        .write.mode("overwrite").partitionBy("hp").parquet(dir)
      if (n > 0) {
        // explicit schema: a fully-tombstoned input writes an empty
        // partitioned dir, and a schema-INFERRING read of that throws —
        // which would wedge compaction permanently
        val written = sp.read.option("basePath", dir)
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(keyName,
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("hp",
              org.apache.spark.sql.types.StringType))))
          .parquet(dir)
        val bf = written.stat.bloomFilter(keyName,
          math.max(n, BloomItems), BloomFpp)
        writeBloom(fsFor(sp, indexDir), bloomPath(indexDir, kind, name), bf)
      }
      Run(name, n)
    } finally { keys.unpersist(false); () }
    }
    rowsHint match {
      case Some(h) => graft.ops.Spread.withBatchWidth(sp, h)(body())
      case None => body()
    }
  }

  private def readRun(sp: SparkSession, indexDir: String, kind: String,
      keyName: String, r: Run): DataFrame =
    sp.read.option("basePath", s"$indexDir/$kind/${r.name}")
      .parquet(s"$indexDir/$kind/${r.name}").select(col(keyName))

  /** Per-kind wall-cost summary of one [[compact]] call — what the
    * leveled-compaction soak reports: `folded` rows came from deltas
    * (≈ batch-sized), `merged` rows were rewritten by same-size-class
    * run merges (binary-counter amortized: O(log n) rewrites per key
    * over the index lifetime), `total` is the live index size. */
  final case class CompactStats(folded: Long, merged: Long, total: Long)

  /** Fold every delta with id ≤ `upTo` into a new run per kind, then
    * merge runs of the same power-of-two size class (binary counter:
    * two ~equal runs merge into the next class, cascading), commit the
    * new run set via the manifest pointer, then delete the folded
    * deltas, superseded runs, and any orphan dirs. Safe to re-run
    * (idempotent: the same version rewrites the same run names with
    * the same content; probes meanwhile see the committed manifest's
    * runs + still-present deltas, and duplicate membership rows cannot
    * change a decision). NOT a full-base rewrite: a normal cycle costs
    * O(deltas); the biggest run is only rewritten when the corpus has
    * doubled since it was built. */
  def compact(sp: SparkSession, indexDir: String, upTo: Long)
      : Map[String, CompactStats] =
    withWriterLease(sp, indexDir)(compactLocked(sp, indexDir, upTo))

  private def compactLocked(sp: SparkSession, indexDir: String, upTo: Long)
      : Map[String, CompactStats] = {
    val fs = fsFor(sp, indexDir)
    val m = readManifest(sp, indexDir)
    if (upTo <= m.maxCompacted) return Map.empty
    val results = Kinds.map { kind =>
      val keyName = if (kind == "hashes") "h" else "bk"
      val deltas = deltaDirs(sp, indexDir, kind, m.maxCompacted, upTo + 1)
      var seq = 0
      def nextName(): String = { val n = s"run_${upTo}_$seq"; seq += 1; n }
      var runs = m.runs.getOrElse(kind, Nil)
      // retraction tombstones: every run written below excludes the
      // live tombstones' keys; `rows` in the manifest's tombs_<kind>
      // entry records the first compaction id that applied it. Dirs in
      // tswept_<kind> were LOGICALLY swept last cycle and await
      // physical deletion below — they are not live (not re-applied).
      val prevTombs = m.runs.getOrElse(s"tombs_$kind", Nil)
      val sweptPending = m.runs.getOrElse(s"tswept_$kind", Nil)
      val tombPaths = tombDirs(sp, indexDir, kind)
        .filterNot(d => sweptPending.exists(_.name == d.split("/").last))
      val tombRecords = tombPaths.map { d =>
        val n = d.split("/").last
        prevTombs.find(_.name == n).getOrElse(Run(n, upTo))
      }
      // SOURCE-SCOPED clean (input rows carry src_id): only pre-bound
      // copies of a retracted key are dropped — a key re-ingested
      // after the retraction keeps living in the index as dup-screen
      // prior state, so later arrivals of the re-admitted content are
      // still flagged as duplicates
      // with no live tombstone the fold/merge inputs stay in the
      // cheapest shape (single multi-path scans, no per-source tag);
      // the scoped shape is paid only while a retraction is pending
      val clean: DataFrame => DataFrame =
        if (tombPaths.isEmpty) identity
        else {
          val ids = readTombs(sp, tombPaths, keyName)
          df => antiJoinTombs(df, ids, keyName, tombPaths).drop("src_id")
        }
      var folded = 0L
      var mergedRows = 0L
      if (deltas.nonEmpty) {
        // input-row upper bound straight off the parquet footers —
        // driver-side, no job (the count() this replaces was one more
        // serialized job per compaction per kind); derives the fold's
        // shuffle width. Long.MaxValue = "unknown, keep full width"
        // (withBatchWidth saturates).
        val deltaRows =
          try footerRows(sp, deltas.map(_._2))
          catch { case _: Throwable => Long.MaxValue }
        val r = writeRun(sp, indexDir, kind, keyName, nextName(),
          clean(
            if (tombPaths.isEmpty)
              sp.read.parquet(deltas.map(_._2): _*).select(keyName)
            else {
              // same single multi-path scan as readPruned's scoped
              // branch: `batch=<id>` dir names ARE the source ids, so
              // basePath recovers them as a partition column
              val dirs = deltas.map(_._2)
              val parent = dirs.head.substring(0,
                dirs.head.lastIndexOf('/'))
              sp.read.option("basePath", parent).parquet(dirs: _*)
                .select(col(keyName), col("batch").cast("long").as("src_id"))
            }), rowsHint = Some(deltaRows))
        folded = r.rows
        if (r.rows > 0) runs :+= r
      }
      // binary-counter merge: while ANY adjacent pair in the
      // size-sorted run list shares a size class, fold that pair into
      // one (dedup shrinks: a key present in both counts once).
      // Scanning ALL positions — not just the two smallest — matters
      // when a fold lands a run directly in a HIGHER class that already
      // has an occupant (e.g. runs [2,5] + a new class-5 fold): the
      // bottom-pair-only loop would exit on the 2-vs-5 mismatch and
      // leave the 5/5 pair unmerged forever, breaking the <= log2(n)
      // run-count bound that keeps probe cost flat.
      var sorted = runs.sortBy(r => (r.rows, r.name))
      def samePair(rs: Seq[Run]): Option[Int] =
        (0 until rs.length - 1).find(i =>
          sizeClass(rs(i).rows) == sizeClass(rs(i + 1).rows))
      var pair = samePair(sorted)
      while (pair.isDefined) {
        val i = pair.get
        val (a, b) = (sorted(i), sorted(i + 1))
        def side(r: Run) = {
          val df = readRun(sp, indexDir, kind, keyName, r)
          if (tombPaths.isEmpty) df
          else df.withColumn("src_id", lit(srcIdOf(r.name)))
        }
        val merged = writeRun(sp, indexDir, kind, keyName, nextName(),
          clean(side(a).union(side(b))), rowsHint = Some(a.rows + b.rows))
        mergedRows += a.rows + b.rows
        // a fully-tombstoned merge yields zero rows — drop it (the
        // unreferenced dir is swept below) instead of looping on an
        // empty size class
        sorted = (sorted.patch(i,
          if (merged.rows > 0) Seq(merged) else Nil, 2))
          .sortBy(r => (r.rows, r.name))
        pair = samePair(sorted)
      }
      kind -> (sorted.sortBy(-_.rows),
        CompactStats(folded, mergedRows, sorted.map(_.rows).sum),
        tombRecords)
    }.toMap
    // tombstone lifecycle, two-phase so readers get the same
    // one-generation grace as runs: a tombstone is LOGICALLY sweepable
    // once every live run of its kind postdates-or-equals its first
    // application AND that already held at the previous manifest; it
    // then moves to tswept_<kind> (files stay on disk — in-flight
    // readers still anti-join them, harmlessly) and is PHYSICALLY
    // deleted at the NEXT compaction.
    def allClean(rs: Seq[Run], appliedAt: Long): Boolean =
      rs.forall(r => "run_(\\d+)_".r.findFirstMatchIn(r.name)
        .exists(_.group(1).toLong >= appliedAt))
    val tombSplit = Kinds.map { kind =>
      val (runsNow, _, tombRecords) = results(kind)
      kind -> tombRecords.partition { tb =>
        m.runs.getOrElse(s"tombs_$kind", Nil).exists(_.name == tb.name) &&
          allClean(m.runs.getOrElse(kind, Nil), tb.rows) &&
          allClean(runsNow, tb.rows)
      }
    }.toMap
    // physical deletion of LAST cycle's logically-swept tombstones,
    // BEFORE publishing the manifest that drops their tswept records:
    // their one-generation reader grace already elapsed, and the
    // reverse order leaves a crash window (manifest published, dirs
    // still on disk with no record) in which the next compaction would
    // read the undeleted dir as a brand-new LIVE tombstone and silently
    // re-retract keys that were legitimately re-ingested after the
    // sweep. With deletion first, a crash leaves dirs gone + the OLD
    // manifest still naming them in tswept — the next compaction's
    // delete of a missing dir is a no-op and nothing is re-applied.
    Kinds.foreach { kind =>
      m.runs.getOrElse(s"tswept_$kind", Nil).foreach { tb =>
        val dir = s"${tombsDir(indexDir, kind)}/${tb.name}"
        fs.delete(new Path(dir), true)
        // evict the fast-path verdicts that referenced this dir —
        // without it the cache grows one dir-SET key per retraction
        // wave until the wholesale 256-cap clear (the r15 soak's
        // driver-state gauge caught the linear creep)
        // exact dir-token match: the key is the space-joined dir SET, and
        // substring matching would also evict .../t_10 when .../t_1 dies
        // (over-eviction is correct but re-runs the validation job)
        tombFastOk.keySet.removeIf(_.split(' ').contains(dir))
        ()
      }
    }
    writeManifest(sp, indexDir,
      Manifest(upTo,
        (results.map { case (k, v) => k -> v._1 } ++
          tombSplit.map { case (k, v) => s"tombs_$k" -> v._2 } ++
          Kinds.map(k => s"tswept_$k" ->
            tombSplit(k)._1.map(tb => Run(tb.name, upTo))))
          .filter(_._2.nonEmpty),
        m.cents))
    // cleanup AFTER commit, with ONE-GENERATION retention (MVCC-lite):
    // dirs superseded by THIS compaction stay on disk until the NEXT
    // one, so a reader that planned its scan against the previous
    // manifest survives this cleanup — it only needs to finish within
    // one compaction interval. Deleted now: deltas the PREVIOUS
    // manifest had already folded (swept from -1, so a retry-rewritten
    // delta whose compaction committed long ago is still collected one
    // generation later, never orphaned forever) and run dirs that
    // neither the new nor the previous manifest references
    // (2-generations-old merges and crashed-compaction orphans).
    Kinds.foreach { kind =>
      deltaDirs(sp, indexDir, kind, -1L, m.maxCompacted + 1)
        .foreach { case (id, d) =>
          fs.delete(new Path(d), true)
          deleteBloom(fs, bloomPath(indexDir, kind, s"batch=$id"))
        }
      val retained = results(kind)._1.map(_.name).toSet ++
        m.runs.getOrElse(kind, Nil).map(_.name)
      runDirsOnDisk(sp, indexDir, kind).filterNot(retained).foreach { n =>
        fs.delete(new Path(s"$indexDir/$kind/$n"), true)
        deleteBloom(fs, bloomPath(indexDir, kind, n))
      }
    }
    results.map { case (k, v) => k -> v._2 }
  }

  /** Does `indexDir` hold state from a previous run? (Restart-guard
    * probe for [[StreamOps.dedupIngestStream]].) */
  private[streaming] def nonEmpty(sp: SparkSession, indexDir: String)
      : Boolean = {
    val fs = fsFor(sp, indexDir)
    fs.exists(new Path(s"$indexDir/manifest.json")) ||
      Kinds.exists { kind =>
        val p = new Path(s"$indexDir/$kind")
        fs.exists(p) && fs.listStatus(p)
          .exists(_.getPath.getName.startsWith("batch="))
      }
  }
}
