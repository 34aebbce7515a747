package graft.tools

/** Same-session A/B for any runtime-settable SQL conf: alternates
  * `key` between `off` and `on` per rep (one discarded warm rep per
  * mode, then 2 measured reps each) and prints min seconds per mode —
  * immune to the box's cross-window throughput swings.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.AbConf \
  *          <key> <offValue> <onValue> q_a q_b ... */
object AbConf {
  def main(args: Array[String]): Unit = {
    val (key, offV, onV) = (args(0), args(1), args(2))
    val names = args.drop(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(v: String): Double = {
        spark.conf.set(key, v)
        val t0 = System.nanoTime()
        // a crashed rep must NOT be timed (a fast failure would be
        // reported as a huge "speedup") — mark it invalid instead
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            println(s"[abconf] $name FAILED under $key=$v: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        Harness.dropLeftovers(spark)
        if (ok) t else Double.NaN
      }
      once(offV); once(onV) // plan/codegen warm-up, both shapes
      // INTERLEAVED reps: sequential off-then-on blocks systematically
      // bias against the later mode as session heat (codegen caches,
      // GC debt) accumulates — alternate so both modes see the same
      // drift and min-of-3 cancels it
      val reps = (1 to 3).flatMap(_ => Seq(false -> once(offV),
        true -> once(onV)))
      val offs = reps.collect { case (false, t) if !t.isNaN => t }
      val ons = reps.collect { case (true, t) if !t.isNaN => t }
      if (offs.isEmpty || ons.isEmpty)
        println(s"[abconf] $name INVALID (a mode failed every rep)")
      else {
        val (off, on) = (offs.min, ons.min)
        println(f"[abconf] $name%-26s off=$off%6.2f on=$on%6.2f " +
          f"ratio=${on / off}%5.2f   ($key $offV->$onV)")
      }
    }
    spark.stop()
  }
}
