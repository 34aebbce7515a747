package graft.tools

/** Same-session A/B for the Spread.widen sites: alternates the
  * `spark.sql.graft.widen` runtime conf OFF/ON per rep (2 reps each
  * after one discarded warm rep per mode) and prints min seconds per
  * mode — immune to the box's cross-window throughput swings.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.AbWiden q_a q_b ... */
object AbWiden {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(widen: Boolean): Double = {
        spark.conf.set(graft.ops.Spread.Key, widen.toString)
        val t0 = System.nanoTime()
        // crashed reps are invalid, not fast (see AbConf)
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            println(s"[abwiden] $name FAILED under widen=$widen: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        Harness.dropLeftovers(spark)
        if (ok) t else Double.NaN
      }
      once(false); once(true) // plan/codegen warm-up, both shapes
      // interleaved (see AbConf): sequential blocks bias ~10-20%
      // against the later mode as session heat accumulates
      val reps = (1 to 3).flatMap(_ => Seq(false -> once(false),
        true -> once(true)))
      val offs = reps.collect { case (false, t) if !t.isNaN => t }
      val ons = reps.collect { case (true, t) if !t.isNaN => t }
      if (offs.isEmpty || ons.isEmpty)
        println(s"[abwiden] $name INVALID (a mode failed every rep)")
      else {
        val (off, on) = (offs.min, ons.min)
        println(f"[abwiden] $name%-26s off=$off%6.2f on=$on%6.2f " +
          f"ratio=${on / off}%5.2f")
      }
    }
    spark.stop()
  }
}
