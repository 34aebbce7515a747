package graft.catalog

/** Pre-flight validation of a user-written spec — the engine's
  * `core/validator/ModelInspector.java` parity (reference `probe` at
  * ModelInspector.java:93-193 dispatching per-step checkers). The
  * reference sanity-checks the MODEL SPEC before any job runs so a
  * malformed config fails in seconds with a readable cause list instead
  * of hours later inside a distributed step; `graft.Cli validate` gates
  * the *data*, this gates the *spec*.
  *
  * Pure driver math over the spec object — no Spark session, no scan.
  * Causes reuse the reference's wording where a check exists there
  * (cited per check below) so operators migrating from the reference
  * see familiar error classes.
  */
object SpecInspector {

  /** Reference `container/meta/ValidateResult`: ok + readable causes. */
  final case class Result(ok: Boolean, causes: Seq[String]) {
    def merge(other: Result): Result =
      Result(ok && other.ok, causes ++ other.causes)
  }
  private val Ok = Result(ok = true, Nil)
  private def fail(cause: String) = Result(ok = false, Seq(cause))

  /** ModelInspector.checkFile (ModelInspector.java:~560): blank / '~' /
    * nonexistent paths, with the same readable prefix convention. */
  def checkFile(path: String, prefix: String): Result =
    // the prefix carries its own trailing space (reference convention:
    // result.addCause(prefix + "doesn't exist - " + dataPath))
    if (path == null || path.trim.isEmpty)
      fail(prefix + "is null or empty - " + path)
    else if (path.trim.contains("~"))
      fail(prefix + "contains ~, which is not allowed - " + path)
    else if (!pathExists(path))
      fail(prefix + "doesn't exist - " + path)
    else Ok

  /** Existence probe through the Hadoop FS API so hdfs://, s3a:// and
    * other schemes resolve (a java.io.File probe reads every
    * distributed path as missing and the pre-flight inspector would
    * block a valid cluster run). Bare local paths behave as before. */
  private def pathExists(path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(path.trim)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        .exists(p)
    } catch { case _: Exception => false }

  /** Column-role bookkeeping (ModelInspector.checkColumnConf,
    * ModelInspector.java:213-261): the target must not be meta /
    * force-select / force-remove, and no column may sit in two lists. */
  def checkColumnRoles(target: String, meta: Seq[String],
      forceSelect: Seq[String], forceRemove: Seq[String]): Result = {
    var r = Ok
    if (meta.contains(target))
      r = r.merge(fail(
        "The target column name shouldn't be in the meta column conf."))
    if (forceRemove.contains(target))
      r = r.merge(fail(
        "The target column name shouldn't be in the force remove conf."))
    if (forceSelect.contains(target))
      r = r.merge(fail(
        "The target column name shouldn't be in the force select conf."))
    def overlap(a: Seq[String], b: Seq[String], an: String, bn: String) =
      a.toSet.intersect(b.toSet).toSeq.sorted.headOption.map(c =>
        fail(s"Column - $c exists both in $an and $bn."))
    Seq(
      overlap(meta, forceRemove, "meta column conf", "force remove conf"),
      overlap(meta, forceSelect, "meta column conf", "force select conf"),
      overlap(forceSelect, forceRemove,
        "force select conf", "force remove conf"))
      .flatten.foldLeft(r)(_ merge _)
  }

  /** The spec checks proper: target presence, pos/neg tag overlap, bin
    * count bounds (ModelInspector.checkStatsConf,
    * ModelInspector.java:263-303), stdDevCutOff positivity
    * (checkNormSetting, :388-401), numerical-target binning-method
    * restrictions (:287-301), and filter/weight JEXL parseability (the
    * engine's stricter stand-in for the reference's late Pig-UDF
    * failure). `binningMethod`/`binningAlgorithm` mirror
    * ModelStatsConf's enums when the caller carries them. */
  def checkSpec(spec: DataSpec,
      binningMethod: Option[String] = None,
      binningAlgorithm: Option[String] = None): Result = {
    var r = Ok
    // ModelInspector.java:217
    if (spec.targetColumn == null || spec.targetColumn.trim.isEmpty)
      r = r.merge(fail("The target column name is null or empty."))
    // tag-set sanity: the reference's tag-based target (posTags/negTags,
    // RawSourceData.java:91-96) degenerates silently if a tag is on both
    // sides — every such row would count as positive AND negative
    val both = spec.posTags.intersect(spec.negTags)
    if (both.nonEmpty)
      r = r.merge(fail("Identical tag(s) in posTags and negTags: " +
        both.toSeq.sorted.mkString(",")))
    val numericalTarget = spec.posTags.isEmpty && spec.negTags.isEmpty
    if (!numericalTarget && (spec.posTags.isEmpty || spec.negTags.isEmpty))
      r = r.merge(fail(
        "posTags and negTags must BOTH be set for a tag-based target " +
          "(both empty = numerical/regression target)."))
    // ModelInspector.java:283
    if (spec.maxNumBin > Short.MaxValue || spec.maxNumBin < 0)
      r = r.merge(fail("stats#maxNumBin should be in [0, 32767]."))
    // ModelInspector.java:395 (checkNormSetting)
    if (spec.stdDevCutOff <= 0)
      r = r.merge(fail(
        "stdDevCutOff should be positive value in normalize configuration"))
    // ModelInspector.java:287-301: numerical target restrictions
    if (numericalTarget) {
      binningMethod.foreach { m =>
        if (!Set("equalinterval", "equaltotal").contains(m.toLowerCase))
          r = r.merge(fail(
            "For numerical target, only EqualInterval and EqualTotal " +
              "are allowed"))
      }
      binningAlgorithm.foreach { a =>
        if (a.equalsIgnoreCase("DynamicBinning"))
          r = r.merge(fail(
            "For numerical target, DynamicBinning is not allowed"))
      }
    }
    // JEXL expressions must at least parse — the reference defers this to
    // runtime inside a Pig UDF, where the error surfaces per-row and late
    (spec.filterExpressions ++ spec.weightColumn.toSeq).foreach { e =>
      try { graft.expr.Jexl.translate(e); () }
      catch {
        case t: Throwable =>
          r = r.merge(fail(
            s"Expression does not parse as JEXL: '$e' (${t.getMessage})"))
      }
    }
    r
  }

  /** Eval-set bookkeeping (ModelInspector.java:170-180 eval loop; name
    * uniqueness is implicit in the reference's eval-set map): duplicate
    * names collide on artifacts, data paths must exist. */
  def checkEvalSets(sets: EvalSets): Result = {
    var r = Ok
    val dup = sets.sets.groupBy(_.name).collect {
      case (n, ss) if ss.length > 1 => n
    }.toSeq.sorted
    dup.foreach(n =>
      r = r.merge(fail(s"Eval set name '$n' is defined more than once.")))
    sets.current.foreach { c =>
      if (!sets.sets.exists(_.name == c))
        r = r.merge(fail(s"Current eval set '$c' does not exist."))
    }
    sets.sets.foreach { s =>
      r = r.merge(
        checkFile(s.dataPath, s"Eval Set - ${s.name}: data path "))
      if (s.performanceBucketNum <= 0)
        r = r.merge(fail(s"Eval Set - ${s.name}: performanceBucketNum " +
          "should be positive."))
    }
    r
  }

  /** Full probe — spec + optional data path + optional eval sets, the
    * CLI `inspect` verb's engine. */
  def probe(spec: DataSpec,
      dataPath: Option[String] = None,
      binningMethod: Option[String] = None,
      binningAlgorithm: Option[String] = None,
      meta: Seq[String] = Nil,
      forceSelect: Seq[String] = Nil,
      forceRemove: Seq[String] = Nil,
      evalSets: Option[EvalSets] = None): Result = {
    var r = checkSpec(spec, binningMethod, binningAlgorithm)
    if (spec.targetColumn != null && spec.targetColumn.trim.nonEmpty)
      r = r.merge(checkColumnRoles(
        spec.targetColumn, meta, forceSelect, forceRemove))
    dataPath.foreach(p =>
      r = r.merge(checkFile(p, "Train Set: data path ")))
    evalSets.foreach(s => r = r.merge(checkEvalSets(s)))
    r
  }
}
