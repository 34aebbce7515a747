package graft.catalog

/** Typed catalog — the Spark-native replacement for the reference's two JSON
  * files (`ModelConfig.json` / `ColumnConfig.json`; see
  * reference `container/obj/ModelConfig.java:65-95` and
  * `container/obj/ColumnConfig.java:45`).
  *
  * In the reference every Pig/MR task re-reads these JSONs from HDFS
  * (`udf/AbstractTrainerUDF.java:40-90`). Here the catalog lives on the
  * driver and is *folded into the plan as literals* (generated Column trees)
  * or broadcast — zero per-task deserialization at any scale.
  */

/** Column role flags — reference `container/obj/ColumnConfig.java:38-40`. */
sealed trait ColumnFlag
object ColumnFlag {
  case object ForceSelect extends ColumnFlag
  case object ForceRemove extends ColumnFlag
  case object Candidate   extends ColumnFlag
  case object Meta        extends ColumnFlag
  case object Target      extends ColumnFlag
  case object Weight      extends ColumnFlag
}

/** Column type — reference `container/obj/ColumnType.java:19-21`:
  * A=auto (undecided), N=numeric, C=categorical, H=hybrid. */
sealed trait ColumnKind
object ColumnKind {
  case object Auto        extends ColumnKind
  case object Numeric     extends ColumnKind
  case object Categorical extends ColumnKind
  case object Hybrid      extends ColumnKind
}

/** Per-column statistics — reference `container/obj/ColumnStats.java:37-142`. */
final case class ColumnStats(
    max: Option[Double] = None,
    min: Option[Double] = None,
    mean: Option[Double] = None,
    median: Option[Double] = None,
    p25: Option[Double] = None,
    p75: Option[Double] = None,
    totalCount: Long = 0L,
    distinctCount: Option[Long] = None,
    missingCount: Long = 0L,
    validNumCount: Long = 0L,
    stdDev: Option[Double] = None,
    missingPercentage: Double = 0.0,
    woe: Option[Double] = None,
    weightedWoe: Option[Double] = None,
    ks: Option[Double] = None,
    weightedKs: Option[Double] = None,
    iv: Option[Double] = None,
    weightedIv: Option[Double] = None,
    skewness: Option[Double] = None,
    kurtosis: Option[Double] = None,
    psi: Option[Double] = None,
    unitStats: Vector[String] = Vector.empty)  // ColumnStats.java:142

/** Per-column binning — reference `container/obj/ColumnBinning.java:40-100`.
  * Numeric bins hold left edges with a -Infinity head; categorical bins hold
  * the category list. Convention everywhere: LAST bin index = missing/invalid
  * (reference `udf/stats/NumericalVarStats.java` statsNumericalColumnInfo). */
final case class ColumnBinning(
    binBoundary: Vector[Double] = Vector.empty,     // numeric: left edges, head -Inf
    binCategory: Vector[String] = Vector.empty,     // categorical
    binCountNeg: Vector[Long] = Vector.empty,
    binCountPos: Vector[Long] = Vector.empty,
    binPosRate: Vector[Double] = Vector.empty,
    binAvgScore: Vector[Double] = Vector.empty,
    binWeightedNeg: Vector[Double] = Vector.empty,
    binWeightedPos: Vector[Double] = Vector.empty,
    binCountWoe: Vector[Double] = Vector.empty,
    binWeightedWoe: Vector[Double] = Vector.empty) {
  /** Number of value bins (excluding the trailing missing bin). */
  def length: Int =
    if (binBoundary.nonEmpty) binBoundary.length else binCategory.length
}

/** One column's full profile — a row of the `ColumnConfig.json` list. */
final case class ColumnProfile(
    columnNum: Int,
    columnName: String,
    kind: ColumnKind = ColumnKind.Auto,
    flag: Option[ColumnFlag] = None,
    finalSelect: Boolean = false,
    stats: ColumnStats = ColumnStats(),
    binning: ColumnBinning = ColumnBinning()) {
  def isTarget: Boolean = flag.contains(ColumnFlag.Target)
  def isMeta: Boolean   = flag.contains(ColumnFlag.Meta) || isTarget
  def isCandidate: Boolean =
    !isMeta && !flag.contains(ColumnFlag.ForceRemove) &&
      !flag.contains(ColumnFlag.Weight)
}

/** Binning method — reference `container/obj/ModelStatsConf.java:34-36`. */
sealed trait BinningMethod
object BinningMethod {
  case object EqualTotal    extends BinningMethod
  case object EqualPositive extends BinningMethod
  case object EqualNegative extends BinningMethod
  case object EqualInterval extends BinningMethod
  case object WeightEqualTotal    extends BinningMethod
  case object WeightEqualPositive extends BinningMethod
  case object WeightEqualNegative extends BinningMethod
}

/** Normalization type — reference `container/obj/ModelNormalizeConf.java:33-53`. */
sealed trait NormType
object NormType {
  case object ZScale          extends NormType
  case object ZScaleOneHot    extends NormType
  case object Woe             extends NormType
  case object WeightWoe       extends NormType
  case object Hybrid          extends NormType
  case object WeightHybrid    extends NormType
  case object WoeZScore       extends NormType
  case object WeightWoeZScore extends NormType
  case object OneHot          extends NormType
  case object AsIsWoe         extends NormType
  case object AsIsPr          extends NormType
  case object DiscreteZScore  extends NormType
  case object ZScaleIndex     extends NormType
  case object WoeIndex        extends NormType
  case object WoeZScaleIndex  extends NormType
  case object Raw             extends NormType
}

/** Dataset-level spec — the subset of ModelConfig.dataSet the engine needs
  * (reference `container/obj/RawSourceData.java`). */
final case class DataSpec(
    targetColumn: String,
    posTags: Set[String],
    negTags: Set[String],
    weightColumn: Option[String] = None,
    missingValues: Set[String] = Set("", "?"),   // ModelSourceDataConf.java:50
    filterExpressions: Seq[String] = Nil,
    maxNumBin: Int = 10,                          // ModelStatsConf.java:57
    stdDevCutOff: Double = 6.0)                   // ModelNormalizeConf.java:71
