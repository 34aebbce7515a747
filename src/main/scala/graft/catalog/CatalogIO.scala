package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/** ColumnConfig.json-compatible catalog IO (reference
  * `util/CommonUtils.loadColumnConfigList`,
  * `container/obj/ColumnConfig.java:45`) — same field names and shape as
  * the reference's machine-written catalog, so a Shifu user's existing
  * ColumnConfig.json loads directly. Driver-side only; executors never
  * touch JSON (profiles fold into plans as literals).
  */
object CatalogIO {
  private val mapper = new ObjectMapper()

  private def kindToType(k: ColumnKind): String = k match {
    case ColumnKind.Numeric     => "N"
    case ColumnKind.Categorical => "C"
    case ColumnKind.Hybrid      => "H"
    case ColumnKind.Auto        => "A"
  }
  private def typeToKind(s: String): ColumnKind = s match {
    case "N" => ColumnKind.Numeric
    case "C" => ColumnKind.Categorical
    case "H" => ColumnKind.Hybrid
    case _   => ColumnKind.Auto
  }

  /** Flag names per reference `ColumnConfig.java:38-40` enum ColumnFlag. */
  private def flagToName(f: ColumnFlag): String = f match {
    case ColumnFlag.ForceSelect => "ForceSelect"
    case ColumnFlag.ForceRemove => "ForceRemove"
    case ColumnFlag.Candidate   => "Candidate"
    case ColumnFlag.Meta        => "Meta"
    case ColumnFlag.Target      => "Target"
    case ColumnFlag.Weight      => "Weight"
  }
  private def nameToFlag(s: String): Option[ColumnFlag] = s match {
    case "ForceSelect" => Some(ColumnFlag.ForceSelect)
    case "ForceRemove" => Some(ColumnFlag.ForceRemove)
    case "Candidate"   => Some(ColumnFlag.Candidate)
    case "Meta"        => Some(ColumnFlag.Meta)
    case "Target"      => Some(ColumnFlag.Target)
    case "Weight"      => Some(ColumnFlag.Weight)
    case _             => None
  }

  def toJson(profiles: Seq[ColumnProfile]): String = {
    val arr = mapper.createArrayNode()
    profiles.foreach { p =>
      val o = arr.addObject()
      o.put("columnNum", p.columnNum)
      o.put("columnName", p.columnName)
      o.put("columnType", kindToType(p.kind))
      p.flag match {
        case Some(f) => o.put("columnFlag", flagToName(f))
        case None    => o.putNull("columnFlag")
      }
      o.put("finalSelect", p.finalSelect)
      // Full ColumnStats field set per reference ColumnStats.java:37-142.
      val st = o.putObject("columnStats")
      p.stats.max.foreach(st.put("max", _))
      p.stats.min.foreach(st.put("min", _))
      p.stats.mean.foreach(st.put("mean", _))
      p.stats.median.foreach(st.put("median", _))
      p.stats.p25.foreach(st.put("p25th", _))
      p.stats.p75.foreach(st.put("p75th", _))
      st.put("totalCount", p.stats.totalCount)
      st.put("missingCount", p.stats.missingCount)
      st.put("validNumCount", p.stats.validNumCount)
      st.put("missingPercentage", p.stats.missingPercentage)
      p.stats.stdDev.foreach(st.put("stdDev", _))
      p.stats.distinctCount.foreach(st.put("distinctCount", _))
      p.stats.ks.foreach(st.put("ks", _))
      p.stats.iv.foreach(st.put("iv", _))
      p.stats.woe.foreach(st.put("woe", _))
      p.stats.weightedKs.foreach(st.put("weightedKs", _))
      p.stats.weightedIv.foreach(st.put("weightedIv", _))
      p.stats.weightedWoe.foreach(st.put("weightedWoe", _))
      p.stats.skewness.foreach(st.put("skewness", _))
      p.stats.kurtosis.foreach(st.put("kurtosis", _))
      p.stats.psi.foreach(st.put("psi", _))
      if (p.stats.unitStats.nonEmpty) {
        val us = st.putArray("unitStats")
        p.stats.unitStats.foreach(us.add)
      }
      val bn = o.putObject("columnBinning")
      bn.put("length", p.binning.length)
      putDoubleArray(bn, "binBoundary", p.binning.binBoundary)
      if (p.binning.binCategory.nonEmpty) {
        val a = bn.putArray("binCategory")
        p.binning.binCategory.foreach(a.add)
      } else bn.putNull("binCategory")
      putLongArray(bn, "binCountNeg", p.binning.binCountNeg)
      putLongArray(bn, "binCountPos", p.binning.binCountPos)
      putDoubleArray(bn, "binPosRate", p.binning.binPosRate)
      putDoubleArray(bn, "binAvgScore", p.binning.binAvgScore)
      putDoubleArray(bn, "binWeightedNeg", p.binning.binWeightedNeg)
      putDoubleArray(bn, "binWeightedPos", p.binning.binWeightedPos)
      putDoubleArray(bn, "binCountWoe", p.binning.binCountWoe)
      putDoubleArray(bn, "binWeightedWoe", p.binning.binWeightedWoe)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }

  /** -Infinity serialized as the string the reference uses. */
  private def putDoubleArray(o: ObjectNode, name: String,
                             xs: Seq[Double]): Unit =
    if (xs.isEmpty) { o.putNull(name); () }
    else {
      val a = o.putArray(name)
      xs.foreach { x =>
        if (x.isNegInfinity) a.add("-Infinity")
        else if (x.isPosInfinity) a.add("Infinity")
        else a.add(x)
        ()
      }
    }
  private def putLongArray(o: ObjectNode, name: String, xs: Seq[Long]): Unit =
    if (xs.isEmpty) { o.putNull(name); () }
    else { val a = o.putArray(name); xs.foreach(a.add); () }

  def fromJson(json: String): Seq[ColumnProfile] = {
    val root = mapper.readTree(json).asInstanceOf[ArrayNode]
    root.elements().asScala.map { n =>
      val st = n.path("columnStats")
      val bn = n.path("columnBinning")
      ColumnProfile(
        columnNum = n.path("columnNum").asInt(),
        columnName = n.path("columnName").asText(),
        kind = typeToKind(n.path("columnType").asText("A")),
        flag = {
          val f = n.path("columnFlag")
          if (f.isMissingNode || f.isNull) None else nameToFlag(f.asText())
        },
        finalSelect = n.path("finalSelect").asBoolean(false),
        stats = ColumnStats(
          max = optD(st, "max"), min = optD(st, "min"),
          mean = optD(st, "mean"), median = optD(st, "median"),
          p25 = optD(st, "p25th"), p75 = optD(st, "p75th"),
          totalCount = st.path("totalCount").asLong(0),
          missingCount = st.path("missingCount").asLong(0),
          validNumCount = st.path("validNumCount").asLong(0),
          missingPercentage = st.path("missingPercentage").asDouble(0.0),
          stdDev = optD(st, "stdDev"),
          distinctCount = optL(st, "distinctCount"),
          ks = optD(st, "ks"), iv = optD(st, "iv"), woe = optD(st, "woe"),
          weightedKs = optD(st, "weightedKs"),
          weightedIv = optD(st, "weightedIv"),
          weightedWoe = optD(st, "weightedWoe"),
          skewness = optD(st, "skewness"), kurtosis = optD(st, "kurtosis"),
          psi = optD(st, "psi"),
          unitStats = stringVec(st, "unitStats")),
        binning = ColumnBinning(
          binBoundary = doubleVec(bn, "binBoundary"),
          binCategory = stringVec(bn, "binCategory"),
          binCountNeg = longVec(bn, "binCountNeg"),
          binCountPos = longVec(bn, "binCountPos"),
          binPosRate = doubleVec(bn, "binPosRate"),
          binAvgScore = doubleVec(bn, "binAvgScore"),
          binWeightedNeg = doubleVec(bn, "binWeightedNeg"),
          binWeightedPos = doubleVec(bn, "binWeightedPos"),
          binCountWoe = doubleVec(bn, "binCountWoe"),
          binWeightedWoe = doubleVec(bn, "binWeightedWoe")))
    }.toSeq
  }

  def write(path: String, profiles: Seq[ColumnProfile]): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toJson(profiles))
  def read(path: String): Seq[ColumnProfile] =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def optD(n: JsonNode, f: String): Option[Double] = {
    val v = n.path(f)
    if (v.isMissingNode || v.isNull) None else Some(v.asDouble())
  }
  private def optL(n: JsonNode, f: String): Option[Long] = {
    val v = n.path(f)
    if (v.isMissingNode || v.isNull) None else Some(v.asLong())
  }
  private def doubleVec(n: JsonNode, f: String): Vector[Double] = {
    val v = n.path(f)
    if (!v.isArray) Vector.empty
    else v.elements().asScala.map { e =>
      if (e.isTextual) e.asText() match {
        case "-Infinity" => Double.NegativeInfinity
        case "Infinity"  => Double.PositiveInfinity
        case s           => s.toDouble
      } else e.asDouble()
    }.toVector
  }
  private def longVec(n: JsonNode, f: String): Vector[Long] = {
    val v = n.path(f)
    if (!v.isArray) Vector.empty
    else v.elements().asScala.map(_.asLong()).toVector
  }
  private def stringVec(n: JsonNode, f: String): Vector[String] = {
    val v = n.path(f)
    if (!v.isArray) Vector.empty
    else v.elements().asScala.map(_.asText()).toVector
  }
}
