package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper

/** [[DataSpec]] ⇄ JSON — the engine's ModelConfig.json `dataSet` subset
  * (reference `container/obj/ModelConfig.java:65-95`,
  * `ModelSourceDataConf.java`: targetColumnName, posTags, negTags,
  * weightColumnName, filterExpressions, missingOrInvalidValues). Field
  * names follow the reference so a hand-written reference config's
  * dataSet block reads in directly; `shifu new` parity is the CLI `new`
  * verb writing this starter file. */
object SpecIO {
  private val mapper = new ObjectMapper()

  def toJson(s: DataSpec): String = {
    val root = mapper.createObjectNode()
    val ds = root.putObject("dataSet")
    ds.put("targetColumnName", s.targetColumn)
    val pos = ds.putArray("posTags"); s.posTags.toSeq.sorted.foreach(pos.add)
    val neg = ds.putArray("negTags"); s.negTags.toSeq.sorted.foreach(neg.add)
    s.weightColumn.foreach(ds.put("weightColumnName", _))
    if (s.filterExpressions.nonEmpty) {
      // Write-compat: the reference's RawSourceData.filterExpressions is a
      // STRING (';'-joined), so emit that form whenever it's lossless —
      // a graft-written ModelConfig.json then Jackson-binds in reference
      // tooling. Only when an expression itself contains ';' (would be
      // corrupted by the join) do we fall back to a JSON array, which the
      // reader on both sides of this codebase accepts but the reference
      // does not — a documented divergence limited to the unrepresentable
      // case.
      if (s.filterExpressions.forall(!_.contains(";"))) {
        ds.put("filterExpressions", s.filterExpressions.mkString(";"))
        ()
      } else {
        val fe = ds.putArray("filterExpressions")
        s.filterExpressions.foreach(fe.add)
        ()
      }
    }
    val miss = ds.putArray("missingOrInvalidValues")
    s.missingValues.toSeq.sorted.foreach(miss.add)
    ds.put("maxNumBin", s.maxNumBin)
    ds.put("stdDevCutOff", s.stdDevCutOff)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): DataSpec = {
    val ds = mapper.readTree(json).path("dataSet")
    require(!ds.isMissingNode, "spec file must carry a dataSet object")
    def strs(f: String): Set[String] = {
      val n = ds.path(f)
      (0 until n.size()).map(n.get(_).asText()).toSet
    }
    DataSpec(
      targetColumn = ds.path("targetColumnName").asText(),
      posTags = strs("posTags"),
      negTags = strs("negTags"),
      weightColumn =
        Option(ds.path("weightColumnName").asText(null)).filter(_.nonEmpty),
      missingValues =
        if (ds.has("missingOrInvalidValues")) strs("missingOrInvalidValues")
        else Set("", "?"),
      filterExpressions = {
        val n = ds.path("filterExpressions")
        if (n.isArray) (0 until n.size()).map(n.get(_).asText())
        else Option(n.asText(null)) // legacy ';'-joined reference form
          .filter(_.nonEmpty).map(_.split(";").toSeq).getOrElse(Nil)
      },
      maxNumBin = ds.path("maxNumBin").asInt(10),
      stdDevCutOff = ds.path("stdDevCutOff").asDouble(6.0))
  }

  def write(path: String, s: DataSpec): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(s))
  def read(path: String): DataSpec =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
