package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** Named eval-set bookkeeping — the reference's `shifu eval -new/-list/
  * -delete/-switch/-run <EvalSetName>` lifecycle (`EvalConfig.java:41-84`:
  * name + its own RawSourceData + performanceBucketNum + scoreScale).
  * One JSON file holds every eval set plus the "current" pointer, the
  * engine-side equivalent of the reference's evals list inside
  * ModelConfig.json. Driver-side only. */
final case class EvalSet(
    name: String,
    dataPath: String,
    spec: DataSpec,
    scoreColumn: Option[String] = None,   // scoreMetaColumn
    performanceBucketNum: Int = 10,       // EvalConfig.java:46
    scoreScale: Long = 1000L)             // EvalConfig.java:50

final case class EvalSets(current: Option[String], sets: Vector[EvalSet]) {
  def find(name: String): Option[EvalSet] = sets.find(_.name == name)
}

object EvalSetIO {
  private val mapper = new ObjectMapper()

  def toJson(es: EvalSets): String = {
    val root = mapper.createObjectNode()
    es.current match {
      case Some(c) => root.put("current", c)
      case None    => root.putNull("current")
    }
    val arr = root.putArray("evals")
    es.sets.foreach { s =>
      // embed the SpecIO dataSet block verbatim (same field names the
      // reference's RawSourceData carries), then the EvalConfig extras
      val o = mapper.readTree(SpecIO.toJson(s.spec)).asInstanceOf[ObjectNode]
      o.put("name", s.name)
      o.put("dataPath", s.dataPath)
      s.scoreColumn.foreach(o.put("scoreMetaColumn", _))
      o.put("performanceBucketNum", s.performanceBucketNum)
      o.put("scoreScale", s.scoreScale)
      arr.add(o)
      ()
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): EvalSets = {
    val root = mapper.readTree(json)
    val cur = Option(root.path("current").asText(null)).filter(_.nonEmpty)
    val sets = root.path("evals").elements().asScala.map { n =>
      EvalSet(
        name = n.path("name").asText(),
        dataPath = n.path("dataPath").asText(),
        spec = SpecIO.fromJson(n.toString), // carries the dataSet block
        scoreColumn =
          Option(n.path("scoreMetaColumn").asText(null)).filter(_.nonEmpty),
        performanceBucketNum = n.path("performanceBucketNum").asInt(10),
        scoreScale = n.path("scoreScale").asLong(1000L))
    }.toVector
    EvalSets(cur, sets)
  }

  def write(path: String, es: EvalSets): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(es))
  def read(path: String): EvalSets =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
  def readOrEmpty(path: String): EvalSets =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) read(path)
    else EvalSets(None, Vector.empty)
}
