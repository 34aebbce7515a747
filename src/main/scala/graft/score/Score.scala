package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model scoring & encoding operators (reference `core/Scorer.java:40-200`,
  * `core/ModelRunner.java:180-230`, `udf/EvalScoreUDF.java:226-400`).
  *
  * The reference deserializes N model specs in every task and loops rows in
  * a Pig UDF. Here a model is a driver-side spec folded into the plan as a
  * literal Column expression tree — scoring is a pure narrow map inside
  * whole-stage codegen, and a bagged ensemble is just N parallel expression
  * trees + array aggregates (mean/median/max/min per
  * `container/CaseScoreResult.java:30-90`).
  */
object Score {

  /** Logistic model as (feature → weight) + bias; weight order is the Seq
    * order so the z-sum folds deterministically. */
  final case class LinearModel(weights: Seq[(String, Double)], bias: Double) {
    def z: Column =
      weights.map { case (c, w) => col(c) * lit(w) }.reduce(_ + _) + lit(bias)
    /** sigmoid(z), the reference's NN output activation. */
    def score: Column = lit(1.0) / (lit(1.0) + exp(lit(0.0) - z))
    /** z with feature `f` replaced by a fixed value — the sensitivity
      * masking of `core/varselect/VarSelectMapper.java:277-400`. */
    def zMasked(f: String, fill: Double): Column =
      weights.map { case (c, w) =>
        (if (c == f) lit(fill) else col(c)) * lit(w)
      }.reduce(_ + _) + lit(bias)
    def scoreMasked(f: String, fill: Double): Column =
      lit(1.0) / (lit(1.0) + exp(lit(0.0) - zMasked(f, fill)))
  }

  /** Ensemble stats over N model scores, scaled by `scoreScale` (reference
    * default 1000, `EvalConfig.java:50`): mean/max/min/median. */
  def ensemble(models: Seq[LinearModel], scale: Double = 1000.0)
      : Seq[Column] = {
    val arr = array(models.map(_.score): _*)
    val sorted = array_sort(arr)
    val n = models.length
    val median =
      if (n % 2 == 1) element_at(sorted, n / 2 + 1)
      else (element_at(sorted, n / 2) + element_at(sorted, n / 2 + 1)) / 2
    Seq(
      round(aggregate(arr, lit(0.0), (acc, x) => acc + x) / n * scale, 3)
        .as("score_mean"),
      round(array_max(arr) * scale, 3).as("score_max"),
      round(array_min(arr) * scale, 3).as("score_min"),
      round(median * scale, 3).as("score_median"))
  }

  /** Model export/import (reference `shifu export` verb,
    * `ShifuCLI.java:818-866`; spec-file model persistence): linear models
    * round-trip through a plain JSON spec so another process (or the eval
    * step of a later round) can reload and score identically — the exact
    * doubles survive via Double.toString/parseDouble round-trip. */
  def exportJson(models: Seq[LinearModel]): String = {
    // escape names: a column containing a quote, backslash or control
    // character (newline/tab/U+0000-U+001F) would otherwise emit
    // invalid JSON that importJson cannot parse
    def jesc(c: String): String = {
      val sb = new StringBuilder(c.length)
      c.foreach {
        case '\\'             => sb.append("\\\\")
        case '"'              => sb.append("\\\"")
        case ch if ch < 0x20  => sb.append(f"\\u${ch.toInt}%04x")
        case ch               => sb.append(ch)
      }
      sb.toString
    }
    def one(m: LinearModel): String = {
      val ws = m.weights
        .map { case (c, w) => s"""{"col":"${jesc(c)}","w":$w}""" }
        .mkString("[", ",", "]")
      s"""{"weights":$ws,"bias":${m.bias}}"""
    }
    models.map(one).mkString("[", ",", "]")
  }

  def importJson(json: String): Seq[LinearModel] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    (0 until root.size()).map { i =>
      val m = root.get(i)
      val ws = m.get("weights")
      val weights = (0 until ws.size()).map { j =>
        val w = ws.get(j)
        (w.get("col").asText(), w.get("w").asDouble())
      }
      LinearModel(weights, m.get("bias").asDouble())
    }
  }

  /** PMML export (reference `shifu export pmml`,
    * `core/processor/ExportModelProcessor.java:70-150` +
    * `core/pmml/PMMLTranslator`): each logistic model becomes a PMML-4.2
    * `RegressionModel` (functionName="classification",
    * normalizationMethod="logit") with one `NumericPredictor` per weight —
    * the industry interchange so any PMML consumer can score the exported
    * model. Doubles are serialized with `Double.toString` so the
    * parse-back is bit-exact. */
  def exportPmml(models: Seq[LinearModel]): String = {
    val fields = models.flatMap(_.weights.map(_._1)).distinct
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val dict = fields.map(f =>
      s"""    <DataField name="${esc(f)}" optype="continuous" dataType="double"/>""")
      .mkString("\n")
    val ms = models.zipWithIndex.map { case (m, i) =>
      val mining = (m.weights.map(_._1).map(f =>
        s"""      <MiningField name="${esc(f)}"/>""") :+
        s"""      <MiningField name="target" usageType="target"/>""")
        .mkString("\n")
      val preds = m.weights.map { case (f, w) =>
        s"""        <NumericPredictor name="${esc(f)}" coefficient="$w"/>"""
      }.mkString("\n")
      s"""  <RegressionModel modelName="model_$i" functionName="classification" normalizationMethod="logit">
         |    <MiningSchema>
         |$mining
         |    </MiningSchema>
         |    <RegressionTable intercept="${m.bias}" targetCategory="1">
         |$preds
         |    </RegressionTable>
         |    <RegressionTable intercept="0.0" targetCategory="0"/>
         |  </RegressionModel>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PMML version="4.2" xmlns="http://www.dmg.org/PMML-4_2">
       |  <Header description="graft logistic ensemble"/>
       |  <DataDictionary numberOfFields="${fields.length + 1}">
       |$dict
       |    <DataField name="target" optype="categorical" dataType="string">
       |      <Value value="0"/>
       |      <Value value="1"/>
       |    </DataField>
       |  </DataDictionary>
       |$ms
       |</PMML>
       |""".stripMargin
  }

  /** Parse a PMML document produced by [[exportPmml]] (or any PMML-4.x
    * logistic `RegressionModel` with NumericPredictors on the
    * targetCategory="1" table) back into [[LinearModel]]s. JDK DOM only —
    * no external dependency. */
  def importPmml(xml: String): Seq[LinearModel] = {
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    db.setNamespaceAware(false)
    // XXE hardening: PMML arrives from user-supplied files (CLI path) —
    // never resolve DOCTYPE/external entities
    db.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    db.setXIncludeAware(false)
    db.setExpandEntityReferences(false)
    val doc = db.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val rms = doc.getElementsByTagName("RegressionModel")
    (0 until rms.getLength).map { i =>
      val rm = rms.item(i).asInstanceOf[org.w3c.dom.Element]
      val tables = rm.getElementsByTagName("RegressionTable")
      val t1 = (0 until tables.getLength).map(
        tables.item(_).asInstanceOf[org.w3c.dom.Element])
        .find(_.getAttribute("targetCategory") == "1").get
      val preds = t1.getElementsByTagName("NumericPredictor")
      val weights = (0 until preds.getLength).map { j =>
        val p = preds.item(j).asInstanceOf[org.w3c.dom.Element]
        (p.getAttribute("name"), p.getAttribute("coefficient").toDouble)
      }
      LinearModel(weights, t1.getAttribute("intercept").toDouble)
    }
  }

  /** Literal decision-tree node for tree-path encoding (reference
    * `udf/EncodeDataUDF.java:84-130`, `IndependentTreeModel.encode`). */
  sealed trait TreeNode
  final case class Split(feature: String, threshold: Double,
      left: TreeNode, right: TreeNode) extends TreeNode
  final case class Leaf(id: Int) extends TreeNode

  /** Root-to-leaf path string ("L"/"R" per split, ≤ depth chars) — pure
    * comparison CASE tree, bit-exact in any engine. */
  def encodePath(n: TreeNode): Column = n match {
    case Leaf(_) => lit("")
    case Split(f, t, l, r) =>
      when(col(f) <= lit(t), concat(lit("L"), encodePath(l)))
        .otherwise(concat(lit("R"), encodePath(r)))
  }

  /** Leaf id reached by the row. */
  def encodeLeaf(n: TreeNode): Column = n match {
    case Leaf(id) => lit(id)
    case Split(f, t, l, r) =>
      when(col(f) <= lit(t), encodeLeaf(l)).otherwise(encodeLeaf(r))
  }

  /** Equivalent SQL text for the same tree (oracle generation). */
  def pathSql(n: TreeNode): String = n match {
    case Leaf(_) => "''"
    case Split(f, t, l, r) =>
      s"CASE WHEN $f <= $t THEN 'L' || ${pathSql(l)} ELSE 'R' || ${pathSql(r)} END"
  }
  def leafSql(n: TreeNode): String = n match {
    case Leaf(id) => id.toString
    case Split(f, t, l, r) =>
      s"CASE WHEN $f <= $t THEN ${leafSql(l)} ELSE ${leafSql(r)} END"
  }
}
