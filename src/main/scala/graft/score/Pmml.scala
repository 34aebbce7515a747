package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PMML export/import for the two non-linear model families the reference
  * ships PMML builders for (`core/pmml/builder/impl/` — NN creators
  * `NeuralNetworkModelIntegrator.java` / `NNPmmlModelCreator.java`, tree
  * creators `TreeModelPmmlCreator` family; ~1,870 LoC of builder code).
  *
  * Spark design: the in-engine model forms are literal case classes
  * ([[Pmml.MlpModel]], [[Score.TreeNode]]) that FOLD INTO PLANS as codegen'd
  * Column expression trees — PMML is only the interchange format. Doubles
  * serialize via `Double.toString` so parse-back is bit-exact, like the
  * existing [[Score.exportPmml]] RegressionModel path.
  */
object Pmml {

  /** One affine layer: `w(out)(in)` + bias(out). */
  final case class MlpLayer(w: Vector[Vector[Double]], b: Vector[Double])

  /** A feed-forward MLP matching MLlib's MultilayerPerceptronClassifier
    * topology: sigmoid hidden layers, softmax output layer (reference NN
    * models are sigmoid-activated feed-forward nets, `core/dtrain/nn/`). */
  final case class MlpModel(features: Seq[String], layers: Seq[MlpLayer]) {
    require(layers.nonEmpty && layers.last.b.length == 2,
      "binary MLP: output layer must have 2 units (softmax)")

    /** P(class 1) as a pure Column expression — the whole forward pass
      * (every affine + sigmoid + the final softmax) runs inside
      * whole-stage codegen as scalar arithmetic; no UDF, no vector
      * assembly at scoring time. */
    def score: Column = {
      val input: Seq[Column] = features.map(col)
      def affine(layer: MlpLayer, h: Seq[Column]): Seq[Column] =
        layer.w.indices.map { o =>
          layer.w(o).zip(h).map { case (wi, hi) => lit(wi) * hi }
            .reduce(_ + _) + lit(layer.b(o))
        }
      val hidden = layers.dropRight(1).foldLeft(input) { (h, layer) =>
        affine(layer, h).map(z => lit(1.0) / (lit(1.0) + exp(lit(0.0) - z)))
      }
      val zs = affine(layers.last, hidden)
      // 2-class softmax, computed max-shifted for numerical stability
      val m = greatest(zs(0), zs(1))
      exp(zs(1) - m) / (exp(zs(0) - m) + exp(zs(1) - m))
    }
  }

  private def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  // ---- NeuralNetwork --------------------------------------------------------

  /** PMML-4.2 `NeuralNetwork`: NeuralInputs (one DerivedField/FieldRef per
    * feature), one NeuralLayer per affine layer (neuron ids "layer,idx",
    * `Con` weights in input order), hidden layers logistic, output layer
    * identity + softmax — the exact shape the reference's
    * `NeuralNetworkModelIntegrator` emits for its Encog nets. */
  def exportNN(m: MlpModel): String = {
    val dict = m.features.map(f =>
      s"""    <DataField name="${esc(f)}" optype="continuous" dataType="double"/>""")
      .mkString("\n")
    val mining = (m.features.map(f =>
      s"""      <MiningField name="${esc(f)}"/>""") :+
      s"""      <MiningField name="target" usageType="target"/>""")
      .mkString("\n")
    val inputs = m.features.zipWithIndex.map { case (f, i) =>
      s"""      <NeuralInput id="0,$i">
         |        <DerivedField optype="continuous" dataType="double">
         |          <FieldRef field="${esc(f)}"/>
         |        </DerivedField>
         |      </NeuralInput>""".stripMargin
    }.mkString("\n")
    val layerXml = m.layers.zipWithIndex.map { case (layer, li) =>
      val attrs =
        if (li == m.layers.length - 1)
          """activationFunction="identity" normalizationMethod="softmax""""
        else """activationFunction="logistic""""
      val neurons = layer.w.indices.map { o =>
        val cons = layer.w(o).zipWithIndex.map { case (w, in) =>
          s"""          <Con from="$li,$in" weight="$w"/>"""
        }.mkString("\n")
        s"""        <Neuron id="${li + 1},$o" bias="${layer.b(o)}">
           |$cons
           |        </Neuron>""".stripMargin
      }.mkString("\n")
      s"""      <NeuralLayer numberOfNeurons="${layer.b.length}" $attrs>
         |$neurons
         |      </NeuralLayer>""".stripMargin
    }.mkString("\n")
    val lastL = m.layers.length
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PMML version="4.2" xmlns="http://www.dmg.org/PMML-4_2">
       |  <Header description="graft mlp"/>
       |  <DataDictionary numberOfFields="${m.features.length + 1}">
       |$dict
       |    <DataField name="target" optype="categorical" dataType="string">
       |      <Value value="0"/>
       |      <Value value="1"/>
       |    </DataField>
       |  </DataDictionary>
       |  <NeuralNetwork functionName="classification" activationFunction="logistic" numberOfLayers="${m.layers.length}">
       |    <MiningSchema>
       |$mining
       |    </MiningSchema>
       |    <NeuralInputs numberOfInputs="${m.features.length}">
       |$inputs
       |    </NeuralInputs>
       |$layerXml
       |    <NeuralOutputs numberOfOutputs="2">
       |      <NeuralOutput outputNeuron="$lastL,0">
       |        <DerivedField optype="categorical" dataType="string">
       |          <NormDiscrete field="target" value="0"/>
       |        </DerivedField>
       |      </NeuralOutput>
       |      <NeuralOutput outputNeuron="$lastL,1">
       |        <DerivedField optype="categorical" dataType="string">
       |          <NormDiscrete field="target" value="1"/>
       |        </DerivedField>
       |      </NeuralOutput>
       |    </NeuralOutputs>
       |  </NeuralNetwork>
       |</PMML>
       |""".stripMargin
  }

  private def parseDoc(xml: String): org.w3c.dom.Document = {
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    db.setNamespaceAware(false)
    // XXE hardening, same policy as Score.importPmml: user-supplied files
    db.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    db.setXIncludeAware(false)
    db.setExpandEntityReferences(false)
    db.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  private def childElems(e: org.w3c.dom.Element,
                         tag: String): Seq[org.w3c.dom.Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case c: org.w3c.dom.Element if c.getTagName == tag => c
    }
  }

  /** Parse a document produced by [[exportNN]] back into [[MlpModel]]. */
  def importNN(xml: String): MlpModel = {
    val doc = parseDoc(xml)
    val nn = doc.getElementsByTagName("NeuralNetwork").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    val ins = nn.getElementsByTagName("NeuralInput")
    val features = (0 until ins.getLength).map { i =>
      ins.item(i).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("FieldRef").item(0)
        .asInstanceOf[org.w3c.dom.Element].getAttribute("field")
    }
    val layerNodes = nn.getElementsByTagName("NeuralLayer")
    val layers = (0 until layerNodes.getLength).map { li =>
      val layer = layerNodes.item(li).asInstanceOf[org.w3c.dom.Element]
      val neurons = childElems(layer, "Neuron")
      val w = neurons.map { n =>
        childElems(n, "Con").map(_.getAttribute("weight").toDouble).toVector
      }.toVector
      val b = neurons.map(_.getAttribute("bias").toDouble).toVector
      MlpLayer(w, b)
    }
    MlpModel(features, layers)
  }

  // ---- TreeModel ------------------------------------------------------------

  /** PMML-4.2 `TreeModel` (binarySplit, leaf score = leaf id) from the
    * literal [[Score.TreeNode]] form — the reference's tree PMML family
    * (`TreeModelPmmlCreator`); splits serialize as
    * `SimplePredicate lessOrEqual` / `greaterThan` mirroring
    * [[Score.encodePath]]'s `<=` convention. */
  def exportTree(t: Score.TreeNode, features: Seq[String]): String = {
    var nextId = 0
    def node(n: Score.TreeNode, pred: String, indent: String): String = {
      nextId += 1
      val id = nextId
      n match {
        case Score.Leaf(leafId) =>
          s"""$indent<Node id="$id" score="$leafId">
             |$indent  $pred
             |$indent</Node>""".stripMargin
        case Score.Split(f, th, l, r) =>
          val left = node(l,
            s"""<SimplePredicate field="${esc(f)}" operator="lessOrEqual" value="$th"/>""",
            indent + "  ")
          val right = node(r,
            s"""<SimplePredicate field="${esc(f)}" operator="greaterThan" value="$th"/>""",
            indent + "  ")
          s"""$indent<Node id="$id">
             |$indent  $pred
             |$left
             |$right
             |$indent</Node>""".stripMargin
      }
    }
    val dict = features.map(f =>
      s"""    <DataField name="${esc(f)}" optype="continuous" dataType="double"/>""")
      .mkString("\n")
    val mining = (features.map(f =>
      s"""      <MiningField name="${esc(f)}"/>""") :+
      s"""      <MiningField name="target" usageType="target"/>""")
      .mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PMML version="4.2" xmlns="http://www.dmg.org/PMML-4_2">
       |  <Header description="graft tree"/>
       |  <DataDictionary numberOfFields="${features.length + 1}">
       |$dict
       |    <DataField name="target" optype="categorical" dataType="string"/>
       |  </DataDictionary>
       |  <TreeModel functionName="classification" splitCharacteristic="binarySplit">
       |    <MiningSchema>
       |$mining
       |    </MiningSchema>
       |${node(t, "<True/>", "    ")}
       |  </TreeModel>
       |</PMML>
       |""".stripMargin
  }

  // ---- MiningModel / Segmentation (RF + GBT ensembles) ----------------------

  /** Regression-tree node for ensemble members: leaves carry the member's
    * real-valued contribution (class-1 probability for RF members, margin
    * contribution for GBT members) rather than a leaf id. */
  sealed trait RNode
  final case class RSplit(feature: String, threshold: Double,
      left: RNode, right: RNode) extends RNode
  final case class RLeaf(value: Double) extends RNode

  /** A tree ensemble as ONE literal model (reference intent:
    * `core/pmml/builder/impl/` tree creator family emits a single
    * MiningModel/Segmentation document per ensemble).
    *
    * `method` fixes the combination semantics to match MLlib scoring:
    *  - "average": P(1) = (Σ treeᵢ) / n — RandomForestClassificationModel's
    *    normalized-vote probability (each leaf carries its class-1 share);
    *  - "sum": P(1) = 1 / (1 + e^(−2·Σ wᵢ·treeᵢ)) —
    *    GBTClassificationModel's logistic link over the weighted margin. */
  final case class Ensemble(features: Seq[String], trees: Vector[RNode],
      weights: Vector[Double], method: String) {
    require(method == "average" || method == "sum", s"bad method '$method'")
    require(trees.length == weights.length, "one weight per tree")

    /** P(class 1) as a pure Column expression: every member tree folds
      * into a nested CASE WHEN chain inside whole-stage codegen — scoring
      * an n-tree ensemble is a narrow projection, no UDF, no model object
      * on the executors. */
    def score: Column = {
      def eval(n: RNode): Column = n match {
        case RLeaf(v) => lit(v)
        case RSplit(f, t, l, r) =>
          when(col(f) <= lit(t), eval(l)).otherwise(eval(r))
      }
      method match {
        case "average" =>
          trees.map(eval).reduce(_ + _) / lit(trees.length.toDouble)
        case "sum" =>
          val margin = trees.zip(weights)
            .map { case (t, w) => lit(w) * eval(t) }.reduce(_ + _)
          lit(1.0) / (lit(1.0) + exp(lit(-2.0) * margin))
      }
    }
  }

  /** Walk an MLlib tree into [[RNode]] form; `leafValue` maps a leaf to
    * its member contribution. Continuous splits only (the engine's
    * normalized feature space), same contract as `Train.toTree`. */
  private def walkMlTree(n: org.apache.spark.ml.tree.Node,
                         features: Seq[String],
                         leafValue: org.apache.spark.ml.tree.LeafNode => Double)
      : RNode = n match {
    case in: org.apache.spark.ml.tree.InternalNode =>
      val s = in.split match {
        case c: org.apache.spark.ml.tree.ContinuousSplit => c
        case other => throw new IllegalArgumentException(
          s"only continuous splits supported, got $other")
      }
      RSplit(features(s.featureIndex), s.threshold,
        walkMlTree(in.leftChild, features, leafValue),
        walkMlTree(in.rightChild, features, leafValue))
    case leaf: org.apache.spark.ml.tree.LeafNode => RLeaf(leafValue(leaf))
  }

  /** Leaf class-count vector via reflection: `LeafNode.impurityStats` and
    * `ImpurityCalculator.stats` are private[ml]/private[spark] in the
    * Scala signatures but public in bytecode — reading them is the only
    * way to get per-leaf class distributions without re-scoring data. */
  private def leafClassShare(leaf: org.apache.spark.ml.tree.LeafNode): Double = {
    val calc = leaf.getClass.getMethod("impurityStats").invoke(leaf)
    val stats = calc.getClass.getMethod("stats").invoke(calc)
      .asInstanceOf[Array[Double]]
    val total = stats.sum
    if (total == 0 || stats.length < 2) 0.0 else stats(1) / total
  }

  /** RF classifier → [[Ensemble]]: each member's leaves carry the class-1
    * share of that leaf's training rows; combination = plain average —
    * exactly `RandomForestClassificationModel.predictProbability`. */
  def fromRF(m: org.apache.spark.ml.classification.RandomForestClassificationModel,
             features: Seq[String]): Ensemble =
    Ensemble(features,
      m.trees.map(t => walkMlTree(t.rootNode, features, leafClassShare)).toVector,
      Vector.fill(m.trees.length)(1.0), "average")

  /** GBT classifier → [[Ensemble]]: members are the regression trees with
    * their boosting weights; combination = logistic over the weighted
    * margin — exactly `GBTClassificationModel`'s probability. */
  def fromGBT(m: org.apache.spark.ml.classification.GBTClassificationModel,
              features: Seq[String]): Ensemble =
    Ensemble(features,
      m.trees.map(t =>
        walkMlTree(t.rootNode, features, _.prediction)).toVector,
      m.treeWeights.toVector, "sum")

  /** PMML-4.2 `MiningModel` with one `Segment`/`TreeModel` per member.
    *
    * RF ("average"): standard `multipleModelMethod="average"` over the
    * per-leaf class-1 shares — any PMML consumer returns P(1) directly.
    *
    * GBT ("sum"): standard `multipleModelMethod="modelChain"` — each tree
    * segment outputs its margin as an `OutputField`, and a final
    * `RegressionModel` segment with `normalizationMethod="logit"` folds
    * them with coefficient `2·wᵢ`, so standard-logit
    * 1/(1+e^(−Σ2wᵢtᵢ)) equals MLlib's scaled link 1/(1+e^(−2·Σwᵢtᵢ)).
    * A standard consumer (e.g. jpmml) therefore returns P(1), not the
    * raw weighted margin — no private Extension contract involved.
    * Doubles via `Double.toString` (and /2 on import is a power-of-two
    * scale), so parse-back stays bit-exact. */
  def exportEnsemble(e: Ensemble): String = {
    def node(n: RNode, pred: String, indent: String): String = n match {
      case RLeaf(v) =>
        s"""$indent<Node score="$v">
           |$indent  $pred
           |$indent</Node>""".stripMargin
      case RSplit(f, th, l, r) =>
        val left = node(l,
          s"""<SimplePredicate field="${esc(f)}" operator="lessOrEqual" value="$th"/>""",
          indent + "  ")
        val right = node(r,
          s"""<SimplePredicate field="${esc(f)}" operator="greaterThan" value="$th"/>""",
          indent + "  ")
        s"""$indent<Node>
           |$indent  $pred
           |$left
           |$right
           |$indent</Node>""".stripMargin
    }
    val dict = e.features.map(f =>
      s"""    <DataField name="${esc(f)}" optype="continuous" dataType="double"/>""")
      .mkString("\n")
    val mining = e.features.map(f =>
      s"""      <MiningField name="${esc(f)}"/>""").mkString("\n")
    val isGbt = e.method == "sum"
    val segMethod = if (isGbt) "modelChain" else e.method
    val segments = e.trees.zip(e.weights).zipWithIndex.map {
      case ((t, w), i) =>
        // modelChain tree segments publish their margin for the final
        // regression segment; RF segments carry the (unit) vote weight
        val weightAttr = if (isGbt) "" else s""" weight="$w""""
        val output = if (isGbt)
          s"""
             |          <Output>
             |            <OutputField name="margin_${i + 1}" optype="continuous" dataType="double" feature="predictedValue"/>
             |          </Output>""".stripMargin
        else ""
        s"""      <Segment id="${i + 1}"$weightAttr>
           |        <True/>
           |        <TreeModel functionName="regression" splitCharacteristic="binarySplit">
           |          <MiningSchema>
           |$mining
           |          </MiningSchema>$output
           |${node(t, "<True/>", "          ")}
           |        </TreeModel>
           |      </Segment>""".stripMargin
    }.mkString("\n")
    val finalSegment = if (!isGbt) "" else {
      val regMining = e.trees.indices.map(i =>
        s"""            <MiningField name="margin_${i + 1}"/>""")
        .mkString("\n")
      val predictors = e.weights.zipWithIndex.map { case (w, i) =>
        s"""            <NumericPredictor name="margin_${i + 1}" coefficient="${2 * w}"/>"""
      }.mkString("\n")
      s"""
         |      <Segment id="${e.trees.length + 1}">
         |        <True/>
         |        <RegressionModel functionName="regression" normalizationMethod="logit">
         |          <MiningSchema>
         |$regMining
         |          </MiningSchema>
         |          <RegressionTable intercept="0.0">
         |$predictors
         |          </RegressionTable>
         |        </RegressionModel>
         |      </Segment>""".stripMargin
    }
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PMML version="4.2" xmlns="http://www.dmg.org/PMML-4_2">
       |  <Header description="graft tree ensemble"/>
       |  <DataDictionary numberOfFields="${e.features.length}">
       |$dict
       |  </DataDictionary>
       |  <MiningModel functionName="regression">
       |    <MiningSchema>
       |$mining
       |    </MiningSchema>
       |    <Segmentation multipleModelMethod="$segMethod">
       |$segments$finalSegment
       |    </Segmentation>
       |  </MiningModel>
       |</PMML>
       |""".stripMargin
  }

  /** Parse a document produced by [[exportEnsemble]] back into
    * [[Ensemble]] (method from `multipleModelMethod`, weights from
    * `Segment/@weight`, bit-exact doubles). */
  def importEnsemble(xml: String): Ensemble = {
    val doc = parseDoc(xml)
    val dictFields = doc.getElementsByTagName("DataField")
    val features = (0 until dictFields.getLength).map(i =>
      dictFields.item(i).asInstanceOf[org.w3c.dom.Element]
        .getAttribute("name"))
    def parseNode(e: org.w3c.dom.Element): RNode = {
      val kids = childElems(e, "Node")
      if (kids.isEmpty) RLeaf(e.getAttribute("score").toDouble)
      else {
        require(kids.length == 2, "binarySplit expects 2 children")
        val Seq(l, r) = kids
        val p = childElems(l, "SimplePredicate").head
        require(p.getAttribute("operator") == "lessOrEqual",
          "left child must carry the lessOrEqual predicate")
        RSplit(p.getAttribute("field"), p.getAttribute("value").toDouble,
          parseNode(l), parseNode(r))
      }
    }
    val seg = doc.getElementsByTagName("Segmentation").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    val method = seg.getAttribute("multipleModelMethod")
    val segs = childElems(seg, "Segment")
    if (method == "modelChain") {
      // GBT standard form: tree segments publish margins, the final
      // RegressionModel/logit segment holds 2·wᵢ as coefficients
      val treeSegs = segs.filter(
        _.getElementsByTagName("TreeModel").getLength > 0)
      val trees = treeSegs.map { s =>
        val tm = s.getElementsByTagName("TreeModel").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        parseNode(childElems(tm, "Node").head)
      }.toVector
      val reg = doc.getElementsByTagName("RegressionModel").item(0)
        .asInstanceOf[org.w3c.dom.Element]
      require(reg.getAttribute("normalizationMethod") == "logit",
        "modelChain ensemble must end in a logit regression segment")
      val nps = reg.getElementsByTagName("NumericPredictor")
      val coefByName = (0 until nps.getLength).map { i =>
        val el = nps.item(i).asInstanceOf[org.w3c.dom.Element]
        el.getAttribute("name") -> el.getAttribute("coefficient").toDouble
      }.toMap
      // ÷2 undoes the export's logit rescale exactly (power-of-two)
      val weights = trees.indices
        .map(i => coefByName(s"margin_${i + 1}") / 2.0).toVector
      Ensemble(features, trees, weights, "sum")
    } else {
      val trees = segs.map { s =>
        val tm = s.getElementsByTagName("TreeModel").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        parseNode(childElems(tm, "Node").head)
      }.toVector
      val weights = segs.map { s =>
        val w = s.getAttribute("weight")
        if (w.isEmpty) 1.0 else w.toDouble
      }.toVector
      Ensemble(features, trees, weights, method)
    }
  }

  /** Parse a document produced by [[exportTree]] back into the literal
    * [[Score.TreeNode]] form (leaf ids from the `score` attribute). */
  def importTree(xml: String): Score.TreeNode = {
    val doc = parseDoc(xml)
    val tm = doc.getElementsByTagName("TreeModel").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    def parse(e: org.w3c.dom.Element): Score.TreeNode = {
      val kids = childElems(e, "Node")
      if (kids.isEmpty) Score.Leaf(e.getAttribute("score").toInt)
      else {
        require(kids.length == 2, s"binarySplit expects 2 children")
        val Seq(l, r) = kids
        val p = childElems(l, "SimplePredicate").head
        require(p.getAttribute("operator") == "lessOrEqual",
          "left child must carry the lessOrEqual predicate")
        Score.Split(p.getAttribute("field"),
          p.getAttribute("value").toDouble, parse(l), parse(r))
      }
    }
    parse(childElems(tm, "Node").head)
  }
}
