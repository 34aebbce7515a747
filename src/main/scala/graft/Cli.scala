package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.{CatalogIO, DataSpec, NormType}
import graft.pipeline.Pipeline

/** User-facing CLI — the reference's verb surface (`ShifuCLI.java:174-417`:
  * `shifu init/stats/varselect/normalize/train/eval/export`) on the Spark
  * engine, so a reference user can drive the same lifecycle from a shell:
  *
  * {{{
  * graft.Cli run    --data <parquet> --target <col> --pos R --neg A,N \
  *                  --candidates c1,c2,... [--topn 5] [--normtype zscale] \
  *                  [--catalog ColumnConfig.json] [--out outDir]
  * graft.Cli stats  --data ... --target ... --pos ... --neg ... \
  *                  --candidates ... --catalog ColumnConfig.json
  * graft.Cli norm   --data ... --target ... --pos ... --neg ... \
  *                  --catalog ColumnConfig.json --out outDir [--normtype woe]
  * graft.Cli eval   --data ... --target ... --pos ... --neg ... \
  *                  --score <metaCol> [--weight <col>] [--out report.html]
  * graft.Cli export --data ... --target ... --pos ... --neg ... \
  *                  --candidates ... --out model.pmml
  * }}}
  *
  * `run` = init(autotype) → stats → varsel → norm → train → eval, printing
  * the selected columns and the distributed-sweep AUC; `export` fits the
  * selected features and writes the model as PMML
  * (`ExportModelProcessor` parity via [[graft.score.Score.exportPmml]]).
  */
object Cli {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    // strict pairing: every token must be a --flag followed by a value —
    // a silently shifted/dropped pair would misconfigure the whole run
    args.grouped(2).map {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.drop(2) -> v
      case bad => throw new IllegalArgumentException(
        s"expected '--flag value' pairs, got '${bad.mkString(" ")}'")
    }.toMap
  }

  private def normTypeOf(s: String): NormType = s.toLowerCase match {
    case "zscale"    => NormType.ZScale
    case "woe"       => NormType.Woe
    case "onehot"    => NormType.OneHot
    case "woezscore" => NormType.WoeZScore
    case "hybrid"    => NormType.Hybrid
    case "raw"       => NormType.Raw
    case other => throw new IllegalArgumentException(
      s"unknown normtype '$other' (zscale|woe|onehot|woezscore|hybrid|raw)")
  }

  /** Testable entry: returns the lines it would print. */
  def run(spark: SparkSession, verb: String,
          opts: Map[String, String]): Seq[String] = {
    val df = spark.read.parquet(opts("data"))
    val spec = DataSpec(
      targetColumn = opts("target"),
      posTags = opts("pos").split(",").toSet,
      negTags = opts("neg").split(",").toSet,
      weightColumn = opts.get("weight"),
      filterExpressions = opts.get("filter").toSeq)
    val normType = normTypeOf(opts.getOrElse("normtype", "zscale"))
    val topN = opts.getOrElse("topn", "5").toInt
    def candidates = opts("candidates").split(",").toSeq

    verb match {
      case "run" =>
        val r = Pipeline.autoRun(df, spec, candidates, topN, normType,
          opts.get("catalog"))
        opts.get("out").foreach(o =>
          r.normalized.write.mode("overwrite").parquet(o))
        Seq(s"selected: ${r.selected.mkString(",")}",
          f"auc: ${r.auc}%.6f")

      case "stats" =>
        val clean = Pipeline.init(df, spec)
        val (num, cat) = Pipeline.autoColumns(clean, candidates)
        val catalog = Pipeline.varsel(
          Pipeline.stats(clean, spec, num, cat), topN)
        CatalogIO.write(opts("catalog"), catalog)
        Seq(s"catalog: ${opts("catalog")} (${catalog.length} columns)")

      case "norm" =>
        val catalog = CatalogIO.read(opts("catalog"))
        val clean = Pipeline.init(df, spec)
        val normed = Pipeline.norm(clean, spec, catalog, normType)
        normed.write.mode("overwrite").parquet(opts("out"))
        Seq(s"normalized: ${opts("out")} (${normed.columns.length} columns)")

      case "eval" =>
        // external-score eval (`shifu eval` with a metaColumn score):
        // distributed sweep -> ROC AUC + gain chart, optional HTML report
        val clean = Pipeline.init(df, spec)
        val scoreCol = col(opts("score"))
        val weightCol = opts.get("weight").map(col).getOrElse(lit(1.0))
        val sweep = graft.eval.Eval.weightedSweep(clean, scoreCol,
          Pipeline.isPos(spec), weightCol,
          Seq(monotonically_increasing_id()))
        val auc = graft.eval.Eval.rocAuc(sweep).head().getDouble(0)
        val gain = graft.eval.Eval.gainChart(
          sweep.select("bucket", "tp", "fp", "fn", "tn"))
        opts.get("out").foreach(o =>
          graft.eval.Eval.gainChartHtml(gain, o, s"eval ${opts("score")}"))
        Seq(f"auc: $auc%.6f",
          s"buckets: ${gain.count()}") ++
          opts.get("out").map(o => s"report: $o")

      case "export" =>
        val r = Pipeline.autoRun(df, spec, candidates, topN, normType, None)
        val feats = r.normalized.columns.filter(_.startsWith("n_")).toSeq
        val t = graft.train.Train.logistic(r.normalized, feats,
          col("tag") === 1)
        val pmml = graft.score.Score.exportPmml(
          Seq(graft.train.Train.toLinear(t, feats)))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(opts("out")), pmml)
        Seq(s"pmml: ${opts("out")} (${feats.length} predictors)")

      case other =>
        throw new IllegalArgumentException(
          s"unknown verb '$other' (run|stats|norm|eval|export)")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli <run|stats|norm|export> --data ...")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.head, parseArgs(args.tail)).foreach(println)
    finally spark.stop()
  }
}
