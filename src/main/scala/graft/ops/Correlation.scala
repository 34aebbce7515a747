package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs Pearson correlation.
  *
  * Reference: `core/correlation/CorrelationMapper.java:157-250` accumulates
  * per-row outer products of xySum/xxSum/yySum arrays, combined in a reducer
  * (`CorrelationReducer.java:89-120`) — O(n·k²) work shipped through MR.
  *
  * Spark design: unpivot each PAIR once with `stack` (k² rows per input row
  * but one scan, map-side partial agg reduces to k² tiny partials before the
  * shuffle), then the closed-form Pearson from raw sums:
  * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)).
  * For k in the hundreds at 100 TB prefer `ml.stat.Correlation` on an
  * assembled vector (BLAS gramian); this form is the oracle-parity path.
  */
object Correlation {

  /** Pairwise Pearson over the given numeric columns; output
    * (pair, corr) rounded to 6, pair = "a|b" with a before b in `cols`. */
  def pearson(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val stackExpr = "stack(" + pairs.length + ", " +
      pairs.map { case (a, b) => s"'$a|$b', $a, $b" }.mkString(", ") +
      ") as (pair, x, y)"
    df.select(expr(stackExpr))
      .groupBy("pair")
      .agg(round(
        (count(lit(1)) * sum(col("x") * col("y")) - sum("x") * sum("y")) /
          sqrt((count(lit(1)) * sum(col("x") * col("x")) - sum("x") * sum("x")) *
               (count(lit(1)) * sum(col("y") * col("y")) - sum("y") * sum("y"))),
        6).as("corr"))
  }
}
