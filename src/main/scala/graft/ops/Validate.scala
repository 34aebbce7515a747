package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation suite (the Deequ/expectations pattern):
  * completeness, range, set-membership, uniqueness, and referential
  * integrity checks over a table, reported as one (check, target,
  * metric_ppm, ok) result set.
  *
  * The reference validates eagerly inside each operator (malformed-row
  * budget `udf/AddColumnNumAndFilterUDF.java:104-117`, invalid-tag
  * counters, missing-sentinel nulling); a standalone suite makes the
  * same guarantees a first-class pre-ingest gate.
  *
  * Scale shape: every row-local check (not-null / range / set) compiles
  * into ONE aggregate pass — adding a check adds a column, never a scan.
  * Uniqueness adds the standard two-phase distinct; referential
  * integrity is one left-anti count per FK (co-partitioned hash join;
  * the dim side broadcasts only under the size gate). Metrics are
  * integer ppm (floor(1e6·a/b)) so results are engine-exact.
  */
object Validate {

  sealed trait Check
  /** Rate of non-null values must be ≥ minRate. */
  final case class NotNull(col: String, minRate: Double = 1.0) extends Check
  /** Rate of values inside [lo, hi] (nulls fail) must be ≥ minRate. */
  final case class InRange(col: String, lo: Double, hi: Double,
      minRate: Double = 1.0) extends Check
  /** Rate of values in the allowed set (nulls fail) must be ≥ minRate. */
  final case class InSet(col: String, values: Seq[String],
      minRate: Double = 1.0) extends Check
  /** The column combination must be globally unique. */
  final case class Unique(cols: Seq[String]) extends Check
  /** Every non-null value must resolve in `dim.dimKey` (orphans = 0);
    * null FKs count as orphans, matching left-anti semantics. */
  final case class ForeignKey(col: String, dim: DataFrame,
      dimKey: String) extends Check

  private def ppm(a: Long, b: Long): Long =
    if (b == 0) 0L else math.floor(1e6 * a / b).toLong

  /** Run the suite; returns (check, target, metric_ppm, ok). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal: Seq[(Check, Column)] = checks.collect {
      case c @ NotNull(col0, _) =>
        c -> sum(when(col(col0).isNotNull, 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi, _) =>
        c -> sum(when(col(col0).isNotNull &&
          col(col0) >= lo && col(col0) <= hi, 1L).otherwise(0L))
      case c @ InSet(col0, vs, _) =>
        c -> sum(when(col(col0).isin(vs: _*), 1L).otherwise(0L))
    }
    val uniques = checks.collect { case c: Unique => c }
    val aggCols = (count(lit(1)).as("__n") +:
      rowLocal.zipWithIndex.map { case ((_, e), i) => e.as(s"__m$i") }) ++
      uniques.zipWithIndex.map { case (u, i) =>
        // distinct over a STRUCT of the key columns: bare countDistinct
        // drops any row containing a NULL key field, reading perfectly
        // unique data with nulls as a uniqueness violation
        countDistinct(struct(u.cols.map(col): _*)).as(s"__u$i")
      }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val rowLocalRes = rowLocal.zipWithIndex.map { case ((c, _), i) =>
      val a = row.getAs[Long](s"__m$i")
      val (name, target, minRate) = c match {
        case NotNull(col0, r)       => ("not_null", col0, r)
        case InRange(col0, _, _, r) => ("in_range", col0, r)
        case InSet(col0, _, r)      => ("in_set", col0, r)
        case _ => throw new IllegalStateException
      }
      (name, target, ppm(a, n),
        if (ppm(a, n) >= math.floor(1e6 * minRate).toLong) 1L else 0L)
    }
    val uniqueRes = uniques.zipWithIndex.map { case (u, i) =>
      val d = row.getAs[Long](s"__u$i")
      ("unique", u.cols.mkString(","), ppm(d, n), if (d == n) 1L else 0L)
    }
    val fkRes = checks.collect { case ForeignKey(col0, dim, dimKey) =>
      val orphans = df.select(col(col0).as(dimKey))
        .join(PlanHints.gatedBroadcast(dim.select(dimKey)),
          Seq(dimKey), "left_anti")
        .count()
      ("foreign_key", col0, ppm(orphans, n), if (orphans == 0L) 1L else 0L)
    }
    (rowLocalRes ++ uniqueRes ++ fkRes)
      .toDF("check", "target", "metric_ppm", "ok")
  }
}
