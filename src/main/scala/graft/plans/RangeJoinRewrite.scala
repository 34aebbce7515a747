package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampType}

/** Catalyst optimizer rule: rewrite a pure range-containment inner join
  * (`point >= lo AND point <= hi`, no equi keys between the sides) into
  * the bucketed equi-join shape of [[graft.ops.TemporalJoin.rangeJoin]].
  *
  * Spark's own join selection has no equi keys to hash on for such a
  * condition, so it falls back to BroadcastNestedLoopJoin (O(|L|·|R|)
  * comparisons even when the broadcast fits) or a cartesian product. This
  * rule quantizes the domain into `bucket`-width cells at the LOGICAL
  * level: the interval side is exploded to the cells it covers, the point
  * side is projected to its single cell, and the join gains a
  * `cell == cell` equi conjunct (original predicates kept as residual) —
  * after which Spark's ordinary machinery takes over: ExtractEquiJoinKeys
  * sees a hash key, AQE sizes and skew-splits the exchange, and the plan
  * is a SortMergeJoin/ShuffledHashJoin that scales linearly.
  *
  * Fires only when the WHOLE condition is two range conjuncts (closed OR
  * strict bounds — `>=`/`>` below, `<=`/`<` above) over one point
  * attribute of an integral type (byte/short/int/long, widened to long;
  * mixed-width comparisons arrive as `Cast(p, long)` after coercion and
  * are unwrapped) or a native timestamp (quantized via `unix_micros`),
  * with interval bounds of the same type category from the other side
  * and no cross-side equality present (if an equi key exists, Spark
  * already hashes on it and the range is a fine residual). The rewritten
  * join contains an equality, so the rule can never re-fire on its own
  * output. Cell width is PER TYPE CATEGORY because the quantized units
  * differ by 1000×: `spark.graft.rangeJoin.bucket` for integral points
  * (default 1 h in ns — the events table's timestamp unit) and
  * `spark.graft.rangeJoin.bucketTs` for native-timestamp points
  * (default 1 h in µs, `unix_micros` domain). One session can therefore
  * mix both join shapes with a correct width for each; a single shared
  * key would make a ns-sized value on a timestamp join produce
  * ~1000×-too-wide cells (huge sequence explosions).
  *
  * Registered per-session via `spark.experimental.extraOptimizations` or
  * cluster-wide with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val BucketKey = "spark.graft.rangeJoin.bucket"
  private val BucketTsKey = "spark.graft.rangeJoin.bucketTs"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other     => Seq(other)
  }

  /** (point, bound) for `p >= lo` / `lo <= p` — and the STRICT forms
    * `p > lo` / `lo < p`. Strict bounds share the same cell coverage:
    * `sequence(lo div b, hi div b)` is a superset of the cells a strictly
    * bounded point can land in (truncating div is monotone), and the
    * original comparison is kept as a residual, so over-covering by at
    * most one cell costs a few extra candidate rows, never correctness. */
  private def asLowerBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p)    => Some((p, lo))
      case GreaterThan(p, lo)        => Some((p, lo))
      case LessThan(lo, p)           => Some((p, lo))
      case _                         => None
    }

  private def asUpperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, hi)    => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case LessThan(p, hi)           => Some((p, hi))
      case GreaterThan(hi, p)        => Some((p, hi))
      case _                         => None
    }

  /** Type category gate: every participating expression must quantize
    * through the SAME long domain, or cell equality could silently drop
    * matches. Integral types widen to long; timestamps go through
    * microseconds (`unix_micros`). */
  private sealed trait Cat
  private case object Integral extends Cat
  private case object Stamp extends Cat
  private def catOf(t: DataType): Option[Cat] = t match {
    case LongType | IntegerType | ShortType | ByteType => Some(Integral)
    case TimestampType                                 => Some(Stamp)
    case _                                             => None
  }
  private def toLong(e: Expression): Expression = e.dataType match {
    case LongType      => e
    case TimestampType => UnixMicros(e)
    case _             => Cast(e, LongType)
  }

  /** The point side of a comparison, unwrapped to its attribute: after
    * type coercion an int point compared to long bounds arrives as
    * `Cast(p, LongType)`, so the bare-attribute match alone would miss
    * exactly the mixed-width case this rule should catch. */
  private def pointAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference                 => Some(a)
    case Cast(a: AttributeReference, LongType, _, _)
        if catOf(a.dataType).contains(Integral) => Some(a)
    case _                                     => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConj(cond)
      // no explicit cross-equality guard is needed: the rewrite fires
      // only on EXACTLY two conjuncts that both parse as range bounds
      // (pairUp below), so a condition carrying an equi key either has
      // length != 2 or fails the bound parse — an equality conjunct can
      // never coexist with a firing rewrite
      // a single comparison is ambiguous in isolation (`ts >= lo` is both
      // "ts lower-bounded" and "lo upper-bounded"), so pair the two
      // conjuncts: one must read as p >= lo and the other as p <= hi for
      // the SAME point attribute p
      def pairUp(cLow: Expression, cHigh: Expression) =
        (asLowerBound(cLow), asUpperBound(cHigh)) match {
          case (Some((pe1, lo)), Some((pe2, hi))) =>
            (pointAttr(pe1), pointAttr(pe2)) match {
              case (Some(p1), Some(p2))
                  if p1.semanticEquals(p2) &&
                    catOf(p1.dataType).isDefined &&
                    catOf(p1.dataType) == catOf(lo.dataType) &&
                    catOf(p1.dataType) == catOf(hi.dataType) =>
                // which child owns the point attribute?
                if (left.outputSet.contains(p1) &&
                    lo.references.subsetOf(right.outputSet) &&
                    hi.references.subsetOf(right.outputSet))
                  Some((left, right, p1, lo, hi, true))
                else if (right.outputSet.contains(p1) &&
                    lo.references.subsetOf(left.outputSet) &&
                    hi.references.subsetOf(left.outputSet))
                  Some((right, left, p1, lo, hi, false))
                else None
              case _ => None
            }
          case _ => None
        }
      val rewrite =
        if (conjuncts.length != 2) None
        else pairUp(conjuncts(0), conjuncts(1))
          .orElse(pairUp(conjuncts(1), conjuncts(0)))
      rewrite match {
        case None => j
        case Some((ptSide, ivSide, p, lo, hi, ptIsLeft))
            // sub-long integral points fire ONLY with an explicit bucket
            // conf: the ns-scale default (3.6e12) exceeds the whole int
            // domain, every point/bound would land in cell 0, and the
            // "equi join" would funnel both sides through ONE key — a
            // strictly worse plan than the BNLJ it replaces. Longs keep
            // the ns default (the events table's unit), timestamps get a
            // µs default under their OWN key; anything narrower needs
            // the caller to say what a cell means in its domain.
            if p.dataType == LongType ||
              catOf(p.dataType).contains(Stamp) ||
              conf.getConfString(BucketKey, null) != null =>
          val isStamp = catOf(p.dataType).contains(Stamp)
          // validate the conf value LOUDLY at plan time: bucket = 0
          // makes IntegralDivide return null under non-ANSI semantics,
          // Sequence(null, ...) drops every interval row, and the
          // rewritten join silently returns ZERO rows — a
          // misconfiguration must never corrupt answers
          val (bKey, bRaw) =
            if (isStamp) (BucketTsKey,
              conf.getConfString(BucketTsKey, "3600000000"))
            else (BucketKey, conf.getConfString(BucketKey, "3600000000000"))
          val bVal =
            try bRaw.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"$bKey must be a positive long, got '$bRaw'")
            }
          if (bVal <= 0)
            throw new IllegalArgumentException(
              s"$bKey must be positive, got $bVal — a zero/negative " +
                "bucket would silently empty the rewritten range join")
          val bucket = Literal(bVal, LongType)
          // interval side: explode to covered cells
          // timeZoneId must be pinned: Sequence is TimeZoneAwareExpression
          // and stays unresolved without it (even for pure-long bounds)
          val cellsExpr = Sequence(
            new IntegralDivide(toLong(lo), bucket),
            new IntegralDivide(toLong(hi), bucket),
            None, Some(conf.sessionLocalTimeZone))
          val ivCell = AttributeReference("__graft_cell_iv", LongType,
            nullable = false)()
          val ivGen = Generate(Explode(cellsExpr), Nil, outer = false,
            qualifier = None, generatorOutput = Seq(ivCell), child = ivSide)
          // point side: its single cell
          val ptAlias = Alias(
            new IntegralDivide(toLong(p), bucket), "__graft_cell_pt")()
          val ptProj = Project(ptSide.output :+ ptAlias, ptSide)
          val newCond = And(EqualTo(ptAlias.toAttribute, ivCell), cond)
          val newJoin =
            if (ptIsLeft) Join(ptProj, ivGen, Inner, Some(newCond), hint)
            else Join(ivGen, ptProj, Inner, Some(newCond), hint)
          // prune the helper cells back to the original join output
          Project(j.output, newJoin)
        case Some(_) => j // sub-long point without an explicit bucket
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — cluster-wide
  * registration of graft's Catalyst rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RangeJoinRewrite)
}
