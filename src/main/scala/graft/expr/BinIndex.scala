package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst bin-index lookup: binary search over a LITERAL sorted
  * boundary array, generated into whole-stage codegen.
  *
  * Semantics match the engine's generated CASE chains exactly
  * (`QueryUtil.binCaseSql`, reference `util/BinUtils.getBinNum`): bin i
  * is the count of boundaries ≤ the value — `bounds(i-1) <= v <
  * bounds(i)` with bin 0 below the first boundary. The reference does
  * this per row with a linear scan over the boundary list
  * (`udf/stats/NumericalVarStats.java` via BinUtils); the engine's CASE
  * chains are codegen'd but still O(k) branches per row. This expression
  * is O(log k) with the boundary array hoisted into a mutable-state
  * field of the generated class — the difference shows at
  * quantile-normalization scale (k = 256–4096 bins), where a 4096-arm
  * when-chain is both slow to COMPILE (janino on a 4096-branch method)
  * and slow to run.
  *
  * SURVEY §4's "custom Catalyst work" item 3, promoted from
  * possible-UDF to codegen Expression. Null in → null out (missing
  * values route to the catalog's missing-last bin by `coalesce` at the
  * call site, same as the CASE chains).
  */
case class BinIndex(child: Expression, bounds: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // Seq, not Array, as the case-class parameter: an Array field gives
  // reference equals/hashCode, so two semantically identical BinIndex
  // expressions never compare equal and common-subexpression
  // elimination / exchange reuse are silently defeated. The hot paths
  // (interpreted eval + codegen) still search a primitive array.
  @transient private lazy val arr: Array[Double] = bounds.toArray

  private def search(v: Double): Int = {
    // upper bound: number of boundaries <= v
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(input: Any): Any =
    search(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // hoist the boundary array into the generated class once
      val arr = ctx.addReferenceObj("binBounds", this.arr, "double[]")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr[$mid] <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinIndex =
    copy(child = newChild)
}

object BinIndex {
  /** Column API: bin index of `v` (double) in the sorted `bounds`. */
  def of(v: Column, bounds: Seq[Double]): Column =
    GraftBridge.column(BinIndex(
      GraftBridge.expression(v.cast("double")), bounds.toIndexedSeq))
}
