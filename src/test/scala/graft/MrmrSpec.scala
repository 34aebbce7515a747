package graft

import org.scalatest.funsuite.AnyFunSuite

/** mRMR greedy ordering on planted relevance/redundancy values. */
class MrmrSpec extends AnyFunSuite {

  test("mRMR picks max relevance first, then penalizes redundancy " +
    "with the already-selected set") {
    // b is most relevant; c is nearly as relevant but redundant with b;
    // a is less relevant but independent → a should beat c at step 2
    val rel = Map("a" -> 0.30, "b" -> 0.50, "c" -> 0.45)
    val red = Map(("b", "c") -> 0.40, ("a", "b") -> 0.02,
      ("a", "c") -> 0.02)
    val order = graft.ops.Assoc.mrmrOrder(rel, red)
    assert(order === Seq("b", "a", "c"))
    // sanity: without the redundancy term c would have come second
    assert(rel("c") > rel("a"))
  }

  test("mRMR is deterministic under exact ties (lexicographic)") {
    val rel = Map("z" -> 0.5, "m" -> 0.5, "a" -> 0.5)
    val order = graft.ops.Assoc.mrmrOrder(rel, Map.empty)
    assert(order === Seq("a", "m", "z"))
  }

  test("mRMR redundancy lookup is symmetric") {
    val rel = Map("a" -> 1.0, "b" -> 0.9, "c" -> 0.89)
    // redundancy stored only as (c, a): must still penalize c after a
    val red = Map(("c", "a") -> 0.5)
    assert(graft.ops.Assoc.mrmrOrder(rel, red) === Seq("a", "b", "c"))
    val red2 = Map(("a", "c") -> 0.5)
    assert(graft.ops.Assoc.mrmrOrder(rel, red2) === Seq("a", "b", "c"))
  }
}
