package graft.agg

/** Primitive dual-array quicksort: sorts `v(lo..hi)` ascending and applies
  * the same permutation to `w`. Exists because the sketch hot paths
  * (SPDT compress, Munro–Paterson collapse) must sort (value, weight)
  * pairs millions of times per scan and every JDK/Scala pair-sort boxes —
  * `ArrayBuffer[Double].sorted` allocates a boxed Double per element per
  * compress, which profiled as the dominant cost of the sketch
  * aggregators at sf0.1. Median-of-3 pivot, insertion sort below 16
  * elements; deterministic (no randomized pivot) so sketch outputs are
  * stable across runs. NOT stable for ties — safe here: equal values
  * either merge (SPDT dedup) or are interchangeable (quantile read-off).
  */
private[agg] object DualSort {

  def sort(v: Array[Double], w: Array[Double], lo: Int, hi: Int): Unit = {
    if (hi - lo < 16) { insertion(v, w, lo, hi); return }
    // median-of-3 pivot, moved to hi
    val mid = lo + (hi - lo) / 2
    if (v(mid) < v(lo)) { swap(v, w, lo, mid) }
    if (v(hi) < v(lo)) { swap(v, w, lo, hi) }
    if (v(hi) < v(mid)) { swap(v, w, mid, hi) }
    val pivot = v(mid)
    swap(v, w, mid, hi - 1)
    var i = lo
    var j = hi - 1
    while (true) {
      i += 1; while (v(i) < pivot) i += 1
      j -= 1; while (v(j) > pivot) j -= 1
      if (i >= j) {
        swap(v, w, i, hi - 1)
        sort(v, w, lo, i - 1)
        sort(v, w, i + 1, hi)
        return
      }
      swap(v, w, i, j)
    }
  }

  private def insertion(v: Array[Double], w: Array[Double],
                        lo: Int, hi: Int): Unit = {
    var i = lo + 1
    while (i <= hi) {
      val cv = v(i); val cw = w(i)
      var j = i - 1
      while (j >= lo && v(j) > cv) { v(j + 1) = v(j); w(j + 1) = w(j); j -= 1 }
      v(j + 1) = cv; w(j + 1) = cw
      i += 1
    }
  }

  @inline private def swap(v: Array[Double], w: Array[Double],
                           a: Int, b: Int): Unit = {
    val tv = v(a); v(a) = v(b); v(b) = tv
    val tw = w(a); w(a) = w(b); w(b) = tw
  }
}
