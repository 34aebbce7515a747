package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator over (score, id) pairs, ordered by score DESC
  * with id ASC tie-break — the same ordering as
  * `row_number().over(Window.partitionBy(g).orderBy(desc(score), asc(id)))`,
  * but with map-side partial aggregation: each partition keeps only k
  * candidates per group, so the shuffle moves `groups × k` rows instead of
  * every candidate pair. This is what makes brute-force / bucketed ANN
  * viable at cluster scale — the reference's eval keeps a similar bounded
  * buffer on one machine (`core/ConfusionMatrix.java:276`); here the buffer
  * is distributive (update/merge) so Spark runs it partial+final.
  *
  * Selection is deterministic for bit-identical scores: the (−score, id)
  * total order has no FP-summation ambiguity as long as the score itself is
  * computed by a strict in-order fold (see [[graft.expr.DotProduct]]).
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert into a (small, ≤k) descending-sorted buffer. */
  private def insert(buf: Seq[(Double, Long)],
                     x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && !lt(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(lt(_, x))
      (pre :+ x) ++ post.take(k - pre.length - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] = insert(b, a)

  override def merge(x: Seq[(Double, Long)],
                     y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `topK(5)(scoreCol, idCol)` → array<struct<score,id>>,
    * descending; explode with posexplode for (rank-1, neighbor) rows. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (score, id) => fn(score, id)
  }
}
