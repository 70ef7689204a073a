package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Elementwise mean over an `array<float>` column as a custom typed
  * Aggregator — the (b) extension path for aggregate functions.
  *
  * One buffer of (dim doubles + count) per group per partition, with
  * map-side combine through reduce/merge: for k-means centroids this
  * shuffles one row per (group, partition) instead of the
  * posexplode alternative's dim rows, and never materializes the
  * (vector × position) explosion.
  */
case class VecMeanBuf(sums: Array[Double], n: Long)

class VectorMean(dim: Int)
    extends Aggregator[Array[Float], VecMeanBuf, Array[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    var i = 0
    while (i < dim && i < a.length) { b.sums(i) += a(i); i += 1 }
    VecMeanBuf(b.sums, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    VecMeanBuf(x.sums, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Array[Double] =
    if (b.n == 0) b.sums else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object VectorMean {
  /** Column-API form: groupBy(...).agg(VectorMean.of(dim)(col("v"))). */
  def of(dim: Int): Column => Column = {
    val fn = org.apache.spark.sql.functions.udaf(
      new VectorMean(dim), ExpressionEncoder[Array[Float]]())
    (c: Column) => fn(c)
  }
}
