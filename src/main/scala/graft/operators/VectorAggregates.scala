package graft.operators

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable element-wise embedding aggregation — the centroid/mean
  * primitive of embedding-space analysis (cluster profiling, outlier
  * gates, SemDeDup centroid refresh) as a typed [[Aggregator]].
  *
  * Why not `posexplode → groupBy(key, pos) → avg`: the explode
  * multiplies the shuffled row count by the dimension (64× here) and
  * shuffles (key, pos) pairs; this aggregator keeps ONE fixed-width
  * buffer per (partition, group) — map-side combined, dimension-
  * independent shuffle volume, the same shape `VectorAssembler`-era
  * Summarizers use.
  *
  * Exactness (the q91/q101 idiom): each float is snapped to integer
  * 1e-6 units BEFORE summation, so partial sums are exact longs —
  * order-independent, repartition-invariant, and replayable by the
  * DuckDB oracle bit-for-bit. Long range: 2^63 / 1e6 units ≈ 9.2e12
  * summed float-magnitude per dimension — beyond any realistic group.
  */
object VectorAggregates {

  val unitsPerFloat = 1000000L

  class VectorSumUnits(dim: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(dim)(0L)
    def reduce(b: Array[Long], a: Seq[Float]): Array[Long] = {
      if (a != null) {
        require(a.length == dim, s"expected dim $dim, got ${a.length}")
        var i = 0
        while (i < dim) {
          b(i) += math.floor(a(i).toDouble * unitsPerFloat + 0.5).toLong
          i += 1
        }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Aggregation column: element-wise sum of `vec` in 1e-6 units
    * (ARRAY<LONG>, length `dim`). Divide by (count · 1e6) for the mean. */
  def vectorSumUnits(vec: Column, dim: Int): Column =
    F.udaf(new VectorSumUnits(dim), ExpressionEncoder[Seq[Float]]()).apply(vec)
}
