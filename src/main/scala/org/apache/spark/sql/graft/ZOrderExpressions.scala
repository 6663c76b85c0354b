/** Z-order (Morton) clustering kernel for multi-column data skipping (see
  * graft.sources.Sink.zordered for the layout contract).
  *
  * The z-value of a row interleaves the bits of each clustering column's
  * QUANTILE BUCKET (equi-depth, boundaries pre-computed by one driver-side
  * approxQuantile sketch — the centroids discipline: a model-sized array,
  * constant in corpus size, baked into the expression as a reference
  * object). Quantile buckets rather than raw value bits make the curve
  * distribution-proof: a skewed column still spreads uniformly across its
  * bucket range, so every z-interval holds comparable row mass and
  * row-group min/max boxes stay tight on EVERY clustered dimension.
  *
  * One codegen-visible call per row into a tight JVM loop (binary search
  * per dimension + bit interleave) — a narrow map-side projection, no
  * shuffle of its own.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

object ZOrderKernels {

  /** Equi-depth bucket of `v` under sorted cut points: the binary-search
    * insertion point, in [0, boundaries.length]. */
  def bucket(v: Double, boundaries: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return 0
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave `bits`-wide bucket ids of every dimension into one long:
    * dimension d contributes its bit i at output position i·dims + d, so
    * a prefix of the z-value bounds a box over ALL dimensions at once.
    * Null values take bucket 0 (sort-first, the ascending-nulls-first
    * convention). */
  def zValue(vals: ArrayData, boundaries: Array[Array[Double]],
      bits: Int): Long = {
    val dims = boundaries.length
    var z = 0L
    var d = 0
    while (d < dims) {
      val b =
        if (vals.isNullAt(d)) 0
        else bucket(vals.getDouble(d), boundaries(d))
      var i = 0
      while (i < bits) {
        z |= ((b >> i) & 1L) << (i * dims + d)
        i += 1
      }
      d += 1
    }
    z
  }
}

/** array<double> of clustering values (one per dimension, position-aligned
  * with the baked boundary arrays) → the interleaved z-value long. */
case class ZValue(child: Expression, boundaries: Seq[Seq[Double]],
    bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(boundaries.nonEmpty, "at least one clustering dimension")
  require(bits >= 1 && bits * boundaries.size <= 63,
    s"bits($bits) × dims(${boundaries.size}) must fit a long")

  @transient private lazy val bnds: Array[Array[Double]] =
    boundaries.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(v: Any): Any =
    ZOrderKernels.zValue(v.asInstanceOf[ArrayData], bnds, bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("zBounds", bnds, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ZOrderKernels.zValue($c, $b, $bits)")
  }

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}
