package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two Array[Float] columns, accumulated in double,
  * left-to-right.
  *
  * Spark's higher-order functions (zip_with + aggregate) are NOT part of
  * whole-stage codegen — each evaluation walks interpreted lambda
  * expressions and allocates intermediate arrays, which dominates the cost
  * of pairwise similarity joins. This native expression compiles to a single
  * static call with a tight primitive loop (~30x less overhead per pair)
  * and keeps the surrounding plan inside WholeStageCodegen.
  *
  * Fold order matches `SUM(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)
  * ORDER BY i)` starting from 0.0 — bit-identical to the DuckDB oracle.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {
  /** Mismatched lengths fail loudly: silently truncating to min(len) would
    * mask corrupt embedding data as a plausible similarity value. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: embedding length mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def vec_dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Dot product of an Array[Float] data column with an Array[Double]
  * centroid column (k-means assignment): same left-to-right double fold as
  * VecDot — `SUM(CAST(a[i] AS DOUBLE) * b[i] ORDER BY i)` from 0.0. */
case class VecDotFD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotFD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotFD.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotFD =
    copy(left = l, right = r)
}

object VecDotFD {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot_fd: length mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }

  def vec_dot_fd(a: Column, b: Column): Column =
    GraftShim.column(VecDotFD(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Squared L2 distance between a SLICE of an Array[Float] data column
  * (elements [offset, offset + |b|)) and an Array[Double] codeword —
  * the product-quantization assignment kernel. Same codegen rationale
  * as [[VecDot]]; the fold is `SUM((CAST(a[offset+j] AS DOUBLE) − b[j])
  * * (CAST(a[offset+j] AS DOUBLE) − b[j]) ORDER BY j)` from 0.0 —
  * subtract, multiply, add, each one correctly-rounded IEEE step,
  * bit-identical to the DuckDB oracle. The offset is a plan-time
  * constant (subspace origin), not a per-row expression. */
case class VecL2FD(left: Expression, right: Expression, offset: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecL2FD.d2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecL2FD.d2($a, $b, $offset)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2FD =
    copy(left = l, right = r)
}

object VecL2FD {
  /** Out-of-range slices fail loudly, like VecDot's length check: a
    * vector shorter than the subspace layout is corrupt embedding data,
    * not a zero-distance match. */
  def d2(a: ArrayData, b: ArrayData, offset: Int): Double = {
    val n = b.numElements()
    if (offset < 0 || offset + n > a.numElements())
      throw new IllegalArgumentException(
        s"vec_l2_fd: slice [$offset, ${offset + n}) out of range for " +
          s"embedding of length ${a.numElements()}")
    var s = 0.0
    var j = 0
    while (j < n) {
      val d = a.getFloat(offset + j).toDouble - b.getDouble(j)
      s += d * d
      j += 1
    }
    s
  }

  def vec_l2_fd(a: Column, b: Column, offset: Int): Column =
    GraftShim.column(VecL2FD(GraftShim.expression(a), GraftShim.expression(b), offset))
}
