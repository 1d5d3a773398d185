package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `mat_vec(vec)` → array<double>: the captured k×dim matrix times the
  * row's vector — one narrow map per row, no join, no explode. The
  * matrix rides inside the expression exactly like
  * [[NearestCentroid]]'s centroids: dimensionality-reduction projections
  * (random or learned) stay a per-row map at any corpus size, which is
  * the whole point — the projected corpus is what downstream candidate
  * stages scan.
  *
  * Each output component is a SEQUENTIAL left-to-right fold (same
  * discipline as [[VectorDot]]), so results are deterministic under any
  * partitioning and replayable by an oracle's list_sum.
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(matrix.nonEmpty, "mat_vec: need at least one matrix row")
  require(matrix.forall(_.length == matrix.head.length),
    "mat_vec: matrix rows must share one dimensionality")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val k = matrix.length
  @transient private lazy val dim = matrix.head.length

  // row-major [k][dim] flattening — one contiguous primitive array scan
  // per output component
  @transient private lazy val flat: Array[Double] = {
    val m = new Array[Double](k * dim)
    var r = 0
    while (r < k) {
      System.arraycopy(matrix(r), 0, m, r * dim, dim)
      r += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new org.apache.spark.SparkException(
        s"mat_vec: matrix has dim=$dim but vector has ${v.numElements()}")
    }
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      val base = r * dim
      i = 0
      while (i < dim) { acc += flat(base + i) * x(i); i += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)

  override def prettyName: String = "mat_vec"

  // projection matrices can be large — keep them out of plan strings
  override def toString: String = s"mat_vec($child, k=$k, dim=$dim)"
}

object MatVec {
  def apply(vec: Column, matrix: Array[Array[Double]]): Column =
    bridge.column(MatVec(bridge.expression(vec), matrix))
}
