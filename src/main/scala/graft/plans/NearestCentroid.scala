package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `nearest_centroid(vec)` → int: index of the captured centroid with
  * the highest cosine similarity to the row's vector (ties → lowest
  * index; an all-zero vector or centroid scores 0).
  *
  * The k×dim centroid matrix is captured in the expression (normalized
  * once at first use, so per row each cell costs a single dot product) —
  * the k-means assign step is thereby a NARROW map over the corpus: no
  * broadcast join, no explode, nothing shuffles but the k×dim partial
  * means of the update step.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must share one dimensionality")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val dim = centroids.head.length

  // row-major [k][dim], each row scaled to unit L2 norm (zero-norm rows
  // stay zero): argmax_k cos(v, c_k) = argmax_k v · ĉ_k
  @transient private lazy val normalized: Array[Double] = {
    val k = centroids.length
    val m = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      var ss = 0.0
      var i = 0
      while (i < dim) { val x = centroids(c)(i); ss += x * x; i += 1 }
      val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
      i = 0
      while (i < dim) { m(c * dim + i) = centroids(c)(i) * inv; i += 1 }
      c += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new org.apache.spark.SparkException(
        s"nearest_centroid: centroids have dim=$dim but vector has ${v.numElements()}")
    }
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    val k = centroids.length
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      i = 0
      while (i < dim) { acc += x(i) * normalized(base + i); i += 1 }
      if (acc > bestScore) { bestScore = acc; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"

  // centroid matrices can be large — keep them out of plan strings
  override def toString: String =
    s"nearest_centroid($child, k=${centroids.length}, dim=$dim)"
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    bridge.column(NearestCentroid(bridge.expression(vec), centroids))
}
