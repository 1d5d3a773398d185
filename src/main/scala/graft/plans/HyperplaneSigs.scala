package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.SparkException

/** `hyperplane_sigs(vec)` → array<long> of length `tables`: element t is
  * the random-hyperplane LSH bucket of the vector in table t (bit i set
  * when vec · h_{t,i} ≥ 0; `planes` Gaussian hyperplanes per table,
  * table t seeded `seed + t`).
  *
  * One native expression instead of tables×planes literal-array dot
  * products: the plane matrix lives in a single [tables·planes·dim]
  * double array captured once per expression instance, and a row costs
  * one pass of tables·planes·dim multiply-adds — no per-plane Column
  * trees for Catalyst to fold, codegen, and re-traverse. Bit-for-bit
  * parity with the Column-API form ([[graft.operators.Similarity
  * .hyperplaneSignature]], same Random(seed+t) Gaussian draws, same
  * sequential double accumulation) is pinned by SimilaritySpec.
  *
  * A dimension mismatch raises (matching the Column form's raise_error
  * guard): silently nulling the dot would collapse every vector into one
  * bucket and turn the LSH join into a cross-product.
  */
case class HyperplaneSigsExpr(
    child: Expression, dim: Int, planes: Int, tables: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")
  require(tables >= 1, "tables must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plane matrix, laid out [table][plane][dim] flattened — identical draw
  // order to the Column-API form's Seq.fill(planes)(Array.fill(dim)(...))
  @transient private lazy val planesFlat: Array[Double] = {
    val m = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(seed + t)
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dim) {
          m((t * planes + p) * dim + d) = rnd.nextGaussian()
          d += 1
        }
        p += 1
      }
      t += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new SparkException(
        s"hyperplane_sigs: dim=$dim but embedding has ${v.numElements()} elements")
    }
    val x = new Array[Double](dim)
    var d = 0
    var anyNull = false
    while (d < dim) {
      if (v.isNullAt(d)) anyNull = true
      else x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    // a null element nulls every plane dot in the Column-API form, whose
    // when(dot >= 0, …).otherwise(0) then lands every table in bucket 0
    // — mirror that exactly instead of reading garbage
    if (anyNull) {
      return new GenericArrayData(new Array[Long](tables))
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += x(i) * planesFlat(base + i); i += 1 }
        if (acc >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {
  def apply(vec: Column, dim: Int, planes: Int, tables: Int, seed: Long = 7L): Column =
    bridge.column(HyperplaneSigsExpr(bridge.expression(vec), dim, planes, tables, seed))
}
