package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou/Douze/Schmid, TPAMI 2011): the
  * vector is split into `m` contiguous subvectors; each subspace has its
  * own `ksub`-entry codebook; a vector compresses to `m` small code
  * indices (one byte each at ksub ≤ 256 — 8 bytes for a 64-dim fp32
  * vector, 32× smaller). Scoring is ADC (asymmetric distance
  * computation): the query precomputes a per-subspace lookup table of
  * dot products against every codebook entry ONCE, and each candidate
  * then costs m table lookups + adds instead of a dim-length dot.
  *
  * All three kernels capture the codebook matrix in the expression
  * (the [[NearestCentroid]] move) — encoding and LUT building are
  * NARROW maps; nothing about PQ ever shuffles vectors.
  *
  * Shared layout: `flat` is row-major `[m][ksub][dsub]`; subspace j's
  * codebook entry c occupies `flat[(j*ksub + c)*dsub ..< +dsub]`.
  */
private[plans] sealed trait PqCodebook {
  def codebooks: Array[Array[Array[Double]]] // [m][ksub][dsub]

  @transient final protected lazy val m: Int = codebooks.length
  @transient final protected lazy val ksub: Int = codebooks.head.length
  @transient final protected lazy val dsub: Int = codebooks.head.head.length
  @transient final protected lazy val dim: Int = m * dsub

  @transient final protected lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(j)(c), 0, out, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    out
  }

  final protected def validate(): Unit = {
    require(codebooks.nonEmpty, "pq: need at least one subspace")
    require(codebooks.forall(_.length == codebooks.head.length),
      "pq: all subspaces must have the same codebook size")
    require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
      "pq: all codebook entries must share one subvector dimensionality")
  }

  final protected def readVector(input: Any, isFloat: Boolean): Array[Double] = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) {
      throw new org.apache.spark.SparkException(
        s"pq: codebooks expect dim=$dim (m=$m × dsub=$dsub) but vector has ${arr.numElements()}")
    }
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    v
  }
}

/** `pq_encode(vec)` → array<int> of length m: per subspace, the index of
  * the codebook entry with the smallest L2 distance to the subvector
  * (ties → lowest index). Null input or any null element → null.
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback with PqCodebook {

  validate()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = readVector(input, isFloat)
    if (v == null) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v(off + i) - flat(base + i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"

  // codebook matrices can be large — keep them out of plan strings
  override def toString: String = s"pq_encode($child, m=$m, ksub=$ksub, dsub=$dsub)"
}

/** `pq_lut(query_vec)` → array<double> of length m·ksub: the ADC lookup
  * table `lut[j*ksub + c] = dot(query_sub_j, codebook[j][c])`. Built
  * ONCE per query row (queries are few and broadcast); every candidate
  * scored against this query then costs m lookups.
  */
case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback with PqCodebook {

  validate()

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = readVector(input, isFloat)
    if (v == null) return null
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) { acc += v(off + i) * flat(base + i); i += 1 }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"

  override def toString: String = s"pq_lut($child, m=$m, ksub=$ksub, dsub=$dsub)"
}

/** `pq_adc(lut, codes)` → double: `Σ_j lut[j·ksub + codes[j]]` with
  * `ksub = lut.length / codes.length`. With a per-query dot-product LUT
  * this is the ADC approximate dot; with a constant per-entry ‖entry‖²
  * LUT it is the squared reconstruction norm — the same m-lookup fold
  * serves both. Left-to-right accumulation (j = 0..m-1), matching the
  * order `aggregate`/`vector_dot` would produce.
  */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<double>, array<int>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0.0
    require(lut.numElements() % m == 0,
      s"pq_adc: lut length ${lut.numElements()} not a multiple of m=$m")
    val ksub = lut.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) {
        throw new org.apache.spark.SparkException(
          s"pq_adc: code $c out of range [0, $ksub) in subspace $j")
      }
      if (lut.isNullAt(j * ksub + c)) return null
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    bridge.column(PqEncodeExpr(bridge.expression(vec), codebooks))
}

object PqLut {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    bridge.column(PqLutExpr(bridge.expression(vec), codebooks))
}

object PqAdc {
  def apply(lut: Column, codes: Column): Column =
    bridge.column(PqAdcExpr(bridge.expression(lut), bridge.expression(codes)))
}
