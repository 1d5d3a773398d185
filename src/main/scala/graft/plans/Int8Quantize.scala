package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `int8_quantize(vec)` → struct(scale, codes, qnorm, q_sum, q_l1,
  * max_err): the whole symmetric-int8 quantization of one vector in a
  * SINGLE O(dim) pass.
  *
  * The Column-API forms in [[graft.operators.Quantize]] stay as the
  * readable reference (and the spec cross-checks bit-parity), but they
  * hide an O(dim²) trap: the scale sub-expression sits INSIDE the
  * `transform`/`zip_with` lambdas, and Catalyst has no let-binding, so
  * it re-evaluates per ELEMENT. At dim 64 that is noise; at a realistic
  * 1024-dim corpus it is a 1000× constant. The native form computes
  * max|v| once, then codes/norm/checksums/residuals in one loop, with
  * every double op in the exact order the Column forms (and the DuckDB
  * oracle) use — floor(x+0.5)/ceil(x−0.5) rounding, products before
  * comparisons — so hashes are unchanged.
  *
  * Null input or any null element → null (the Column forms' aggregate
  * over a null produces null the same way). Empty arrays quantize to
  * empty codes with null scale/max_err (array_max of an empty array).
  */
case class Int8QuantizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Int8QuantizeExpr.schema

  override def nullable: Boolean = true

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize expects array<float|double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      v(i) = if (elemType == FloatType) arr.getFloat(i).toDouble
             else arr.getDouble(i)
      i += 1
    }
    // array_max parity: NaN ranks above every real, so it latches
    var maxAbs = Double.NegativeInfinity
    i = 0
    while (i < n) {
      val a = math.abs(v(i))
      if (a > maxAbs || a.isNaN) maxAbs = a
      i += 1
    }
    val scale: Any = if (n == 0) null else maxAbs / 127.0
    val codes = new Array[Int](n)
    var qq = 0.0 // Σ c², accumulated left-to-right like vector_dot
    var qSum = 0L
    var qL1 = 0L
    var maxErr = Double.NegativeInfinity
    val s = if (n == 0) 0.0 else maxAbs / 127.0
    i = 0
    while (i < n) {
      val c =
        if (s > 0) {
          val x = v(i) / s
          (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toInt
        } else 0
      codes(i) = c
      qq += c.toDouble * c.toDouble
      qSum += c
      qL1 += math.abs(c)
      val err = math.abs(v(i) - c.toDouble * s)
      if (err > maxErr || err.isNaN) maxErr = err
      i += 1
    }
    new GenericInternalRow(Array[Any](
      scale, new GenericArrayData(codes), math.sqrt(qq), qSum, qL1,
      if (n == 0) null else maxErr))
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)

  override def prettyName: String = "int8_quantize"
}

object Int8QuantizeExpr {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("qnorm", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_l1", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = true)))
}

object Int8Quantize {
  def apply(vec: Column): Column =
    bridge.column(Int8QuantizeExpr(bridge.expression(vec)))
}
