package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `sign_pack(vec)` → array<long>: the 1-bit (sign) quantization of an
  * embedding — bit `j` of word `i` is set iff `vec[64*i + j] > 0`. A
  * 1024-dim float vector (4 KiB) becomes 16 longs (128 B): the 32×
  * compression step of a binary-quantized ANN index, and the form under
  * which Hamming distance is a handful of XOR+POPCNT instructions
  * instead of a 1024-element float loop.
  *
  * Sign convention is strictly `> 0` (a 0.0 packs as 0), matching the
  * `CASE WHEN x > 0` replay an oracle does. Null input or any null
  * element → null (consistent with the other vector expressions here).
  */
case class SignPackExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_pack expects array<float|double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v > 0) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val get = if (isFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |final int $n = $c.numElements();
         |final long[] $words = new long[($n + 63) >>> 6];
         |boolean ${ev.isNull}_any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull}_any = true; break; }
         |  final double $v = $get;
         |  if ($v > 0) $words[$i >>> 6] |= (1L << ($i & 63));
         |}
         |if (${ev.isNull}_any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)

  override def prettyName: String = "sign_pack"
}

/** `hamming_dist(codeA, codeB)` → bigint: popcount of the XOR of two
  * packed sign codes — the number of dimensions on which the two
  * vectors' signs disagree. The candidate-generation metric of the
  * binary-quantized ANN path: integer-only, so an oracle replays it
  * bit-exactly. Arrays of different lengths → null (codes from
  * different packings are incomparable, and null poisons the rank
  * rather than silently truncating).
  */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hamming_dist expects two array<bigint> codes, got ${a.sql}, ${b.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $d = 0L;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistExpr =
    copy(left = l, right = r)

  override def prettyName: String = "hamming_dist"
}

object BinaryCodes {
  /** Column wrapper: packed sign bits of a float/double vector. */
  def signPack(vec: Column): Column = bridge.column(SignPackExpr(bridge.expression(vec)))

  /** Column wrapper: Hamming distance between two packed codes. */
  def hamming(a: Column, b: Column): Column =
    bridge.column(HammingDistExpr(bridge.expression(a), bridge.expression(b)))
}
