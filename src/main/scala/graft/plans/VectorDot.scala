package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric-array columns, with whole-stage
  * codegen — replaces the interpreted `zip_with` + `aggregate` fold on
  * the similarity hot paths (higher-order functions neither codegen nor
  * CSE, and allocate an intermediate array per row).
  *
  * Semantics exactly match the fold it replaces (so DuckDB-oracle hashes
  * are unchanged): elements widen to double, products accumulate
  * sequentially left-to-right, a length mismatch or null element yields
  * null (what `zip_with`'s null-padding + `acc + null` produced).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // length mismatch / null element yield null even from non-null inputs;
  // without this override NullPropagation folds `result IS NULL` to
  // false and codegen emits invalid assignments for non-nullable children
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType || t == IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double|int> inputs, got ${l.sql} and ${r.sql}")
    }

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != ra.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = leftElem match {
        case FloatType => la.getFloat(i).toDouble
        case IntegerType => la.getInt(i).toDouble
        case _ => la.getDouble(i)
      }
      val y = rightElem match {
        case FloatType => ra.getFloat(i).toDouble
        case IntegerType => ra.getInt(i).toDouble
        case _ => ra.getDouble(i)
      }
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case IntegerType => "getInt"
      case _ => "getDouble"
    }
    val getL = getter(leftElem)
    val getR = getter(rightElem)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $l.$getL($i)) * ((double) $r.$getR($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    bridge.column(VectorDot(bridge.expression(a), bridge.expression(b)))
}
