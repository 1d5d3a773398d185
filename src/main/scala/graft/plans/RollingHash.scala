package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hashes(text, L)` → array<long>: the Karp–Rabin polynomial
  * hash of EVERY length-L window of the text, over Unicode CODE POINTS
  * (same unit as [[TextFeatures]]' fingerprint, Spark's `substring`,
  * and SQL `substr` — so window i is exactly `substring(text, i+1, L)`
  * in any engine). One O(n) pass per document: window i+1 is derived
  * from window i by subtracting the outgoing code point's `B^(L-1)`
  * term and shifting in the incoming one — never O(n·L) re-hashing.
  *
  * Arithmetic wraps in Long deliberately (exact-match detection only —
  * equal windows ⇒ equal hashes; collisions are removed downstream by
  * grouping on the extracted substring value, so the hash needs no
  * modulus discipline). Base 1000003 (a prime > any code point).
  *
  * Texts shorter than L yield an empty array; null → null.
  */
case class RollingHashesExpr(child: Expression, len: Int)
    extends UnaryExpression with CodegenFallback {

  require(len >= 1, "rolling_hashes: window length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < len) return new GenericArrayData(Array.emptyLongArray)
    val B = RollingHashesExpr.Base
    // B^(L-1) with the same wrap-around semantics as the hash itself
    var bTop = 1L
    var i = 0
    while (i < len - 1) { bTop *= B; i += 1 }
    val out = new Array[Long](n - len + 1)
    var h = 0L
    i = 0
    while (i < len) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = 0
    while (i < n - len) {
      h = (h - cps(i) * bTop) * B + cps(i + len)
      out(i + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hashes"
}

object RollingHashesExpr {
  val Base = 1000003L
}

object RollingHashes {
  def apply(text: Column, len: Int): Column =
    bridge.column(RollingHashesExpr(bridge.expression(text), len))
}
