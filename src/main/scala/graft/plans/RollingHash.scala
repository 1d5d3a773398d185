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

/** `winnow(text, g, w)` → array<struct<pos:int, h:long>>: winnowing
  * fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
  * MOSS algorithm). Hash every g-gram with the MOD-arithmetic rolling
  * hash `h = fold((a·31 + cp) mod 1e9+7)` (the same per-step arithmetic
  * as [[TextFeatures]]' fingerprint, so an external SQL engine can
  * replay it with a list fold), then in every window of `w` consecutive
  * gram hashes select the minimum — rightmost on ties. Guarantee: two
  * texts sharing any substring of length ≥ g + w − 1 share at least one
  * selected fingerprint; expected density 2/(w+1) of all grams.
  *
  * Selection runs in O(n) with a monotonic deque, one pass per
  * document, no allocation beyond the output — a narrow map at any
  * corpus size. Texts with fewer than w grams select their overall
  * minimum (robust winnowing's short-input rule); texts shorter than g
  * yield an empty array; null → null.
  */
case class WinnowExpr(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(gram >= 1 && window >= 1, "winnow: gram >= 1, window >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val M = WinnowExpr.Mod
    val B = WinnowExpr.Base
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < gram) return new GenericArrayData(Array.empty[Any])
    val m = n - gram + 1
    // B^(g-1) mod M for the rolling removal term
    var bTop = 1L
    var i = 0
    while (i < gram - 1) { bTop = bTop * B % M; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < gram) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    i = 0
    while (i < m - 1) {
      h = ((h - cps(i) * bTop % M + M) % M * B + cps(i + gram)) % M
      hs(i + 1) = h
      i += 1
    }
    val selected = new scala.collection.mutable.ArrayBuffer[Any]
    // monotonic deque of gram indices, hashes strictly increasing front
    // to back; pushing pops every >= hash so ties resolve to the
    // RIGHTMOST minimal gram, per the paper
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var lastPos = -1
    def pushSelection(pos: Int): Unit =
      if (pos != lastPos) {
        selected += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](pos, hs(pos)))
        lastPos = pos
      }
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - window) head += 1
      // first full window ends at i = window-1; short texts (m < w)
      // select once at the final index
      if (i >= window - 1 || i == m - 1) pushSelection(dq(head))
      i += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object WinnowExpr {
  val Base = 31L
  val Mod = 1000000007L

  def apply(text: Column, gram: Int, window: Int): Column =
    bridge.column(new WinnowExpr(bridge.expression(text), gram, window))
}
