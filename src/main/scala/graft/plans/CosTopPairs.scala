package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `cos_top_pairs(rows, diag, k)`: the all-pairs cosine KERNEL for one
  * near-dup block — rows is `array<struct<id:long, g:int,
  * vec:array<float|double>>>` (one collect_list'd sub-block), diag says
  * whether
  * this is a diagonal sub-block of the triangle split. Returns the
  * block's top-k pairs as `array<struct<id_a, id_b, cos>>`.
  *
  * Why an expression and not a join: the equi-join form of within-block
  * all-pairs re-deserializes BOTH vectors out of UnsafeRow for every
  * pair — at m·(m−1)/2 pairs per block that array decode dominates the
  * dot product itself (measured ~90 ns/pair·core at sf10; the pair scan
  * was ~97% of sim_semantic_dedup's wall-clock). This kernel widens each
  * vector to a primitive double[] ONCE per block, so the pair loop is a
  * pure fused-multiply-add scan the JIT can vectorize, and only k rows
  * leave the operator instead of m²/2 joined rows.
  *
  * Arithmetic parity (oracle hashes must not move): products accumulate
  * sequentially left-to-right in double after per-element widening —
  * exactly [[VectorDot]]; norms are sqrt of the same fold; cos is
  * num/(na·nb) with null (never NaN/Inf) when the denominator is not
  * > 0 or a vector is malformed — exactly `when(den > 0, num/den)` over
  * VectorDot's null semantics. Pair ranking uses the engine's sort
  * order: cos DESC via java.lang.Double.compare (NaN above all reals),
  * ties by (id_a, id_b) ASC, nulls last — so the union of per-block
  * top-k sets, globally re-sorted, is EXACTLY the naive join's
  * `ORDER BY cos DESC, id_a, id_b LIMIT k`. Blocks short of k valid
  * pairs also emit their k lexicographically-smallest null-cos pairs,
  * preserving the join form's NULLS LAST padding bit-for-bit.
  *
  * Pair rule: diagonal sub-blocks pair every id < id; off-diagonal
  * sub-blocks pair only rows from DIFFERENT triangle groups (same-group
  * pairs belong to that group's diagonal block) — each unordered pair is
  * produced exactly once across the split.
  */
case class CosTopPairs(rows: Expression, diag: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {

  require(k > 0, "k must be positive")

  override def left: Expression = rows
  override def right: Expression = diag

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (rows.dataType, diag.dataType) match {
      case (ArrayType(StructType(Array(f0, f1, f2)), _), BooleanType)
          if f0.dataType == LongType && f1.dataType == IntegerType &&
            (f2.dataType match {
              case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case (r, d) => TypeCheckResult.TypeCheckFailure(
        s"cos_top_pairs expects (array<struct<bigint,int,array<float|double>>>, boolean), " +
          s"got (${r.sql}, ${d.sql})")
    }

  // float vectors widen per element exactly like VectorDot; double
  // vectors pass through — same fold either way
  @transient private lazy val vecIsFloat =
    rows.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(2).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = true))), containsNull = false)

  // (cos DESC, id_a ASC, id_b ASC) — Double.compare ranks NaN above
  // every real, matching Spark's descending sort on DoubleType
  private def beats(c1: Double, a1: Long, b1: Long,
      c2: Double, a2: Long, b2: Long): Boolean = {
    val c = java.lang.Double.compare(c1, c2)
    c > 0 || (c == 0 && (a1 < a2 || (a1 == a2 && b1 < b2)))
  }

  override def eval(input: InternalRow): Any = {
    val arrEval = rows.eval(input)
    if (arrEval == null) return null
    val arr = arrEval.asInstanceOf[ArrayData]
    val dEval = diag.eval(input)
    val isDiag = dEval != null && dEval.asInstanceOf[Boolean]
    val n = arr.numElements()

    // unpack ONCE: ids, groups, widened vectors, norms, validity
    val ids = new Array[Long](n)
    val gs = new Array[Int](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    val bad = new Array[Boolean](n) // null vec / null element ⇒ null cos
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 3)
      ids(i) = s.getLong(0)
      gs(i) = s.getInt(1)
      if (s.isNullAt(2)) { bad(i) = true }
      else {
        val v = s.getArray(2)
        val m = v.numElements()
        val d = new Array[Double](m)
        var j = 0
        var ss = 0.0
        var ok = true
        while (j < m && ok) {
          if (v.isNullAt(j)) ok = false
          else {
            val x = if (vecIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
            d(j) = x
            ss += x * x
            j += 1
          }
        }
        if (!ok) bad(i) = true
        else { vecs(i) = d; norms(i) = math.sqrt(ss) }
      }
      i += 1
    }

    // top-k valid pairs (insertion-sorted, O(k) shift) + the k smallest
    // null-cos pairs by (id_a, id_b) for NULLS LAST padding parity
    val topCos = new Array[Double](k)
    val topA = new Array[Long](k)
    val topB = new Array[Long](k)
    var topN = 0
    val nulA = new Array[Long](k)
    val nulB = new Array[Long](k)
    var nulN = 0

    def insertTop(c: Double, a: Long, b: Long): Unit = {
      if (topN == k && !beats(c, a, b, topCos(k - 1), topA(k - 1), topB(k - 1))) return
      var j = if (topN < k) topN else k - 1
      while (j > 0 && beats(c, a, b, topCos(j - 1), topA(j - 1), topB(j - 1))) {
        topCos(j) = topCos(j - 1); topA(j) = topA(j - 1); topB(j) = topB(j - 1)
        j -= 1
      }
      topCos(j) = c; topA(j) = a; topB(j) = b
      if (topN < k) topN += 1
    }
    def smallerIds(a1: Long, b1: Long, a2: Long, b2: Long): Boolean =
      a1 < a2 || (a1 == a2 && b1 < b2)
    def insertNul(a: Long, b: Long): Unit = {
      if (nulN == k && !smallerIds(a, b, nulA(k - 1), nulB(k - 1))) return
      var j = if (nulN < k) nulN else k - 1
      while (j > 0 && smallerIds(a, b, nulA(j - 1), nulB(j - 1))) {
        nulA(j) = nulA(j - 1); nulB(j) = nulB(j - 1)
        j -= 1
      }
      nulA(j) = a; nulB(j) = b
      if (nulN < k) nulN += 1
    }

    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val pairable =
          if (isDiag) ids(i) != ids(j)
          else gs(i) != gs(j)
        if (pairable) {
          val a = math.min(ids(i), ids(j))
          val b = math.max(ids(i), ids(j))
          if (bad(i) || bad(j) || vecs(i).length != vecs(j).length) insertNul(a, b)
          else {
            val vi = vecs(i)
            val vj = vecs(j)
            var acc = 0.0
            var p = 0
            val m = vi.length
            while (p < m) { acc += vi(p) * vj(p); p += 1 }
            val den = norms(i) * norms(j)
            if (den > 0) insertTop(acc / den, a, b)
            else insertNul(a, b)
          }
        }
        j += 1
      }
      i += 1
    }

    val padN = if (topN < k) nulN else 0
    val out = new Array[Any](topN + padN)
    i = 0
    while (i < topN) {
      out(i) = new GenericInternalRow(Array[Any](topA(i), topB(i), topCos(i)))
      i += 1
    }
    var q = 0
    while (q < padN) {
      out(topN + q) = new GenericInternalRow(Array[Any](nulA(q), nulB(q), null))
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosTopPairs =
    copy(rows = newLeft, diag = newRight)

  override def prettyName: String = "cos_top_pairs"
}

object CosTopPairs {
  /** Column-API entry point. */
  def apply(rows: Column, diag: Column, k: Int): Column =
    bridge.column(CosTopPairs(bridge.expression(rows), bridge.expression(diag), k))
}
