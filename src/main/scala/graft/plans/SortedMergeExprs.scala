package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Sorted-array merge expressions for the set/vector-similarity verify
  * hot paths. The candidate-verification joins of the APSS/PPJoin
  * family evaluate one exact overlap or dot product PER CANDIDATE PAIR
  * — millions of rows at corpus scale — so the per-pair verify must be
  * a single codegen'd linear merge, not an interpreted higher-order
  * fold (HOFs don't participate in whole-stage codegen and `element_at`
  * on a map probes by LINEAR SCAN, making the map-based dot O(|a|·|b|)
  * interpreted work per pair) and not a per-row hash set
  * (`array_intersect` allocates and fills an OpenHashSet and
  * materializes the intersection array per pair when only its SIZE is
  * needed).
  *
  * All three expressions are exact integer arithmetic over presorted
  * long arrays — the sort is paid once per document before the
  * candidate join fans out, so verification is O(|a|+|b|) compiled work
  * with zero allocation per pair.
  *
  * The sorted-input PRECONDITION IS ENFORCED: an unsorted array raises
  * `IllegalArgumentException` instead of silently undercounting. These
  * are public SQL functions ([[GraftExtensions]]), and a misordered
  * ad-hoc input would otherwise produce a plausible wrong answer — the
  * one defect class no oracle guards at the SQL surface. The check is
  * one branch-predictable compare per element folded into a prepass
  * (always-false on contract-respecting inputs), measured in the noise
  * on the APSS/PPJoin verify paths whose arrays are sorted once at
  * vector build.
  */
private[graft] object SortedMergeExprs {

  private[plans] def longArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Loud misuse failure — also the codegen throw site. `strict`
    * distinguishes the dot's unique-ascending terms contract from the
    * overlap's duplicates-allowed ascending one in the message.
    */
  def unsortedError(fn: String, side: String, idx: Int, strict: Boolean): Nothing =
    throw new IllegalArgumentException(
      s"$fn: $side input array is not sorted " +
        (if (strict) "strictly ascending (sorted UNIQUE term keys required)"
         else "ascending") +
        s" at index $idx — sort it at build time (array_sort), as the " +
        "engine's vector/signature builders do")

  /** Interpreted-path order validation over the non-null elements the
    * merge considers. `strict` additionally rejects equal neighbours
    * (the tf-vector unique-terms invariant). `vals` — when non-null —
    * is the parallel tf array whose null entries make a position
    * invisible to the merge, so they are invisible to the check too.
    */
  def checkAscending(a: ArrayData, vals: ArrayData, fn: String, side: String,
      strict: Boolean): Unit = {
    val n = a.numElements()
    var prev = 0L
    var hasPrev = false
    var k = 0
    while (k < n) {
      if (!a.isNullAt(k) && (vals == null || !vals.isNullAt(k))) {
        val v = a.getLong(k)
        if (hasPrev && (if (strict) v <= prev else v < prev))
          unsortedError(fn, side, k, strict)
        prev = v
        hasPrev = true
      }
      k += 1
    }
  }

  /** Codegen for [[checkAscending]]: same skip logic, inline throw via
    * the static helper (Janino resolves the Scala object's MODULE$).
    */
  private[plans] def genAscendingCheck(ctx: CodegenContext, arr: String,
      vals: String, fn: String, side: String, strict: Boolean): String = {
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val v = ctx.freshName("v")
    val prev = ctx.freshName("prev")
    val skipVal = if (vals == null) "" else s" || $vals.isNullAt($k)"
    val cmp = if (strict) "<=" else "<"
    // prologue finds the first considered element, so the hot loop is
    // one load + one always-false compare per element — no flag
    s"""
       |int $n = $arr.numElements();
       |int $k = 0;
       |while ($k < $n && ($arr.isNullAt($k)$skipVal)) $k++;
       |if ($k < $n) {
       |  long $prev = $arr.getLong($k);
       |  for ($k++; $k < $n; $k++) {
       |    if ($arr.isNullAt($k)$skipVal) continue;
       |    long $v = $arr.getLong($k);
       |    if ($v $cmp $prev) {
       |      graft.plans.SortedMergeExprs$$.MODULE$$.unsortedError(
       |        "$fn", "$side", $k, $strict);
       |    }
       |    $prev = $v;
       |  }
       |}
     """.stripMargin
  }
}

/** `sorted_overlap(a, b)` → INT: the number of DISTINCT values present
  * in both long arrays, each sorted ascending — byte-identical to
  * `size(array_intersect(a, b))` on null-free inputs (duplicates
  * within one array count once; the dual-advance skips equal runs).
  * Null elements are ignored (the dedup shingle arrays are declared
  * `containsNull=false`; tolerating stray nulls keeps SQL callers from
  * crashing, and the verify semantics treat null as "no shingle").
  * Inputs MUST be sorted ascending, and the contract is ENFORCED: an
  * out-of-order non-null element raises rather than undercounting —
  * the prepass is one always-false compare per element, free next to
  * the merge itself.
  */
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (SortedMergeExprs.longArray(left.dataType) &&
        SortedMergeExprs.longArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_overlap expects two array<bigint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    SortedMergeExprs.checkAscending(a, null, "sorted_overlap", "left", strict = false)
    SortedMergeExprs.checkAscending(b, null, "sorted_overlap", "right", strict = false)
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) {
          cnt += 1
          // the run-skip also steps over nulls INSIDE an equal run —
          // otherwise array(5, null, 5) would count 5 twice, breaking
          // the documented nulls-ignored / duplicates-once contract
          while (i < na && (a.isNullAt(i) || a.getLong(i) == x)) i += 1
          while (j < nb && (b.isNullAt(j) || b.getLong(j) == x)) j += 1
        } else if (x < y) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt")
      s"""
         |${SortedMergeExprs.genAscendingCheck(ctx, a, null, "sorted_overlap", "left", strict = false)}
         |${SortedMergeExprs.genAscendingCheck(ctx, b, null, "sorted_overlap", "right", strict = false)}
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $a.getLong($i);
         |    long $y = $b.getLong($j);
         |    if ($x == $y) {
         |      $cnt++;
         |      while ($i < $na && ($a.isNullAt($i) || $a.getLong($i) == $x)) $i++;
         |      while ($j < $nb && ($b.isNullAt($j) || $b.getLong($j) == $x)) $j++;
         |    } else if ($x < $y) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongOverlap =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_overlap"
}

object SortedLongOverlap {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    bridge.column(SortedLongOverlap(bridge.expression(a), bridge.expression(b)))
}

/** `sorted_dot(terms_a, tfs_a, terms_b, tfs_b)` → BIGINT: the sparse
  * integer dot product Σ tf_a·tf_b over shared term keys, where each
  * (terms, tfs) pair is parallel arrays with terms sorted ascending and
  * UNIQUE within a document (the tf-vector invariant: one entry per
  * distinct term). Exact BIGINT arithmetic — the cosine decision stays
  * integer until the caller's final sqrt. A length mismatch between a
  * terms array and its tfs array yields null (malformed vector, never
  * a silent wrong dot); null elements are tolerated as "no entry".
  * The sorted-unique terms contract is ENFORCED: a non-increasing
  * neighbour pair among the entries the merge would consider (key and
  * tf both non-null) raises instead of silently dropping terms from
  * the dot.
  */
case class SortedTermDot(
    termsA: Expression, tfsA: Expression,
    termsB: Expression, tfsB: Expression)
    extends QuaternaryExpression {

  override def first: Expression = termsA
  override def second: Expression = tfsA
  override def third: Expression = termsB
  override def fourth: Expression = tfsB

  override def dataType: DataType = LongType

  // mismatched parallel arrays yield null from non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => SortedMergeExprs.longArray(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_dot expects four array<bigint> inputs, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(ta: Any, fa: Any, tb: Any, fb: Any): Any = {
    val keysA = ta.asInstanceOf[ArrayData]
    val valsA = fa.asInstanceOf[ArrayData]
    val keysB = tb.asInstanceOf[ArrayData]
    val valsB = fb.asInstanceOf[ArrayData]
    val na = keysA.numElements()
    val nb = keysB.numElements()
    if (na != valsA.numElements() || nb != valsB.numElements()) return null
    SortedMergeExprs.checkAscending(keysA, valsA, "sorted_dot", "left terms", strict = true)
    SortedMergeExprs.checkAscending(keysB, valsB, "sorted_dot", "right terms", strict = true)
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      if (keysA.isNullAt(i) || valsA.isNullAt(i)) i += 1
      else if (keysB.isNullAt(j) || valsB.isNullAt(j)) j += 1
      else {
        val x = keysA.getLong(i)
        val y = keysB.getLong(j)
        if (x == y) { acc += valsA.getLong(i) * valsB.getLong(j); i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ta, fa, tb, fb) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      s"""
         |int $na = $ta.numElements();
         |int $nb = $tb.numElements();
         |if ($na != $fa.numElements() || $nb != $fb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${SortedMergeExprs.genAscendingCheck(ctx, ta, fa, "sorted_dot", "left terms", strict = true)}
         |  ${SortedMergeExprs.genAscendingCheck(ctx, tb, fb, "sorted_dot", "right terms", strict = true)}
         |  int $i = 0; int $j = 0; long $acc = 0L;
         |  while ($i < $na && $j < $nb) {
         |    if ($ta.isNullAt($i) || $fa.isNullAt($i)) { $i++; }
         |    else if ($tb.isNullAt($j) || $fb.isNullAt($j)) { $j++; }
         |    else {
         |      long $x = $ta.getLong($i);
         |      long $y = $tb.getLong($j);
         |      if ($x == $y) { $acc += $fa.getLong($i) * $fb.getLong($j); $i++; $j++; }
         |      else if ($x < $y) { $i++; } else { $j++; }
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SortedTermDot =
    copy(termsA = newFirst, tfsA = newSecond, termsB = newThird, tfsB = newFourth)

  override def prettyName: String = "sorted_dot"
}

object SortedTermDot {
  /** Column-API entry point. */
  def apply(termsA: Column, tfsA: Column, termsB: Column, tfsB: Column): Column =
    bridge.column(SortedTermDot(
      bridge.expression(termsA), bridge.expression(tfsA),
      bridge.expression(termsB), bridge.expression(tfsB)))
}

/** `suffix_sq_mass(tfs)` → ARRAY<BIGINT>: element i (0-based) is
  * Σ_{j≥i} tfs[j]² — the squared L2 mass of the vector's suffix
  * starting at each position. Feeds the APSS candidate join's
  * Cauchy–Schwarz positional filter (the L2AP residual bound,
  * Anastasiu & Karypis ICDE'14): a prefix token exploded at position p
  * carries `rsq[p]`, and a join row can only belong to a qualifying
  * pair if `rsq_a(p)·rsq_b(q) ≥ t²·n2_a·n2_b`. One O(n) backward pass
  * per document, computed once before the vector cache — never on the
  * per-candidate path (hence interpreted eval is fine; the expression
  * still ships codegen for completeness). Null elements contribute 0.
  */
case class SuffixSqMass(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (SortedMergeExprs.longArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"suffix_sq_mass expects array<bigint>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var acc = 0L
    var i = n - 1
    while (i >= 0) {
      if (!a.isNullAt(i)) {
        val x = a.getLong(i)
        acc += x * x
      }
      out(i) = acc
      i -= 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val arr = ctx.freshName("arr")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long[] $arr = new long[$n];
         |long $acc = 0L;
         |for (int $i = $n - 1; $i >= 0; $i--) {
         |  if (!$a.isNullAt($i)) {
         |    long $x = $a.getLong($i);
         |    $acc += $x * $x;
         |  }
         |  $arr[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SuffixSqMass =
    copy(child = newChild)

  override def prettyName: String = "suffix_sq_mass"
}

object SuffixSqMass {
  /** Column-API entry point. */
  def apply(tfs: Column): Column =
    bridge.column(SuffixSqMass(bridge.expression(tfs)))
}
