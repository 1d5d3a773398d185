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
  * The sorted-input PRECONDITION IS ENFORCED at every public surface:
  * an unsorted array raises `IllegalArgumentException` instead of
  * silently undercounting. These are public SQL functions
  * ([[GraftExtensions]]), and a misordered ad-hoc input would otherwise
  * produce a plausible wrong answer — the one defect class no oracle
  * guards at the SQL surface. The check is one branch-predictable
  * compare per element folded into a prepass (always-false on
  * contract-respecting inputs) — measured at ~1.25× of the bare verify
  * merge in-JVM (DevSortCheckCost), which is noise next to the
  * candidate join on ad-hoc calls but real money on the engine's own
  * per-pair verify stages. Those stages sort at vector/signature BUILD
  * time (`sort_array` before the candidate join fans out), so they use
  * the `checked = false` constructor flag via the `private[graft]`
  * `unchecked` Column entry points — a variant deliberately NOT
  * registered for SQL and not reachable from any public API: the SQL
  * surface always pays (and gets) the loud contract.
  *
  * Null handling is specialized at CODEGEN time on the inputs' static
  * `containsNull`: the engine's shingle/term arrays are built
  * `containsNull = false` ([[HashedShinglesExpr]] et al.), so their
  * merge loops compile with no per-element null branch at all; SQL
  * callers with nullable elements get the tolerant loops (null =
  * "no entry"). Both specializations evaluate identically on null-free
  * data — spec-pinned against each other.
  */
private[graft] object SortedMergeExprs {

  private[plans] def longArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Whether an input's ELEMENT type admits nulls, from the static
    * schema — keys the codegen specialization. Conservative `true`
    * until resolved (doGenCode only runs on resolved expressions).
    */
  private[plans] def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
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
    * `arrNulls`/`valsNulls` come from the inputs' static containsNull;
    * when neither admits nulls the loop compiles to one load + one
    * always-false compare per element with no null branch or prologue.
    */
  private[plans] def genAscendingCheck(ctx: CodegenContext,
      arr: String, arrNulls: Boolean, vals: String, valsNulls: Boolean,
      fn: String, side: String, strict: Boolean): String = {
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val v = ctx.freshName("v")
    val prev = ctx.freshName("prev")
    val cmp = if (strict) "<=" else "<"
    val skips = Seq(
      if (arrNulls) Some(s"$arr.isNullAt($k)") else None,
      if (vals != null && valsNulls) Some(s"$vals.isNullAt($k)") else None
    ).flatten
    if (skips.isEmpty) {
      s"""
         |int $n = $arr.numElements();
         |if ($n > 1) {
         |  long $prev = $arr.getLong(0);
         |  for (int $k = 1; $k < $n; $k++) {
         |    long $v = $arr.getLong($k);
         |    if ($v $cmp $prev) {
         |      graft.plans.SortedMergeExprs$$.MODULE$$.unsortedError(
         |        "$fn", "$side", $k, $strict);
         |    }
         |    $prev = $v;
         |  }
         |}
       """.stripMargin
    } else {
      val skip = skips.mkString(" || ")
      // prologue finds the first considered element, so the hot loop is
      // one load + one always-false compare per element — no flag
      s"""
         |int $n = $arr.numElements();
         |int $k = 0;
         |while ($k < $n && ($skip)) $k++;
         |if ($k < $n) {
         |  long $prev = $arr.getLong($k);
         |  for ($k++; $k < $n; $k++) {
         |    if ($skip) continue;
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
}

/** `sorted_overlap(a, b)` → INT: the number of DISTINCT values present
  * in both long arrays, each sorted ascending — byte-identical to
  * `size(array_intersect(a, b))` on null-free inputs (duplicates
  * within one array count once; the dual-advance skips equal runs).
  * Null elements are ignored (the dedup shingle arrays are declared
  * `containsNull=false`; tolerating stray nulls keeps SQL callers from
  * crashing, and the verify semantics treat null as "no shingle").
  * Inputs MUST be sorted ascending, and with `checked = true` (every
  * public surface — SQL and the Column `apply`) the contract is
  * ENFORCED: an out-of-order non-null element raises rather than
  * undercounting. `checked = false` is reachable only through the
  * `private[graft]` [[SortedLongOverlap.unchecked]] entry point, for
  * engine verify paths whose arrays are sorted by construction at
  * build time (`sort_array` before the candidate join) — the prepass
  * there re-checks an invariant the plan already guarantees, on every
  * candidate pair.
  */
case class SortedLongOverlap(left: Expression, right: Expression,
    checked: Boolean = true)
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
    if (checked) {
      SortedMergeExprs.checkAscending(a, null, "sorted_overlap", "left", strict = false)
      SortedMergeExprs.checkAscending(b, null, "sorted_overlap", "right", strict = false)
    }
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
      val aNulls = SortedMergeExprs.elemNullable(left)
      val bNulls = SortedMergeExprs.elemNullable(right)
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt")
      val checks = if (!checked) "" else
        SortedMergeExprs.genAscendingCheck(ctx, a, aNulls, null, valsNulls = false,
          "sorted_overlap", "left", strict = false) +
        SortedMergeExprs.genAscendingCheck(ctx, b, bNulls, null, valsNulls = false,
          "sorted_overlap", "right", strict = false)
      // containsNull=false inputs compile merge loops with no null branch
      val skipA = if (aNulls) s"if ($a.isNullAt($i)) { $i++; continue; }" else ""
      val skipB = if (bNulls) s"if ($b.isNullAt($j)) { $j++; continue; }" else ""
      val runA = if (aNulls) s"($a.isNullAt($i) || $a.getLong($i) == $x)"
        else s"$a.getLong($i) == $x"
      val runB = if (bNulls) s"($b.isNullAt($j) || $b.getLong($j) == $x)"
        else s"$b.getLong($j) == $x"
      s"""
         |$checks
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  $skipA
         |  $skipB
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) {
         |    $cnt++;
         |    while ($i < $na && $runA) $i++;
         |    while ($j < $nb && $runB) $j++;
         |  } else if ($x < $y) { $i++; } else { $j++; }
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
  /** Column-API entry point — contract-checked, like the SQL surface. */
  def apply(a: Column, b: Column): Column =
    bridge.column(SortedLongOverlap(bridge.expression(a), bridge.expression(b)))

  /** Engine-internal variant that SKIPS the sorted-input prepass. Use
    * ONLY where the plan sorts the arrays by construction immediately
    * before the candidate join (`sort_array` at signature/vector
    * build) — the prepass would re-verify a guaranteed invariant once
    * per candidate pair (~1.25× of the merge itself, DevSortCheckCost).
    * Not SQL-registered; misuse on genuinely unsorted input silently
    * undercounts, which is why this stays `private[graft]`.
    */
  private[graft] def unchecked(a: Column, b: Column): Column =
    bridge.column(SortedLongOverlap(bridge.expression(a), bridge.expression(b),
      checked = false))
}

/** `sorted_dot(terms_a, tfs_a, terms_b, tfs_b)` → BIGINT: the sparse
  * integer dot product Σ tf_a·tf_b over shared term keys, where each
  * (terms, tfs) pair is parallel arrays with terms sorted ascending and
  * UNIQUE within a document (the tf-vector invariant: one entry per
  * distinct term). Exact BIGINT arithmetic — the cosine decision stays
  * integer until the caller's final sqrt. A length mismatch between a
  * terms array and its tfs array yields null (malformed vector, never
  * a silent wrong dot); null elements are tolerated as "no entry".
  * With `checked = true` (every public surface) the sorted-unique
  * terms contract is ENFORCED: a non-increasing neighbour pair among
  * the entries the merge would consider (key and tf both non-null)
  * raises instead of silently dropping terms from the dot.
  * `checked = false` is reachable only through the `private[graft]`
  * [[SortedTermDot.unchecked]] entry point, for the engine's APSS
  * verify whose vectors are term-sorted by construction at build.
  */
case class SortedTermDot(
    termsA: Expression, tfsA: Expression,
    termsB: Expression, tfsB: Expression,
    checked: Boolean = true)
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
    if (checked) {
      SortedMergeExprs.checkAscending(keysA, valsA, "sorted_dot", "left terms", strict = true)
      SortedMergeExprs.checkAscending(keysB, valsB, "sorted_dot", "right terms", strict = true)
    }
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
      val kaNulls = SortedMergeExprs.elemNullable(termsA)
      val vaNulls = SortedMergeExprs.elemNullable(tfsA)
      val kbNulls = SortedMergeExprs.elemNullable(termsB)
      val vbNulls = SortedMergeExprs.elemNullable(tfsB)
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      val checks = if (!checked) "" else
        SortedMergeExprs.genAscendingCheck(ctx, ta, kaNulls, fa, vaNulls,
          "sorted_dot", "left terms", strict = true) +
        SortedMergeExprs.genAscendingCheck(ctx, tb, kbNulls, fb, vbNulls,
          "sorted_dot", "right terms", strict = true)
      // containsNull=false inputs compile merge loops with no null branch
      def skip(parts: Seq[Option[String]], idx: String): String = {
        val ps = parts.flatten
        if (ps.isEmpty) "" else s"if (${ps.mkString(" || ")}) { $idx++; continue; }"
      }
      val skipA = skip(Seq(
        if (kaNulls) Some(s"$ta.isNullAt($i)") else None,
        if (vaNulls) Some(s"$fa.isNullAt($i)") else None), i)
      val skipB = skip(Seq(
        if (kbNulls) Some(s"$tb.isNullAt($j)") else None,
        if (vbNulls) Some(s"$fb.isNullAt($j)") else None), j)
      s"""
         |int $na = $ta.numElements();
         |int $nb = $tb.numElements();
         |if ($na != $fa.numElements() || $nb != $fb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $checks
         |  int $i = 0; int $j = 0; long $acc = 0L;
         |  while ($i < $na && $j < $nb) {
         |    $skipA
         |    $skipB
         |    long $x = $ta.getLong($i);
         |    long $y = $tb.getLong($j);
         |    if ($x == $y) { $acc += $fa.getLong($i) * $fb.getLong($j); $i++; $j++; }
         |    else if ($x < $y) { $i++; } else { $j++; }
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
  /** Column-API entry point — contract-checked, like the SQL surface. */
  def apply(termsA: Column, tfsA: Column, termsB: Column, tfsB: Column): Column =
    bridge.column(SortedTermDot(
      bridge.expression(termsA), bridge.expression(tfsA),
      bridge.expression(termsB), bridge.expression(tfsB)))

  /** Engine-internal variant that SKIPS the sorted-unique prepass —
    * see [[SortedLongOverlap.unchecked]] for the use rule (arrays
    * sorted by construction at vector build, never SQL-exposed).
    */
  private[graft] def unchecked(termsA: Column, tfsA: Column,
      termsB: Column, tfsB: Column): Column =
    bridge.column(SortedTermDot(
      bridge.expression(termsA), bridge.expression(tfsA),
      bridge.expression(termsB), bridge.expression(tfsB),
      checked = false))
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
