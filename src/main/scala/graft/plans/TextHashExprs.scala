package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row text-hashing expressions for the dedup family.
  *
  * These replace interpreted higher-order-function chains (split →
  * transform(xxhash64) → zip_with folds) AND, more importantly at scale,
  * let MinHash/SimHash signatures be computed as a narrow projection —
  * no explode, no groupBy, no shuffle of the corpus. On a 1000-executor
  * cluster the signature stage becomes embarrassingly parallel map work
  * co-located with the parquet scan; only the tiny (id, signature)
  * output ever shuffles.
  *
  * Bit-for-bit parity with the Column-API forms in
  * [[graft.operators.Dedup]] is load-bearing (specs cross-check them):
  *   - tokenization = `split(trim(text), "\\s+")`: UTF8String.trim strips
  *     ASCII spaces only; Java `\s` is ASCII `[ \t\n\x0B\f\r]`; Spark's
  *     split keeps leading/trailing empty tokens (limit -1). Multi-byte
  *     UTF-8 never contains ASCII bytes, so the byte scan is safe.
  *   - token hash = Spark `xxhash64(token)` = XXH64(utf8 bytes, seed 42),
  *     hashed in place over the row's string buffer (zero allocation).
  */
private[graft] object TextHash {

  final val XxSeed = 42L

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** xxhash64 of each `split(trim(text), "\\s+")` token, in order.
    * Replicates Pattern.split(s, -1): empty input → one empty token;
    * leading/trailing whitespace → leading/trailing empty tokens.
    */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val t = text.trim()
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val n = t.numBytes()
    if (n == 0) return Array(XXH64.hashUnsafeBytes(base, off, 0, XxSeed))
    var hashes = new Array[Long](8)
    var m = 0
    def add(h: Long): Unit = {
      if (m == hashes.length) hashes = java.util.Arrays.copyOf(hashes, m * 2)
      hashes(m) = h; m += 1
    }
    def byteAt(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)
    var i = 0
    var tokStart = 0
    var inWs = false
    // leading whitespace ⇒ empty first token (trim removed spaces but not
    // tabs/newlines, matching split(trim(x), "\\s+") exactly)
    while (i < n) {
      val ws = isSpace(byteAt(i))
      if (ws && !inWs) {
        add(XXH64.hashUnsafeBytes(base, off + tokStart, i - tokStart, XxSeed))
        inWs = true
      } else if (!ws && inWs) {
        tokStart = i
        inWs = false
      }
      i += 1
    }
    // final token: text run since tokStart, or the trailing empty token a
    // terminal whitespace run produces under limit -1
    if (inWs) add(XXH64.hashUnsafeBytes(base, off, 0, XxSeed))
    else add(XXH64.hashUnsafeBytes(base, off + tokStart, n - tokStart, XxSeed))
    if (m == hashes.length) hashes else java.util.Arrays.copyOf(hashes, m)
  }

  def rot(c: Long, k: Int): Long = (c << k) | (c >>> (64 - k))

  /** Rotate-XOR n-gram mix over token hashes + first-occurrence-order
    * distinct — the byte-identical native form of
    * [[graft.operators.Dedup.hashedShingles]] (schedule (j·21) mod 64).
    */
  def shingleHashes(toks: Array[Long], n: Int): Array[Long] =
    distinctPreservingOrder(shingleHashesAll(toks, n))

  /** [[shingleHashes]] WITHOUT the distinct: one mixed hash per shingle
    * POSITION, multiplicity preserved — the tf-vector form (cosine
    * weighting needs the counts the set form drops).
    */
  def shingleHashesAll(toks: Array[Long], n: Int): Array[Long] = {
    val len = toks.length
    if (len < n) return Array.emptyLongArray
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = toks(i)
      var j = 1
      while (j < n) {
        h ^= rot(toks(i + j), (j * 21) % 64)
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** First-occurrence-order distinct of a long array (array_distinct
    * parity) via open-addressed probing — no per-element boxing.
    */
  def distinctPreservingOrder(xs: Array[Long]): Array[Long] = {
    val n = xs.length
    if (n <= 1) return xs
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    val mask = cap - 1
    while (i < n) {
      val x = xs(i)
      var slot = (java.lang.Long.hashCode(x * -7046029254386353131L)) & mask
      var seen = false
      var probing = true
      while (probing) {
        if (!used(slot)) probing = false
        else if (table(slot) == x) { seen = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!seen) {
        used(slot) = true; table(slot) = x
        out(m) = x; m += 1
      }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  final val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) minhash parameters — single source of truth
    * shared with the Column-API form (same Random(42) draw sequence).
    */
  def minhashParams(k: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime31 - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime31))
  }

  def pmod(x: Long, p: Long): Long = { val r = x % p; if (r < 0) r + p else r }
}

/** `hashed_shingles(text, n)` → array<long>: distinct rotate-XOR-mixed
  * n-gram hashes of whitespace tokens (see [[TextHash]] for parity
  * contract; cf. the reference's tokenizer-adjacent stanza handling,
  * /root/reference XmppPacketReader.java:292-304, which our text ops
  * generalize to corpus scale).
  */
case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles expects a string column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenHashes(input.asInstanceOf[UTF8String])
    new GenericArrayData(TextHash.shingleHashes(toks, n))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingles"
}

/** `hashed_shingle_list(text, n)` → array<long>: [[HashedShinglesExpr]]
  * WITHOUT the distinct — one element per shingle POSITION, so term
  * frequencies survive (`groupBy(id, term).count` over the explode is
  * the tf-vector build). Same tokenizer and rotate-XOR mix, so the set
  * form is exactly `array_distinct` of this one. Exists because the
  * Column-HOF shingle builder re-evaluates the tokenizer tree once per
  * ELEMENT (Catalyst has no let-binding inside a lambda), turning an
  * O(len) scan into O(len²) per document on the APSS hot path.
  */
case class HashedShingleListExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingle_list expects a string column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenHashes(input.asInstanceOf[UTF8String])
    new GenericArrayData(TextHash.shingleHashesAll(toks, n))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingleListExpr =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingle_list"
}

/** `minhash_sig(shingles, k)` → array<long>: k MinHash values of a
  * pre-hashed shingle set, h_i(S) = min pmod(a_i·pmod(s,p)+b_i, p) with
  * p = 2^31−1 — per-row, shuffle-free. Null for an empty set (no
  * well-defined min; callers filter size > 0 first).
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty set → null

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.sql}")
  }

  @transient private lazy val params = TextHash.minhashParams(k)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val p = TextHash.MersennePrime31
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < n) {
      // null elements are skipped, matching the Column-API form
      // (array_min ignores nulls); reachable via SQL call sites —
      // hashedShingles itself never emits them
      if (!arr.isNullAt(i)) {
        seen += 1
        val h = TextHash.pmod(arr.getLong(i), p)
        var j = 0
        while (j < k) {
          val v = TextHash.pmod(h * params(j)._1 + params(j)._2, p)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (seen == 0) null else new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** `simhash_sig(text)` → bigint: 64-bit SimHash over whitespace tokens
  * (bit b set when the ±1 votes from token-hash bit b sum positive) —
  * per-row, shuffle-free; bit-identical to [[graft.operators.Dedup]]'s
  * scalar and aggregate forms.
  */
case class SimHashSigExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects a string column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenHashes(input.asInstanceOf[UTF8String])
    val n = toks.length
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = toks(i)
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object TextHashExprs {
  def hashedShingles(text: Column, n: Int = 3): Column =
    bridge.column(HashedShinglesExpr(bridge.expression(text), n))

  def hashedShingleList(text: Column, n: Int = 3): Column =
    bridge.column(HashedShingleListExpr(bridge.expression(text), n))

  def minhashSig(shingles: Column, k: Int = 64): Column =
    bridge.column(MinHashSigExpr(bridge.expression(shingles), k))

  def simhashSig(text: Column): Column =
    bridge.column(SimHashSigExpr(bridge.expression(text)))
}
