package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer: registers graft's native expressions into
  * a session's function registry so they are callable from SQL
  * (`SELECT vector_dot(a, b)`, `SELECT simhash_sig(text)`) as well as
  * the Column API.
  *
  * Use either `.withExtensions(new GraftExtensions)` at session build
  * time or `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    ext.injectOptimizerRule(_ => BandJoinRule)
  }
}

object GraftExtensions {

  /** A literal-integer argument (shingle size, signature length, …) —
    * SQL call sites pass these as constants; anything non-foldable is a
    * user error surfaced at analysis time.
    */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l.isValidInt, s"$what out of Int range: $l")
        l.toInt
      case x => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $x")
    }
  }

  private def arity(children: Seq[Expression], name: String, n: Int*): Unit =
    require(n.contains(children.size),
      s"$name takes ${n.mkString(" or ")} arguments, got ${children.size}")

  private[plans] val descriptors: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> { children =>
      arity(children, "vector_dot", 2)
      VectorDot(children.head, children(1))
    },
    "avro_decode_message" -> { children =>
      arity(children, "avro_decode_message", 1)
      AvroDecodeMessage(children.head, failFast = true)
    },
    // hashed_shingles(text[, n=3])
    "hashed_shingles" -> { children =>
      arity(children, "hashed_shingles", 1, 2)
      val n = if (children.size > 1) litInt(children(1), "shingle size n") else 3
      HashedShinglesExpr(children.head, n)
    },
    // hashed_shingle_list(text[, n=3]) — multiplicity-keeping tf form
    "hashed_shingle_list" -> { children =>
      arity(children, "hashed_shingle_list", 1, 2)
      val n = if (children.size > 1) litInt(children(1), "shingle size n") else 3
      HashedShingleListExpr(children.head, n)
    },
    // minhash_sig(shingles[, k=64])
    "minhash_sig" -> { children =>
      arity(children, "minhash_sig", 1, 2)
      val k = if (children.size > 1) litInt(children(1), "signature length k") else 64
      MinHashSigExpr(children.head, k)
    },
    // simhash_sig(text)
    "simhash_sig" -> { children =>
      arity(children, "simhash_sig", 1)
      SimHashSigExpr(children.head)
    },
    // int8_quantize(vec) → struct(scale, codes, qnorm, q_sum, q_l1, max_err)
    "int8_quantize" -> { children =>
      arity(children, "int8_quantize", 1)
      Int8QuantizeExpr(children.head)
    },
    // xml_text(xml, tag) → tolerant text extraction (CDATA, entities,
    // numeric char refs, comments/PIs) per the reference pull parser
    "xml_text" -> { children =>
      arity(children, "xml_text", 2)
      XmlTextExpr(children.head, children(1))
    },
    // sign_pack(vec) → array<bigint> packed sign bits (1-bit quantization)
    "sign_pack" -> { children =>
      arity(children, "sign_pack", 1)
      SignPackExpr(children.head)
    },
    // hamming_dist(codeA, codeB) → bigint popcount(xor)
    "hamming_dist" -> { children =>
      arity(children, "hamming_dist", 2)
      HammingDistExpr(children.head, children(1))
    },
    // pq_adc(lut, codes) — the ADC m-lookup scoring fold (PQ); encode/
    // lut capture a codebook matrix and stay Column-API-only
    "pq_adc" -> { children =>
      arity(children, "pq_adc", 2)
      PqAdcExpr(children.head, children(1))
    },
    // topk_pairs(score, id, k) — native bounded-heap top-k aggregate
    "topk_pairs" -> { children =>
      arity(children, "topk_pairs", 3)
      TopKPairs.widened(children.head, children(1), litInt(children(2), "k"))
        .toAggregateExpression()
    },
    // hyperplane_sigs(vec, dim, planes, tables[, seed=7])
    "hyperplane_sigs" -> { children =>
      arity(children, "hyperplane_sigs", 4, 5)
      val seed = if (children.size > 4) litInt(children(4), "seed").toLong else 7L
      HyperplaneSigsExpr(children.head, litInt(children(1), "dim"),
        litInt(children(2), "planes"), litInt(children(3), "tables"), seed)
    },
    // sorted_overlap(a, b) — |a ∩ b| over ascending-sorted long arrays.
    // The sortedness precondition is ENFORCED (unsorted input raises,
    // never a silent undercount); sort with array_sort before calling
    "sorted_overlap" -> { children =>
      arity(children, "sorted_overlap", 2)
      SortedLongOverlap(children.head, children(1))
    },
    // sorted_dot(terms_a, tfs_a, terms_b, tfs_b) — sparse BIGINT dot
    // over term-sorted parallel arrays. Terms must be sorted UNIQUE
    // ascending — ENFORCED (misordered/duplicate keys raise)
    "sorted_dot" -> { children =>
      arity(children, "sorted_dot", 4)
      SortedTermDot(children.head, children(1), children(2), children(3))
    },
    // suffix_sq_mass(tfs) — per-position suffix Σtf² (APSS L2 bound)
    "suffix_sq_mass" -> { children =>
      arity(children, "suffix_sq_mass", 1)
      SuffixSqMass(children.head)
    })

  /** Idempotent per-session registration (for sessions not built with
    * `.withExtensions`).
    */
  def install(spark: SparkSession): Unit = {
    descriptors.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, children => builder(children), "scala_udf")
    }
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(BandJoinRule)) {
      spark.experimental.extraOptimizations = extra :+ BandJoinRule
    }
  }
}
