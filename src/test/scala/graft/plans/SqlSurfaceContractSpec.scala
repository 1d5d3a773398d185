package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.SparkSpec

/** Contracts of the engine's public SQL/metadata surface that no
  * single-operator spec owns:
  *
  *  1. the SQL registry carries ONLY contract-checked expression
  *     builders — the r16 unchecked sorted-merge variants must never
  *     leak into SQL under any name (the checked flag is a constructor
  *     default the SQL builders cannot override);
  *  2. `Nullability.knownNotNull` (private[graft] since r17 — the
  *     UB-capable assertion is off the public bridge) really flips the
  *     STATIC nullability the codegen specializations key on — a
  *     column-level assertion and a transform-lambda element assertion
  *     both surface in the schema.
  */
class SqlSurfaceContractSpec extends SparkSpec {
  import spark.implicits._

  test("every SQL-registered sorted-merge builder constructs the CHECKED form") {
    val builders = GraftExtensions.descriptors.toMap
    assert(!builders.keySet.exists(_.contains("unchecked")),
      "no unchecked variant may be SQL-registered under any name")
    // construct through the registry exactly as the SQL path does and
    // inspect the expression's checked flag directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Long*) = Literal.create(new GenericArrayData(xs.toArray),
      ArrayType(LongType, containsNull = false))
    builders("sorted_overlap")(Seq(arr(1L), arr(1L))) match {
      case SortedLongOverlap(_, _, checked) => assert(checked)
      case other => fail(s"unexpected expression: $other")
    }
    builders("sorted_dot")(Seq(arr(1L), arr(1L), arr(1L), arr(1L))) match {
      case SortedTermDot(_, _, _, _, checked) => assert(checked)
      case other => fail(s"unexpected expression: $other")
    }
  }

  test("knownNotNull flips static nullability at column and array-element level") {
    val df = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .select(arrays_zip(col("a"), col("b")).as("z"))
    // transform over a zip: the analyzer cannot prove elements non-null…
    val plain = df.select(transform(col("z"), x => x("a")).as("v"))
    assert(plain.schema("v").dataType.asInstanceOf[ArrayType].containsNull)
    // …the assertion can (the CosinePairs vterms/vtfs pattern)
    val asserted = df.select(
      transform(col("z"), x => Nullability.knownNotNull(x("a"))).as("v"))
    assert(!asserted.schema("v").dataType.asInstanceOf[ArrayType].containsNull)
    // and values are untouched where the assertion holds
    assert(asserted.as[Seq[Long]].head() == Seq(1L, 2L))
    // column-level: a nullable column becomes statically non-nullable
    val colLevel = Seq(Some(5L)).toDF("x")
      .select(Nullability.knownNotNull(col("x")).as("x"))
    assert(!colLevel.schema("x").nullable)
    assert(colLevel.as[Long].head() == 5L)
  }
}
