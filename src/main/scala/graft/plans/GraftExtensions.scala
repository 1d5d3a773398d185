package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer: registers graft's native expressions into
  * a session's function registry so they are callable from SQL
  * (`SELECT vector_dot(a, b)`) as well as the Column API.
  *
  * Use either `.withExtensions(new GraftExtensions)` at session build
  * time or `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
    ext.injectFunction(GraftExtensions.avroDecodeDescriptor)
  }
}

object GraftExtensions {

  private val vectorDotDescriptor = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vector_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  private val avroDecodeDescriptor = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("avro_decode_message"),
    new ExpressionInfo(classOf[AvroDecodeMessage].getName, "avro_decode_message"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "avro_decode_message takes exactly 1 argument")
      AvroDecodeMessage(children.head, failFast = true)
    })

  /** Idempotent per-session registration (for sessions not built with
    * `.withExtensions`).
    */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", children => vectorDotDescriptor._3(children), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avro_decode_message", children => avroDecodeDescriptor._3(children), "scala_udf")
  }
}
