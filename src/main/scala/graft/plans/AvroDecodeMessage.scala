package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.avro.AvroCodec

/** Native Avro message decode: binary wire bytes → the 5-field message
  * struct, building Catalyst `InternalRow`/`UTF8String` values directly.
  *
  * This is the UDF-promotion SURVEY.md §7.4 reserves for when decode is
  * hot: a `ScalaUDF` round-trips every row through external Scala
  * objects (case class ⇄ InternalRow encoders); this expression writes
  * the internal representation straight from the Avro record. Decoder
  * instances stay per-thread like the reference's reused BinaryDecoder
  * (AvroDeserializationSchema.java:62-70). CodegenFallback is fine here:
  * the body is an opaque library call either way — what matters is
  * skipping the serialization layer, not inlining avro into codegen.
  *
  * `failFast = true` mirrors the reference's throw-on-malformed
  * (AvroDeserializationSchema.java:47-49); `false` yields null rows
  * (PERMISSIVE-style).
  */
case class AvroDecodeMessage(child: Expression, failFast: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = graft.model.Schemas.message

  // lenient mode yields null on malformed bytes regardless of child
  // nullability — without this, dead-letter `isNull` filters are
  // constant-folded away over non-nullable value columns
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avro_decode_message expects BINARY input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val m = AvroCodec.decode(bytes)
      InternalRow(
        UTF8String.fromString(m.msgId),
        UTF8String.fromString(m.username),
        UTF8String.fromString(m.jid),
        UTF8String.fromString(m.stanza),
        m.sentTime)
    } catch {
      case e: Exception => if (failFast) throw e else null
    }
  }

  override protected def withNewChildInternal(c: Expression): AvroDecodeMessage =
    copy(child = c)

  override def prettyName: String = "avro_decode_message"
}

object AvroDecodeMessage {
  /** Column-API entry point (fail-fast by default, like the reference). */
  def apply(c: Column, failFast: Boolean = true): Column =
    bridge.column(AvroDecodeMessage(bridge.expression(c), failFast))
}
