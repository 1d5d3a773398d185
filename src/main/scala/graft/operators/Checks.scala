package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared argument checks for operators whose key columns feed typed
  * encoders or modular arithmetic — places where a lossy `cast` would
  * turn "unsupported input" into a silently-wrong (empty or
  * all-one-bucket) result instead of an error.
  */
object Checks {

  /** Require `idCol` to be an integral type (byte/short/int/long).
    * `context` names the operator and the column's role for the error
    * message, e.g. `"mmrRerank: queries id column 'vec_id'"`.
    */
  def requireIntegralId(df: DataFrame, idCol: String, context: String): Unit =
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$context must be integral (byte/short/int/long), " +
          s"got ${other.simpleString}")
    }
}
