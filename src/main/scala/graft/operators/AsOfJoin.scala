package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for every left row, attach the most
  * recent right row with the same keys whose timestamp is <= the left
  * timestamp (backward direction; the common "latest dimension state at
  * event time" operator — absent from both the reference and stock
  * Spark's DataFrame API).
  *
  * Spark-first implementation: tag + union + keyed window with a
  * last-non-null carry-forward. ONE shuffle on the keys, a sort within
  * partitions, zero pairwise expansion — the shape that survives 100 TB
  * (a range-condition join would explode into a broadcast-nested-loop;
  * per-key loops wouldn't distribute). Equal timestamps match (>=):
  * right rows sort before left rows at the same instant; among equal-ts
  * right rows the highest tie-break value wins deterministically.
  */
object AsOfJoin {

  /** @param left      event-side frame
    * @param right     state-side frame; its payload columns must not
    *                  collide with left's column names (rename first)
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name (becomes a payload col)
    * @param rightCols right payload columns to attach (null when no match)
    * @param tieBreak  right-side column ordering ties at identical ts
    * @param tolerance max (leftTs - rightTs) in seconds; <=0 = unbounded
    */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tieBreak: String, tolerance: Long = -1L): DataFrame = {
    require(rightCols.forall(!left.columns.contains(_)),
      "right payload columns must not collide with left columns")
    val payloadCols = rightCols :+ rightTs
    val leftExtra = left.columns.filterNot(keys.contains).toSeq

    // a genuinely-NULL struct literal — struct(lit(null), …) would be a
    // non-null struct of null fields, which last(ignoreNulls) won't skip
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val nullPayload = lit(null).cast(payloadType)
    val lNorm = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__tie"), nullPayload.as("__payload")) ++
        leftExtra.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieBreak).cast("long").as("__tie"),
        struct(payloadCols.map(col): _*).as("__payload")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lNorm.unionByName(rNorm)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol =
      if (tolerance <= 0) matched
      else matched.withColumn("__match",
        when(unix_micros(col("__ts")) -
          unix_micros(col("__match").getField(rightTs)) <= tolerance * 1000000L,
          col("__match"))) // exact µs compare: a cast-to-seconds floor
                           // would admit matches up to tolerance+0.999s stale
    withTol.select(
      left.columns.map(col).toSeq ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
