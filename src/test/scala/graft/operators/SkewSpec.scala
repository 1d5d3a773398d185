package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain aggregation (sum/count/min/max + derived avg)") {
    val li = Tables.lineitem(spark, sf0001)
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(
      li, Seq("l_returnflag"), saltOn = col("l_orderkey"), n = 8,
      partial = Seq(sum("l_quantity").as("sq"), count(lit(1)).as("n"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx")),
      merge = Seq(sum("sq").as("sq"), sum("n").as("n"),
        min("mn").as("mn"), max("mx").as("mx")))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, inner and left") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .agg(count(lit(1)), sum("o_totalprice").cast("decimal(18,2)"))
      .collect().toSeq
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"),
      bigSaltOn = col("l_quantity"), n = 4)
      .agg(count(lit(1)), sum("o_totalprice").cast("decimal(18,2)"))
      .collect().toSeq
    assert(salted == plain)

    val plainLeft = li.join(o, Seq("l_orderkey"), "left").count()
    val saltedLeft = Skew.saltedJoin(li, o, Seq("l_orderkey"),
      bigSaltOn = col("l_quantity"), n = 4, joinType = "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("salt is deterministic and bounded") {
    val s = Tables.lineitem(spark, sf0001)
      .select(Skew.salt(col("l_orderkey"), 16).as("s"))
    val mm = s.agg(min("s"), max("s")).as[(Int, Int)].head()
    assert(mm._1 >= 0 && mm._2 < 16)
    assert(s.distinct().count() == 16) // all buckets used on 6k rows
  }
}
