package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the generator's distributional parity with the shipped testdata
  * (the assumptions SCALE.md's linearity ratios rest on).
  */
class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  test("counts at sf0.1 match the shipped sf0.1 dirs (except embeddings, documented)") {
    val c = Synthetic.counts(0.1)
    assert(c("customer") == 15000 && c("orders") == 150000 &&
      c("part") == 20000 && c("supplier") == 1000 &&
      c("events") == 100000 && c("documents") == 5000)
  }

  test("generation is deterministic and partitioning-independent") {
    val a = Synthetic.documents(spark, 200).collect().sortBy(_.getLong(0))
    val b = Synthetic.documents(spark, 200).repartition(7)
      .collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("lineitem fan-out ~ Poisson(4): ~2% empty orders, mean ~4 lines") {
    val li = Synthetic.lineitem(spark, 2000, 4000, 200)
    val n = li.count().toDouble
    assert(n > 2000 * 3.5 && n < 2000 * 4.5, s"total lines $n")
    val withLines = li.select("l_orderkey").distinct().count()
    val emptyFrac = 1.0 - withLines / 2000.0
    assert(emptyFrac > 0.005 && emptyFrac < 0.05, s"empty-order fraction $emptyFrac")
  }

  test("every l_shipdate lands strictly after its order's o_orderdate") {
    val o = Synthetic.orders(spark, 2000, 300)
    val li = Synthetic.lineitem(spark, 2000, 4000, 200)
    val violations = li.join(o, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" <= $"o_orderdate").count()
    assert(violations == 0L, s"$violations lines ship on/before their order date")
    // and the ship window is the documented 1..96 days after the order
    val maxGap = li.join(o, $"l_orderkey" === $"o_orderkey")
      .select(datediff($"l_shipdate", $"o_orderdate").as("gap"))
      .agg(max("gap")).as[Int].head()
    assert(maxGap <= 96, s"max ship gap $maxGap days")
  }

  test("event values are finite (Exponential draw can never hit log(0))") {
    val bad = Synthetic.events(spark, 5000, 500)
      .filter(isnan($"value") || $"value" === Double.PositiveInfinity ||
        $"value" < 0.0).count()
    assert(bad == 0L)
  }

  test("schemas match the shipped tables column-for-column") {
    for ((name, df) <- Seq(
        "customer" -> Synthetic.customer(spark, 10),
        "orders" -> Synthetic.orders(spark, 10, 10),
        "lineitem" -> Synthetic.lineitem(spark, 10, 10, 5),
        "documents" -> Synthetic.documents(spark, 10),
        "embeddings" -> Synthetic.embeddings(spark, 10))) {
      val shipped = spark.read.parquet(s"$sf001/$name.parquet")
      assert(df.schema.fieldNames.toSeq == shipped.schema.fieldNames.toSeq,
        s"$name: ${df.schema.fieldNames.toSeq} vs ${shipped.schema.fieldNames.toSeq}")
    }
    // events: generated ts is epoch-nano LONG, the exact type Spark sees
    // reading the shipped TIMESTAMP(NANOS) parquet under nanosAsLong —
    // so Tables.events treats both identically
    val ev = Synthetic.events(spark, 10, 5)
    assert(ev.schema.fieldNames.toSeq ==
      spark.read.parquet(s"$sf001/events.parquet").schema.fieldNames.toSeq)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
  }

  test("documents mirror vocab, length window, lang mix, and dup rate") {
    val docs = Synthetic.documents(spark, 5000).cache()
    try {
      val vocabSize = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(countDistinct("w")).as[Long].head()
      assert(vocabSize == 31, s"vocab $vocabSize")
      val (lo, hi) = docs
        .agg(min(length(col("text"))), max(length(col("text"))))
        .as[(Int, Int)].head()
      assert(lo >= 10 && hi <= 600, s"char range [$lo,$hi]")
      val en = docs.filter($"lang" === "en").count() / 5000.0
      assert(en > 0.36 && en < 0.46, s"en fraction $en")
      // planted exact duplicates: a handful per 5000, never zero, never many
      val dupRows = 5000 - docs.select("text").distinct().count()
      assert(dupRows >= 1 && dupRows <= 40, s"dup rows $dupRows")
    } finally { docs.unpersist(); () }
  }

  test("embeddings are unit-norm 64-dim with 10 balanced labels") {
    val e = Synthetic.embeddings(spark, 500)
    val norms = e.select(aggregate(transform(col("embedding"),
        x => x * x), lit(0.0d), (a, x) => a + x).as("sq"))
      .agg(min("sq"), max("sq")).as[(Double, Double)].head()
    assert(math.abs(norms._1 - 1.0) < 1e-5 && math.abs(norms._2 - 1.0) < 1e-5)
    assert(e.select(countDistinct("label")).as[Long].head() == 10)
  }
}
