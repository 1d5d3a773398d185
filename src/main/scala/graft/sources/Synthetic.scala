package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Deterministic synthetic-table generator mirroring the driver testdata
  * at arbitrary scale factors (TESTDATA.md: TPC-H-ish star schema +
  * `events` stream + `documents`/`embeddings` LLM-pipeline tables).
  *
  * Purpose: scale-linearity measurement beyond the shipped sf0.1 —
  * generate sf1/sf10 locally and compare per-query times against sf0.1
  * (SCALE.md). The distributions replicate what the shipped parquet
  * exhibits (measured, not assumed): same key ranges, categorical sets,
  * date windows, join fan-outs (lineitem-per-order ~ Poisson(4)), text
  * vocabulary/length, exact-duplicate rate, and unit-norm random
  * embeddings — so per-query work scales the way the real tables would.
  *
  * Scale notes: every table is generated as a NARROW per-row map over
  * `spark.range` (or a flatMap for lineitem's per-order fan-out) with an
  * RNG seeded from (table, row id) — deterministic under any
  * partitioning, no shuffle, no driver-side data. Generating 100 TB is
  * the same plan at a bigger `n`.
  */
object Synthetic {

  /** Per-row deterministic RNG: output depends only on (table, id), never
    * on partitioning — splitmix the seed so adjacent ids decorrelate.
    */
  private def rng(table: String, id: Long): java.util.Random = {
    var z = table.hashCode.toLong * 0x9E3779B97F4A7C15L + id
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    new java.util.Random(z ^ (z >>> 31))
  }

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  /** Row counts per table at scale factor `sf`, matching the shipped
    * dirs at sf0.01/sf0.1 (embeddings ships sub-linear there — 500 then
    * 2000; we keep the honest linear 20000/sf so ANN timing ratios stay
    * interpretable).
    */
  def counts(sf: Double): Map[String, Long] = Map(
    "customer" -> (150000 * sf).round,
    "supplier" -> (10000 * sf).round,
    "part" -> (200000 * sf).round,
    "orders" -> (1500000 * sf).round,
    "events" -> (1000000 * sf).round,
    "documents" -> (50000 * sf).round,
    "embeddings" -> (20000 * sf).round
  )

  private val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val partTypes =
    Seq("ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO")
  private val partAdjs =
    Seq("large", "hot", "blue", "green", "small", "dark", "light", "round")
  private val partNouns =
    Seq("ring", "bolt", "screw", "gear", "plate", "wheel", "pin", "cap")
  // the 31-word vocabulary the shipped documents draw from (measured)
  private val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")
  private val langs = Seq("en", "zh", "es", "fr", "de")
  private val langCum = Seq(0.41, 0.56, 0.71, 0.86, 1.0) // measured mix

  // date windows measured from the shipped tables
  private val orderEpochDay0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
  private val orderDaySpan = 2405 // 1995-01-01 .. 2001-08-01
  private val eventNanos0 =
    java.time.LocalDate.of(2024, 1, 1).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000000L
  private val eventNanoSpan = 30L * 86400 * 1000000000L // 30 days of January

  private def dayTs(epochDay: Long): Timestamp =
    new Timestamp(epochDay * 86400000L)

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    regions.zipWithIndex.map { case (n, i) => (i, n) }
      .toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = rng("customer", id)
      (id, f"Customer#$id%09d", r.nextInt(25),
        round2(-1000.0 + r.nextDouble() * 11000.0),
        segments(r.nextInt(segments.size)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  def supplier(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = rng("supplier", id)
      (id, f"Supplier#$id%09d", r.nextInt(25),
        round2(r.nextDouble() * 10000.0))
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  }

  def part(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = rng("part", id)
      (id, s"${partAdjs(r.nextInt(8))} ${partNouns(r.nextInt(8))}",
        s"Brand#${r.nextInt(25) + 1}", partTypes(r.nextInt(partTypes.size)),
        1 + r.nextInt(50), round2(900.0 + id * 0.1))
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
  }

  /** The deterministic draw sequence of one order row. Factored out so
    * [[lineitem]] replays the IDENTICAL prefix when it needs the order
    * date — a partial replay (skipping the first three draws) silently
    * decorrelates l_shipdate from o_orderdate and distorts every
    * date-predicate selectivity the SCALE.md ratios depend on.
    */
  private final case class OrderDraw(custkey: Long, status: String,
      totalprice: Double, epochDay: Long, priority: String)

  private def orderDraw(okey: Long, customers: Long): OrderDraw = {
    val r = rng("orders", okey)
    OrderDraw(
      math.floorMod(r.nextLong(), customers),
      "OPF".charAt(r.nextInt(3)).toString,
      round2(1000.0 + r.nextDouble() * 499000.0),
      orderEpochDay0 + r.nextInt(orderDaySpan),
      priorities(r.nextInt(priorities.size)))
  }

  def orders(spark: SparkSession, n: Long, customers: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val o = orderDraw(id, customers)
      (id, o.custkey, o.status, o.totalprice, dayTs(o.epochDay), o.priority)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
  }

  /** Lineitem fans out of orders: per order a Poisson(4) line count
    * (Knuth inversion on the order's own RNG), so ~2% of orders have no
    * lines and the orderkey-join fan-out matches the shipped data. The
    * generator is a narrow flatMap over the order id range.
    */
  def lineitem(spark: SparkSession, nOrders: Long, nParts: Long,
      nSupps: Long): DataFrame = {
    import spark.implicits._
    val expNeg4 = math.exp(-4.0)
    spark.range(nOrders).flatMap { okey =>
      val r = rng("lineitem", okey)
      var k = 0; var p = 1.0
      while ({ p *= r.nextDouble(); p > expNeg4 }) k += 1
      // full replay of the order's draw sequence — l_shipdate must land
      // strictly after this order's o_orderdate (customers count only
      // scales a discarded floorMod, never the draw sequence)
      val orderDay = orderDraw(okey, 1L).epochDay
      (1 to k).map { ln =>
        val qty = (1 + r.nextInt(50)).toDouble
        (okey, math.floorMod(r.nextLong(), nParts),
          math.floorMod(r.nextLong(), nSupps), ln, qty,
          round2(qty * (900.0 + r.nextDouble() * 1200.0)),
          r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
          "ANR".charAt(r.nextInt(3)).toString,
          "FO".charAt(r.nextInt(2)).toString,
          dayTs(orderDay + 1 + r.nextInt(95)))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
  }

  /** `ts` is written as epoch-NANO longs — the same thing Spark sees
    * when reading the driver's TIMESTAMP(NANOS) parquet under
    * `nanosAsLong`, so [[Tables.events]] treats both identically.
    */
  def events(spark: SparkSession, n: Long, users: Long): DataFrame = {
    import spark.implicits._
    val types = Seq("signup", "purchase", "view", "click", "error")
    spark.range(n).map { id =>
      val r = rng("events", id)
      (id, eventNanos0 + math.floorMod(r.nextLong(), eventNanoSpan),
        math.floorMod(r.nextLong(), users), types(r.nextInt(types.size)),
        // Exponential(mean 50); 1-u keeps the argument in (0,1] so a
        // nextDouble()==0.0 draw can't emit +Infinity into sums/avgs
        round2(-50.0 * math.log(1.0 - r.nextDouble())),
        s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Pure text of document `id` — referenced by the dup-planting path,
    * so a duplicate regenerates its source's words instead of joining.
    */
  private def docText(id: Long): String = {
    val r = rng("doctext", id)
    val words = 10 + r.nextInt(91)
    val sb = new StringBuilder
    var i = 0
    while (i < words) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(r.nextInt(vocab.size)))
      i += 1
    }
    sb.toString
  }

  def documents(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = rng("documents", id)
      // ~0.16% of docs replay an earlier doc's text verbatim (the
      // shipped tables' exact-duplicate rate: 8 planted pairs / 5000)
      val text =
        if (id > 10 && r.nextDouble() < 0.0016)
          docText(math.floorMod(r.nextLong(), id))
        else docText(id)
      val u = r.nextDouble()
      val lang = langs(langCum.indexWhere(u <= _))
      (id, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = rng("embeddings", id)
      val v = Array.fill(dim)(r.nextGaussian())
      val inv = 1.0 / math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x * inv).toFloat), r.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
  }

  /** Generate every table of one scale factor under `dir` (single
    * parquet dir per table, `<dir>/<name>.parquet`, like TESTDATA.md).
    */
  def generate(spark: SparkSession, dir: String, sf: Double): Unit = {
    val c = counts(sf)
    val users = math.max(1L, (15000 * sf).round) // measured: customers/10
    val all: Seq[(String, DataFrame)] = Seq(
      "region" -> region(spark),
      "nation" -> nation(spark),
      "customer" -> customer(spark, c("customer")),
      "supplier" -> supplier(spark, c("supplier")),
      "part" -> part(spark, c("part")),
      "orders" -> orders(spark, c("orders"), c("customer")),
      "lineitem" -> lineitem(spark, c("orders"), c("part"), c("supplier")),
      "events" -> events(spark, c("events"), users),
      "documents" -> documents(spark, c("documents")),
      "embeddings" -> embeddings(spark, c("embeddings"))
    )
    all.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
  }
}
