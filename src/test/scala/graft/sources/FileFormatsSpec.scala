package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Batch file-format coverage beyond the parquet contract: CSV and
  * JSON-lines round-trips with explicit schemas (inference is a
  * full extra pass at 100 TB — always pass the schema), partitioned
  * layout on both, and compression that survives the round-trip.
  */
class FileFormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "lang", "source", "n_chars")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("CSV round-trip with explicit schema preserves every row") {
    val dir = tmpDir("csv_rt")
    docs.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trip preserves rows and types") {
    val dir = tmpDir("json_rt")
    docs.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.schema == schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("partitioned JSON write prunes partitions at read") {
    val dir = tmpDir("json_part")
    docs.write.partitionBy("lang").json(dir)
    val one = spark.read
      .schema(StructType(schema.filterNot(_.name == "lang"))
        .add("lang", StringType))
      .json(dir)
      .filter($"lang" === "en")
    val expected = docs.filter($"lang" === "en").count()
    assert(one.count() == expected)
  }

  test("gzip CSV survives the round-trip (splittability tradeoff is the caller's)") {
    val dir = tmpDir("csv_gz")
    docs.write.option("compression", "gzip").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == docs.count())
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val dir = tmpDir("orc_rt")
    docs.write.orc(dir)
    val back = spark.read.schema(schema).orc(dir)
    assert(back.schema == schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // ORC scans take predicate pushdown like parquet — pin it, so a
    // 100 TB ORC-resident corpus filters at the stripe level, not in
    // a Spark Filter over full rows
    val filtered = back.filter($"n_chars" > 100)
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("n_chars"),
      scan.metadata("PushedFilters"))
    assert(filtered.count() == docs.filter($"n_chars" > 100).count())
  }

  test("partitioned ORC write prunes partitions at read") {
    val dir = tmpDir("orc_part")
    docs.write.partitionBy("lang").orc(dir)
    val one = spark.read
      .schema(StructType(schema.filterNot(_.name == "lang"))
        .add("lang", StringType))
      .orc(dir)
      .filter($"lang" === "en")
    assert(one.count() == docs.filter($"lang" === "en").count())
    val scan = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata.get("PartitionFilters")
      .exists(_.contains("lang")), scan.metadata.get("PartitionFilters"))
  }
}
