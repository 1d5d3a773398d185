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
}
