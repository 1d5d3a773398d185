package graft.streaming

import graft.SparkSpec

class StreamingBenchSpec extends SparkSpec {

  test("streaming bench drains the full sf0.001 message stream in N micro-batches") {
    val work = tmpDir("sbench")
    val n = StreamingBench.writeWire(spark, sf0001, s"$work/wire", batches = 4)
    assert(n == 1000, "sf0.001 messages table should encode to 1000 wire records")

    val r = StreamingBench.drain(spark, s"$work/wire", work)
    // maxFilesPerTrigger=1 over 4 wire files → exactly 4 data batches
    assert(r.batches == 4, r.toString)
    assert(r.records == 1000, r.toString)
    assert(r.seconds > 0 && r.rps > 0, r.toString)

    // the timed drain did the real work: dual sinks hold the converged
    // tables (1000 keyed detail rows; summary is the distinct user set)
    val detail = spark.read.parquet(s"$work/detail")
    assert(detail.count() == 1000)
    assert(spark.read.parquet(s"$work/summary").count() > 0)
  }

  test("run() one-call form reports the same totals and cleans its workdir") {
    val r = StreamingBench.run(spark, sf0001, batches = 2)
    assert(r.records == 1000 && r.batches == 2 && r.rps > 0, r.toString)
  }
}
