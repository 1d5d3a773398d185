package graft

import org.apache.spark.sql.functions._

/** Dev-only substage profile of the APSS vector build. */
class DevCosProfile2 extends SparkSpec {

  ignore("vector build substages at sf0.1") {
    val docs = spark.read.parquet(s"$devDataRoot/sf0.1/documents.parquet")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cosprof2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println("[cosprof2] docs=" + docs.count() +
      " avgTokens=" + docs.select(avg(size(split(trim(lower(col("text"))), "\\s+")))).head().getDouble(0))
    // LEGACY Column-HOF tokenizer, timed as the reference the native
    // form replaced (it re-evaluates the tokenizer tree per element —
    // the O(len²) cost hashed_shingle_list exists to avoid)
    val shLegacy = docs.select(col("doc_id").as("id"),
      graft.operators.CosinePairs.shingleList(col("text"), 3).as("shl"))
    timed("LEGACY shingleList HOF")(println("[cosprof2] totalShingles=" +
      shLegacy.select(sum(size(col("shl")))).head().getLong(0)))
    val shNative = docs.select(col("doc_id").as("id"),
      graft.plans.TextHashExprs.hashedShingleList(
        lower(col("text")), 3).as("shl"))
    timed("native hashed_shingle_list")(println("[cosprof2] totalShingles=" +
      shNative.select(sum(size(col("shl")))).head().getLong(0)))
    val dt = shNative.select(col("id"), explode(col("shl")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    timed("dt groupBy")(println("[cosprof2] dtRows=" + dt.count()))
    val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
    timed("dfreq")(println("[cosprof2] terms=" + dfreq.count()))
    val joined = dt.join(dfreq, "term")
    val vecs0 = joined.groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("term"), col("tf")))).as("ts"))
      .persist()
    timed("join+collect+sort")(vecs0.count())
    val vecs = vecs0.select(col("id"),
        transform(col("ts"), x => x("term")).as("terms"),
        transform(col("ts"), x => x("tf")).as("tfs"))
      .withColumn("n2", aggregate(col("tfs"), lit(0L), (a, x) => a + x * x))
      .withColumn("rsqs", graft.plans.SuffixSqMass(col("tfs")))
      .withColumn("vts", sort_array(arrays_zip(col("terms"), col("tfs"))))
      .select(col("id"), col("terms"), col("tfs"), col("n2"), col("rsqs"),
        transform(col("vts"), x => x("terms")).as("vterms"),
        transform(col("vts"), x => x("tfs")).as("vtfs"))
      .persist()
    timed("transforms+n2+rsqs+vsort")(vecs.count())
    dt.unpersist(); vecs0.unpersist(); vecs.unpersist()
  }
}
