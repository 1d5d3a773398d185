package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profile for the APSS cosine join (not a spec —
  * invoked by hand: `testOnly graft.DevCosProfile`).
  */
class DevCosProfile extends SparkSpec {

  ignore("stage profile at sf0.1") {
    val docs = spark.read.parquet(s"$devDataRoot/sf0.1/documents.parquet")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cosprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // mirror tfCosinePairsManaged stages (the PRODUCTION tokenizer —
    // native hashed_shingle_list over lowercased text)
    val dt = docs
      .select(col("doc_id").as("id"),
        explode(graft.plans.TextHashExprs.hashedShingleList(
          lower(col("text")), 3)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val vecs = dt.join(dfreq, "term")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("term"), col("tf")))).as("ts"))
      .select(col("id"),
        transform(col("ts"), x => x("term")).as("terms"),
        transform(col("ts"), x => x("tf")).as("tfs"))
      .withColumn("n2", aggregate(col("tfs"), lit(0L), (a, x) => a + x * x))
      .withColumn("rsqs", graft.plans.SuffixSqMass(col("tfs")))
      .persist()
    timed("vector build")(vecs.count())
    val t = 0.6
    val bound = lit(t * t) * col("n2").cast("double")
    val tailLen = aggregate(reverse(col("tfs")),
      struct(lit(0L).as("s"), lit(0).as("c")),
      (acc, x) => {
        val s2 = acc("s") + x * x
        struct(s2.as("s"),
          (acc("c") + when(s2.cast("double") < bound, 1).otherwise(0)).as("c"))
      },
      acc => acc("c"))
    val pre = vecs.select(col("id"), col("n2"),
        explode(slice(arrays_zip(col("terms"), col("rsqs")),
          lit(1), size(col("terms")) - tailLen)).as("e"))
      .select(col("id"), col("n2"), col("e.terms").as("term"), col("e.rsqs").as("rsq"))
      .persist()
    timed("prefix explode rows=" + pre.count().toString)(())
    val joined = pre.as("l").join(pre.as("r"),
      col("l.term") === col("r.term") && col("l.id") < col("r.id"))
    timed("raw join rows")(println("[cosprof] raw=" + joined.count()))
    val filtered = joined.filter(
      col("l.rsq").cast("double") * col("r.rsq").cast("double") >=
        lit(t * t) * col("l.n2").cast("double") * col("r.n2").cast("double") *
          lit(1.0 - 1e-9))
    timed("filtered join rows")(println("[cosprof] filt=" + filtered.count()))
    val cands = filtered
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b").persist()
    timed("cands dedup")(println("[cosprof] cands=" + cands.count()))
    vecs.unpersist(); pre.unpersist(); cands.unpersist()
  }
}
