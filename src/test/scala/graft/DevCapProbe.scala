package graft

import org.apache.spark.sql.functions._

/** Dev aid (r17 optimization): why is the df-capped APSS/PPJoin form
  * slower than the exact form at sf0.1? Prints per-stage row volumes
  * and times for both. `Test/runMain graft.DevCapProbe <sfdir>`.
  */
object DevCapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get(GraftSession.envCpus)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[capprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (cap <- Seq(None, Some(15))) {
      println(s"[capprobe] ===== dfCap=$cap =====")
      val dt = docs
        .select(col("doc_id").as("id"),
          explode(graft.plans.TextHashExprs.hashedShingleList(
            lower(col("text")), 3)).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      val dfreqAll = dt.groupBy("term").agg(count(lit(1)).as("df"))
      val dfreq = cap.fold(dfreqAll)(c => dfreqAll.filter(col("df") <= c))
      val vecs = dt.join(dfreq, "term")
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("term"), col("tf")))).as("ts"))
        .select(col("id"),
          transform(col("ts"), x => x("term")).as("terms"),
          transform(col("ts"), x => x("tf")).as("tfs"))
        .withColumn("rsqs", graft.plans.SuffixSqMass(col("tfs")))
        .withColumn("n2", element_at(col("rsqs"), 1))
        .persist()
      timed("vector build")(println("[capprobe] vecs=" + vecs.count() +
        " totalTerms=" + vecs.select(sum(size(col("terms")))).head().getLong(0)))
      val t = 0.6
      val bound = lit(t * t) * col("n2").cast("double")
      val tailLen = size(filter(col("rsqs"), r => r.cast("double") < bound))
      val pre = vecs
        .select(col("id"), col("n2"),
          explode(slice(arrays_zip(col("terms"), col("rsqs")),
            lit(1), size(col("terms")) - tailLen)).as("e"))
        .select(col("id"), col("n2"), col("e.terms").as("term"), col("e.rsqs").as("rsq"))
        .persist()
      timed("prefix explode")(println("[capprobe] preRows=" + pre.count()))
      val tt = lit(t * t)
      val cands = pre.as("l")
        .join(pre.as("r"),
          col("l.term") === col("r.term") && col("l.id") < col("r.id") &&
            col("l.rsq").cast("double") * col("r.rsq").cast("double") >=
              tt * col("l.n2").cast("double") * col("r.n2").cast("double") *
                lit(1.0 - 1e-9))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      timed("candidate join (pre-dedup count)")(
        println("[capprobe] candRows=" + cands.count()))
      val dedup = cands.dropDuplicates("id_a", "id_b")
      timed("cand dedup")(println("[capprobe] candPairs=" + dedup.count()))
      vecs.unpersist(); pre.unpersist()
    }
    spark.stop()
  }
}
