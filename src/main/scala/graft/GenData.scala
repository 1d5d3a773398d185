package graft

/** Synthetic testdata generator CLI: `runMain graft.GenData <sf> <outDir>`
  * — e.g. `runMain graft.GenData 1 /tmp/sf1` for the SCALE.md
  * scale-linearity runs. Distributions per [[graft.sources.Synthetic]].
  */
object GenData {
  def main(args: Array[String]): Unit = {
    val Array(sfStr, outDir) = args
    val spark = GraftSession.get(GraftSession.envCpus)
    val t0 = System.nanoTime()
    graft.sources.Synthetic.generate(spark, outDir, sfStr.toDouble)
    println(f"[gendata] sf=$sfStr out=$outDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
