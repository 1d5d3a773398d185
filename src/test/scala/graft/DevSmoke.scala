package graft

/** Dev replica of the driver's t1 smoke: runs SparkEntry.entry on
  * sf0.001 and prints a sample (see .claude/skills/verify/SKILL.md).
  */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()}")
    df.show(3, 60)
    spark.stop()
  }
}
