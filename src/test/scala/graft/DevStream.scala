package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev aid (r18): per-batch job census of the streaming pipeline —
  * counts jobs and their wall-clock inside StreamingBench.run to find
  * the per-batch floor. `Test/runMain graft.DevStream <sfdir> [batches]`.
  */
object DevStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.get(GraftSession.envCpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val ended = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, System.nanoTime())
        val d = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        val cs = Option(e.properties.getProperty("callSite.short")).getOrElse("")
        ended.add((e.jobId, -1.0, s"START $cs $d")); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { t0 =>
          ended.add((e.jobId, (System.nanoTime() - t0) / 1e9, "END")); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val r = graft.streaming.StreamingBench.run(spark, sfDir, batches)
    Thread.sleep(500)
    println(f"[devstream] records=${r.records} batches=${r.batches} sec=${r.seconds}%.2f rps=${r.rps}%.0f")
    import scala.jdk.CollectionConverters._
    val starts = ended.asScala.filter(_._3.startsWith("START")).map(x => x._1 -> x._3).toMap
    val ends = ended.asScala.filter(_._3 == "END").map(x => x._1 -> x._2).toMap
    starts.toSeq.sortBy(_._1).foreach { case (id, desc) =>
      println(f"[devstream] job $id%3d ${ends.getOrElse(id, -1.0)}%6.2f s  ${desc.drop(6).take(110)}")
    }
    println(s"[devstream] total jobs=${starts.size} over ${r.batches} batches")
    spark.stop()
  }
}
