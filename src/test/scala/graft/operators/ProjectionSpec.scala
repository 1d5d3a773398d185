package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JL random projection: MatVec correctness, the exact-equivalence
  * degenerate case (shortlist covers the corpus ⇒ identical to brute
  * force), and the registered recall floor.
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.sources.Tables.embeddings(spark, sf001)

  test("MatVec multiplies exactly (sequential-fold parity with VectorDot)") {
    val m = Array(Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 0.0))
    val rows = Seq((1L, Array(1f, 1f, 1f)), (2L, Array(2f, 0f, -2f)))
      .toDF("id", "v")
    val got = rows.select($"id", graft.plans.MatVec($"v", m).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) == Seq(6.0, -0.5))
    assert(got(2L) == Seq(-4.0, 1.0))
  }

  test("MatVec rejects a dimension mismatch loudly") {
    val m = Array(Array(1.0, 2.0))
    val bad = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
    val e = intercept[Exception] {
      bad.select(graft.plans.MatVec($"v", m)).collect()
    }
    assert(e.getMessage.contains("mat_vec") ||
      e.getCause != null && e.getCause.getMessage.contains("mat_vec"))
  }

  test("gaussianMatrix is deterministic and isometry-scaled") {
    val a = Projection.gaussianMatrix(8, 16, seed = 31L)
    val b = Projection.gaussianMatrix(8, 16, seed = 31L)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // E[Σ m²] per column = 1 under the 1/√k scaling; loose sanity band
    val fro = a.flatten.map(x => x * x).sum / 16.0
    assert(fro > 0.5 && fro < 2.0, s"frobenius/dim $fro")
  }

  test("shortlist covering the corpus reproduces brute force exactly") {
    val panel = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(panel, emb, k = 5)
      .withColumn("cos", round($"cos", 9))
    val viaProj = Projection.projectedTopK(panel, emb, k = 5, dim = 64,
      outDim = 32, shortlist = 1000000)
      .withColumn("cos", round($"cos", 9))
    assert(viaProj.exceptAll(exact).isEmpty && exact.exceptAll(viaProj).isEmpty)
  }

  test("registered recall row is empty (floor holds end to end)") {
    val df = graft.SparkEntry.queries("sim_project_recall")(spark, sf001)
    assert(df.count() === 0)
  }
}
