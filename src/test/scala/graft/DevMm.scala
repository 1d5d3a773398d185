package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only attribution harness for `mm_image_probe`'s scale curve
  * (judge r14 #4: the second decade measured 8.8× for 10× images with
  * no mechanism stated). The query is two stages — synthetic ENCODE
  * (BufferedImage + PNG/JPEG writer per row) and ImageIO PROBE
  * (header parse per row) — so this times them separately, and adds a
  * 3× point built from id-shifted copies of the same id set (images
  * derive purely from doc_id, so the shifted union is a legitimate
  * same-distribution scale point). If per-image cost is flat across
  * the 1× → 3× step, the 8.8× decade is fixed-cost amortization
  * becoming invisible; if it grows, something per-image is creeping
  * superlinear.
  *
  * Hand-invoked (not part of the suite):
  *   sbt 'testOnly graft.DevMm'
  * with -Dgraft.mmdir=/tmp/graft_sf10 (default: $devDataRoot/sf0.1).
  */
class DevMm extends SparkSpec {

  ignore("mm_image_probe stage attribution at 1x and 3x") {
    // env var, not only a -D prop: sbt forks the test JVM, and the
    // environment inherits while system properties do not
    val dir = sys.props.get("graft.mmdir")
      .orElse(sys.env.get("GRAFT_MMDIR"))
      .getOrElse(s"$devDataRoot/sf0.1")
    val ids = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    def shifted(off: Long): DataFrame =
      ids.select((col("doc_id") + lit(off)).as("doc_id"))
    val one = ids
    val three = ids.unionByName(shifted(10000000L)).unionByName(shifted(20000000L))

    def medianOf3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    Seq("1x" -> one, "3x" -> three).foreach { case (label, docs) =>
      val n = docs.count()
      val enc = medianOf3 {
        graft.operators.Multimodal.syntheticImages(docs).count(); ()
      }
      val full = medianOf3 {
        graft.operators.Multimodal.extractMeta(
          graft.operators.Multimodal.syntheticImages(docs),
          () => new graft.operators.Multimodal.ImageIODecoder).count(); ()
      }
      val probe = full - enc
      println(f"[devmm] $label n=$n encode=$enc%.2f s (${enc / n * 1e6}%.1f us/img) " +
        f"full=$full%.2f s probe~=$probe%.2f s (${probe / n * 1e6}%.1f us/img)")
    }
  }
}
