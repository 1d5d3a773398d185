package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001).cache()

  test("cosine: unit parallel = 1, orthogonal = 0, antiparallel = -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f)),
      (Array(3f, 4f), Array(6f, 8f))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 9)).as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0, -1.0, 1.0))
  }

  test("brute-force top-k: k rows per query, ranks contiguous, scores sorted") {
    val topk = Similarity.bruteForceTopK(emb.filter($"vec_id" < 5), emb, k = 5)
      .collect()
    assert(topk.length == 25)
    val byQ = topk.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("hard triplets: argmax per label side, margin, anchors without a side dropped") {
    // anchor 0 (label A): positives {1}, negatives {2, 3}; vectors set
    // up so cos(0,1)=1 (hardest positive) and cos(0,2)>cos(0,3)
    val df = Seq(
      (0L, Array(1f, 0f), "A"),
      (1L, Array(2f, 0f), "A"),   // parallel to anchor → pos_cos 1
      (2L, Array(1f, 1f), "B"),   // cos = √2/2
      (3L, Array(0f, 1f), "B"),   // cos = 0
      (4L, Array(5f, 5f), "C")    // label C: no same-label partner
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardTriplets(df.filter($"vec_id".isin(0L, 4L)), df)
      .orderBy("anchor_id")
      .as[(Long, Long, Double, Long, Double, Double)].collect()
    // anchor 4 has no positive → dropped; anchor 0 fully determined
    assert(got.length == 1)
    val (a, posId, posCos, negId, negCos, margin) = got(0)
    assert(a == 0L && posId == 1L && posCos == 1.0 && negId == 2L)
    assert(math.abs(negCos - math.sqrt(2) / 2) < 1e-9)
    assert(math.abs(margin - (1.0 - math.sqrt(2) / 2)) < 1e-9)
    // exact-tie determinism: two identical negatives → smaller id wins
    val tie = Seq(
      (0L, Array(1f, 0f), "A"), (1L, Array(1f, 0f), "A"),
      (7L, Array(1f, 1f), "B"), (5L, Array(1f, 1f), "B")
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.hardTriplets(tie.filter($"vec_id" === 0L), tie)
      .select("neg_id").as[Long].head()
    assert(t == 5L)
  }

  test("LSH top-k recall vs brute force >= 0.7 on testdata") {
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, emb, k = 5, dim = 64, planes = 4, tables = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall")
    // and the approximate path scores far fewer pairs than brute force
    val cands = Similarity.lshTopK(q, emb, k = 1000000, dim = 64).count()
    assert(cands < emb.count() * q.count(), "LSH must prune the pair space")
  }

  test("IVF top-k: centroids are elementwise means; recall reasonable; candidates pruned") {
    import org.apache.spark.sql.functions._
    val cells = Similarity.centroids(emb, "label")
    assert(cells.count() == 10) // one per label
    // centroid of label 0 position 0 equals the exact mean
    val exp = emb.filter($"label" === 0)
      .select(element_at($"embedding", 1).cast("double")).agg(avg("*"))
      .as[Double].head()
    val got = cells.filter($"cell" === 0)
      .select(element_at($"centroid", 1)).as[Double].head()
    assert(math.abs(got - exp) < 1e-9)

    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, cells, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall") // weak-cluster synthetic data
    // pruning: candidate space strictly smaller than brute force
    val cands = Similarity.ivfTopK(q, emb, cells, k = 1000000, nprobe = 4).count()
    assert(cands < emb.count() * q.count() / 2, s"cands=$cands")
  }

  test("IVF exhaustive probing equals brute force exactly (ranks and scores)") {
    // probing every cell degenerates the candidate set to the whole
    // corpus — the inverted-file plumbing (narrow corpus assignment,
    // probe fan-out, scoring, ranking) must then reproduce brute force
    // bit-for-bit; this is the local twin of the sim_ivf_exhaustive_topk
    // oracle row
    val q = emb.filter($"vec_id" < 10)
    val cells = Similarity.centroids(emb, "label")
    val bf = Similarity.bruteForceTopK(q, emb, k = 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ivf = Similarity.ivfTopK(q, emb, cells, k = 5, nprobe = 10)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ivf == bf)
  }

  test("seedCentroids on an empty corpus fails with a named message") {
    val err = intercept[IllegalArgumentException] {
      Similarity.seedCentroids(emb.filter($"vec_id" < 0), 4)
    }
    assert(err.getMessage.contains("seedCentroids"), err.getMessage)
  }

  test("testdata seed ids are dense from 0 (oracle `WHERE vec_id < k` parity)") {
    // seedCentroids takes the first k vectors by id (orderBy+limit); the
    // DuckDB oracles replay it as `WHERE vec_id < k`. Those agree only
    // while ids 0..k-1 all exist — pin that executable here so a testdata
    // regeneration with sparse/offset ids fails loudly instead of
    // silently hash-mismatching sim_semantic_dedup/sim_cluster_quality.
    val k = 8
    val present = emb.filter($"vec_id" < k).select("vec_id")
      .as[Long].collect().toSet
    assert(present == (0L until k).toSet,
      s"ids below $k present: ${present.toSeq.sorted}")
  }

  test("IVF quantized rerank: recall matches plain IVF; approx scores faithful") {
    val q = emb.filter($"vec_id" < 20)
    val cells = Similarity.centroids(emb, "label")
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.ivfQuantizedTopK(q, emb, cells, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val plain = Similarity.ivfTopK(q, emb, cells, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rQuant = (exact & quant).size.toDouble / exact.size
    val rPlain = (exact & plain).size.toDouble / exact.size
    assert(rQuant >= rPlain - 0.1, s"quantized recall $rQuant vs plain $rPlain")
    // the reported scores are the EXACT fp32 cosines of the reranked rows
    val drift = Similarity.ivfQuantizedTopK(q, emb, cells, k = 5, nprobe = 4)
      .join(emb.select($"vec_id".as("query_id"), $"embedding".as("qe")), "query_id")
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne")), "neighbor_id")
      .select(max(abs($"cos" - Similarity.cosine($"qe", $"ne")))).as[Double].head()
    assert(drift < 1e-12, s"rerank must report exact cosine, drift=$drift")
  }

  test("k-means: objective improves, deterministic, ivf over learned cells works") {
    val emb2 = graft.sources.Tables.embeddings(spark, sf001)
    // mean cosine of each vector to its assigned centroid must not
    // decrease as Lloyd's iterations proceed (cosine-objective ascent)
    def objective(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(emb2, k = 8, iters = iters)
        .orderBy("cell").as[(Int, Seq[Double])].collect().map(_._2.toArray)
      Similarity.assignCells(emb2, cents)
        .withColumn("c", element_at(
          typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1))
        .select(avg(Similarity.cosine($"embedding", $"c"))).as[Double].head()
    }
    val o0 = objective(0); val o2 = objective(2); val o4 = objective(4)
    assert(o2 >= o0 - 1e-9 && o4 >= o2 - 1e-9, s"objective $o0 -> $o2 -> $o4")
    // deterministic across runs
    val a = Similarity.kmeansCentroids(emb2, 8, 2).orderBy("cell")
      .as[(Int, Seq[Double])].collect().toSeq
    val b = Similarity.kmeansCentroids(emb2, 8, 2).orderBy("cell")
      .as[(Int, Seq[Double])].collect().toSeq
    assert(a == b)
    // learned-cell IVF keeps reasonable recall vs brute force at nprobe=4/8
    val q = emb2.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb2, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb2,
      Similarity.kmeansCentroids(emb2, 8, 3), k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("native hyperplane_sigs matches the Column-API form per table") {
    // table t of the native batch expression must equal the Column form
    // seeded 7+t — same Gaussian draws, same sequential double dots
    val tables = 5
    val native = emb.select($"vec_id",
      graft.plans.HyperplaneSigs($"embedding", 64, planes = 4, tables = tables).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    for (t <- 0 until tables) {
      val col = emb.select($"vec_id",
        Similarity.hyperplaneSignature($"embedding", 64, planes = 4, seed = 7L + t).as("s"))
        .as[(Long, Long)].collect().toMap
      assert(col.forall { case (id, s) => native(id)(t) == s }, s"table $t")
    }
    // dimension mismatch fails loudly, like the Column form's guard
    val err = intercept[Exception] {
      emb.select(graft.plans.HyperplaneSigs(
        slice($"embedding", 1, 10), 64, 4, 2)).collect()
    }
    assert(err.getMessage != null)
  }

  test("hyperplane signature buckets are stable and bounded") {
    val sigs = emb.select(
      Similarity.hyperplaneSignature($"embedding", 64, planes = 8).as("s"))
    val mm = sigs.agg(min("s"), max("s")).as[(Long, Long)].head()
    assert(mm._1 >= 0L && mm._2 < 256L)
    // deterministic across evaluations
    val a = sigs.as[Long].collect().toSeq
    val b = sigs.as[Long].collect().toSeq
    assert(a == b)
  }

  test("cluster quality: counts partition the corpus, means bounded, partition-independent") {
    val seeds = Similarity.seedCentroids(emb, 8)
    val a = Similarity.clusterQuality(emb, seeds)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a.map(_._2).sum == emb.count(), "every vector lands in exactly one cell")
    assert(a.forall { case (_, _, m) => m >= -1.0 && m <= 1.0 })
    // exact-decimal mean: identical at any parallelism
    val b = Similarity.clusterQuality(emb.repartition(13), seeds)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("semantic near-dups accept a learned centroid matrix (balanced-cells path)") {
    val sub = emb.filter($"vec_id" < 300)
    val learned = Similarity.kmeansCentroids(sub, k = 6, iters = 2)
      .orderBy("cell").select($"centroid".cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val got = Similarity.semanticNearDups(sub, k = 6, topPairs = 15,
      centroids = Some(learned))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 15)
    assert(got.forall { case (a, b, c) => a < b && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    // deterministic: same matrix, same pairs
    val again = Similarity.semanticNearDups(sub, k = 6, topPairs = 15,
      centroids = Some(learned))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == again)
  }

  test("triangle split is invisible: forced max split ≡ no split, bitwise") {
    // targetBlockRows=1 forces every block into per-row sub-groups (the
    // most aggressive split possible); a huge target disables splitting
    // entirely. The pair set, scores, and the top-k cut must be
    // BIT-IDENTICAL — the split only redistributes work across tasks
    val sub = emb.filter($"vec_id" < 400)
    val unsplit = Similarity.cosineNearDupsBlocked(sub, Seq("label"),
      topPairs = 25, targetBlockRows = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSeq
    val split = Similarity.cosineNearDupsBlocked(sub, Seq("label"),
      topPairs = 25, targetBlockRows = 1)
      .as[(Long, Long, Double)].collect().toSeq
    val mid = Similarity.cosineNearDupsBlocked(sub, Seq("label"),
      topPairs = 25, targetBlockRows = 7)
      .as[(Long, Long, Double)].collect().toSeq
    assert(unsplit.size == 25)
    assert(split == unsplit)
    assert(mid == unsplit)
  }

  test("CosTopPairs kernel ≡ join form, bitwise, across split factors") {
    val sub = emb.filter($"vec_id" < 400)
    for (target <- Seq(Int.MaxValue, 7, 1)) {
      val join = Similarity.cosineNearDupsBlocked(sub, Seq("label"),
        topPairs = 25, targetBlockRows = target)
        .as[(Long, Long, Double)].collect().toSeq
      val kern = Similarity.cosineNearDupsBlocked(sub, Seq("label"),
        topPairs = 25, targetBlockRows = target, kernel = true)
        .as[(Long, Long, Double)].collect().toSeq
      assert(kern == join, s"target=$target")
    }
  }

  test("CosTopPairs kernel matches join form on degenerate vectors") {
    // zero vectors (cos null), a null element, a length-mismatched
    // vector, and too few valid pairs to fill k — the NULLS LAST
    // padding parity path
    val rows: Seq[(Long, Int, Array[java.lang.Float])] = Seq(
      (1L, 0, Array[java.lang.Float](1f, 2f, 3f)),
      (2L, 0, Array[java.lang.Float](0f, 0f, 0f)),        // zero norm
      (3L, 0, Array[java.lang.Float](1f, null, 3f)),      // null element
      (4L, 0, Array[java.lang.Float](2f, 4f)),            // length mismatch
      (5L, 0, Array[java.lang.Float](3f, 2f, 1f)),
      (6L, 1, Array[java.lang.Float](1f, 1f, 1f)))
    val df = rows.toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    for (target <- Seq(Int.MaxValue, 2)) {
      val join = Similarity.cosineNearDupsBlocked(df, Seq("label"),
        topPairs = 10, targetBlockRows = target)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      val kern = Similarity.cosineNearDupsBlocked(df, Seq("label"),
        topPairs = 10, targetBlockRows = target, kernel = true)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      assert(kern == join, s"target=$target")
      assert(join.exists(_._3.isEmpty), "fixture must exercise null cos")
    }
  }

  test("semantic near-dups match a driver-side SemDeDup replay exactly") {
    val sub = emb.filter($"vec_id" < 300)
    val k = 6
    val got = Similarity.semanticNearDups(sub, k = k, topPairs = 15)
      .as[(Long, Long, Double)].collect().toSeq

    // plain-Scala ground truth with the engine's exact arithmetic order:
    // seeds normalized by inv-multiply, sequential dot folds, strict->
    // argmax (ties to the lowest cell)
    val rows = sub.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    def dotSeq(x: Array[Double], y: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < x.length) { acc += x(i) * y(i); i += 1 }
      acc
    }
    val normSeeds = rows.filter(_._1 < k).sortBy(_._1).map { case (_, c) =>
      val ss = dotSeq(c, c)
      val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
      c.map(_ * inv)
    }
    val cellOf = rows.map { case (id, v) =>
      var best = 0; var bestScore = Double.NegativeInfinity
      for (ci <- normSeeds.indices) {
        val s = dotSeq(v, normSeeds(ci))
        if (s > bestScore) { bestScore = s; best = ci }
      }
      id -> best
    }.toMap
    val expected = (for {
      (ida, va) <- rows; (idb, vb) <- rows
      if ida < idb && cellOf(ida) == cellOf(idb)
    } yield {
      val cos = dotSeq(va, vb) / (math.sqrt(dotSeq(va, va)) * math.sqrt(dotSeq(vb, vb)))
      (ida, idb, cos)
    }).sortBy { case (a, b, c) => (-c, a, b) }.take(15).toSeq

    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12, s"pair ${g._1},${g._2}")
    }
    // cluster scoping really prunes: pair space < all-pairs
    val nPairs = rows.length.toLong * (rows.length - 1) / 2
    val intraPairs = cellOf.values.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(intraPairs < nPairs, "clusters must partition the pair space")
  }

  test("groupOutliers flags the planted far vector first; zero-norm excluded") {
    import spark.implicits._
    val dim = 8
    // label 1: a tight cloud along +e1 with one ANTI-aligned plant and
    // one zero vector; label 2: a clean cloud (sanity group)
    def v(main: Float, jitter: Float): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(0) = main; a(1) = jitter; a
    }
    val rows =
      (0L until 20L).map(i => (i, 1, v(1.0f, 0.01f * i))) ++
        Seq((97L, 1, v(-1.0f, 0.0f)),            // the planted outlier
          (98L, 1, Array.fill(dim)(0.0f))) ++    // degenerate: excluded
        (200L until 210L).map(i => (i, 2, v(1.0f, 0.02f * (i - 200))))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.groupOutliers(df, topN = 3,
      groupCol = "label", idCol = "vec_id")
    // the anti-aligned plant is label 1's rank-1 outlier
    val first = got.filter(col("cell") === 1 && col("rank") === 1)
      .select("vec_id").as[Long].head()
    assert(first == 97L)
    // the zero vector never appears (NULL cosine filtered, not ranked)
    assert(got.filter(col("vec_id") === 98L).isEmpty)
    // exactly topN rows per group, ranks contiguous, cos ascending
    val perCell = got.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(perCell.values.forall(_ == 3))
    val l1 = got.filter(col("cell") === 1).orderBy("rank")
      .select("cos").as[Double].collect()
    assert(l1.sameElements(l1.sorted), "rank must follow ascending cosine")
    // scale shape: the per-group rank runs as a bounded heap
    assert(got.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
