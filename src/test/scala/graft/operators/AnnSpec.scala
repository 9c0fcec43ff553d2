package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite
    (4L, Array(0.7f, 0.7f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by similarity") {
    val top = Ann.cosineTopK(vecs, "embedding", "vec_id",
      Seq(1.0, 0.0, 0.0, 0.0), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(0L, 1L, 4L))
  }

  test("exact near-dup pairs at 0.95") {
    val pairs = Ann.exactNearDupPairs(vecs, "embedding", "vec_id", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH buckets preserve true near-dups") {
    val lsh = Ann.lshNearDupPairs(vecs, "embedding", "vec_id",
      nBits = 8, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // hyperplane LSH: vectors at cosine .995 collide on all 8 bits with
    // prob ~0.76; with this seed they do — and no false positives
    // survive the exact verify
    assert(lsh.subsetOf(Set((0L, 1L))))
  }

  test("LSH vs exact on the real embeddings table (loose threshold)") {
    val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val exact = Ann.exactNearDupPairs(e, "embedding", "vec_id", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshNearDupPairs(e, "embedding", "vec_id", 4, 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
  }

  test("banded LSH: subset of exact with multi-table recall boost") {
    val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val exact = Ann.exactNearDupPairs(e, "embedding", "vec_id", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // wide tables (4 bits): high recall, coarse buckets
    val wide = Ann.bandedLshNearDupPairs(e, "embedding", "vec_id",
        nTables = 8, bitsPerTable = 4, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide.subsetOf(exact))
    assert(wide.size * 2 >= exact.size,
      s"recall too low: ${wide.size}/${exact.size}")
    // sharp tables (8 bits, the query's params): strong pruning, lower
    // recall at this low threshold — still a non-empty exact subset
    val sharp = Ann.bandedLshNearDupPairs(e, "embedding", "vec_id",
        nTables = 8, bitsPerTable = 8, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sharp.subsetOf(exact))
    assert(sharp.nonEmpty)
  }

  test("IVF: seeds own their cells, probing prunes, recall holds") {
    val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val assigned = Ann.ivfAssign(e, "embedding", "vec_id", 8)
    // each seed centroid is distance 0 from itself
    val seedCells = assigned.filter($"vec_id" < 8)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    (0L until 8L).foreach(j => assert(seedCells(j) == j))
    // every row lands in exactly one of the 8 cells
    val cells = assigned.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    assert(cells.keySet.subsetOf((0L until 8L).toSet))
    assert(cells.values.sum == e.count())

    val q = e.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0)
    val exact = Ann.cosineTopK(e, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Ann.ivfTopK(e, "embedding", "vec_id", q,
      k = 8, nProbe = 3, topK = 10)
    val ivfIds = ivf.select("vec_id").as[Long].collect().toSet
    // 3-of-8 probing scans well under half the corpus here…
    val probedRows = assigned
      .filter($"cell".isin(ivf.select("cell").distinct()
        .as[Long].collect(): _*)).count()
    assert(probedRows < e.count() / 2,
      s"probe scanned $probedRows of ${e.count()} rows")
    // …and still recovers most of the exact top-10 (deterministic on
    // fixed data; the query vector's own cell is always probed)
    assert((ivfIds & exact).size >= 6,
      s"IVF recall too low: ${(ivfIds & exact).size}/10")
  }

  test("ragged embeddings and giant buckets are guarded at scale") {
    // 1k ragged rows would all land in the all-zero signature bucket
    // (10⁶ such rows at 100 TB → 10¹² candidate pairs); the size(emb)
    // pre-filter keeps them out of the join entirely — output is
    // unchanged because a ragged row's cosine is NULL and could never
    // pass the verify anyway
    val ragged = (100L to 1099L).map(i => (i, Array(1.0f, 2.0f)))
    val df = (vecs.as[(Long, Array[Float])].collect().toSeq ++ ragged)
      .toDF("vec_id", "embedding")
    val lsh = Ann.lshNearDupPairs(df, "embedding", "vec_id",
        nBits = 8, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!lsh.exists(p => p._1 >= 100L || p._2 >= 100L))
    assert(lsh.subsetOf(Set((0L, 1L))))

    // 500 identical embeddings: one bucket per table holds all of them
    // → K² candidates; the cap drops those buckets, a disjoint genuine
    // near-dup pair in its own bucket survives
    val same = (0L until 500L).map(i =>
      (i, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val pairDocs = Seq((9000L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (9001L, Array(0.0f, 0.99f, 0.1f, 0.0f)))
    val skewed = (same ++ pairDocs).toDF("vec_id", "embedding")
    val capped = Ann.bandedLshNearDupPairs(skewed, "embedding",
        "vec_id", nTables = 4, bitsPerTable = 8, threshold = 0.9,
        maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 < 9000L && p._2 < 9000L),
      "the degenerate identical-vector bucket must be dropped")
    assert(capped == Set((9000L, 9001L)),
      "small-bucket pairs survive the cap")
  }

  // ---- Lloyd refinement: planted clusters ----
  //
  // 4 planted clusters around e1..e4 (25 points each); the seed
  // codebook (k lowest ids) sits ENTIRELY inside cluster A, and cluster
  // B deliberately straddles two seed cells (its points jitter ±0.4
  // along e1, which flips the first-wins argmin between seed 0 and
  // seed 2). Probing ONE cell with the seed codebook therefore sees
  // only half of B; after Lloyd refinement the centroids migrate to
  // the cluster means and one probe recovers all of B. Everything is
  // deterministic (fixed data, fixed update rule), so the recall
  // numbers are stable.
  private def plantedClusters = {
    val a = Seq(
      (0L, Array(1.0f, 0.04f, 0.0f, 0.0f)),
      (1L, Array(1.1f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.95f, 0.0f, 0.04f, 0.0f)),
      (3L, Array(0.95f, 0.0f, 0.0f, 0.04f))) ++
      (4L to 24L).map(i =>
        (i, Array(1.0f + 0.002f * (i - 4), 0.0f, 0.0f, 0.0f)))
    val b = (25L to 49L).map { i =>
      val off = (i - 25).toInt
      val sign = if (off % 2 == 0) 1.0f else -1.0f
      (i, Array(sign * (0.4f + 0.002f * off), 1.0f, 0.0f, 0.0f))
    }
    val c = (50L to 74L).map(i =>
      (i, Array(0.0f, 0.0f, 1.0f + 0.002f * (i - 50), 0.0f)))
    val d = (75L to 99L).map(i =>
      (i, Array(0.0f, 0.0f, 0.0f, 1.0f + 0.002f * (i - 75))))
    (a ++ b ++ c ++ d).toDF("vec_id", "embedding")
  }

  test("lloydRefine: planted clusters — refined recall beats seed, " +
      "quantization error drops") {
    val df = plantedClusters
    val q = Seq(0.0, 1.0, 0.0, 0.0) // cluster B's centre
    val exact = Ann.cosineTopK(df, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet

    def recall(iters: Int): Int = {
      val ivf = Ann.ivfTopK(df, "embedding", "vec_id", q,
        k = 4, nProbe = 1, topK = 10, lloydIters = iters)
        .select("vec_id").as[Long].collect().toSet
      (ivf & exact).size
    }
    val seedRecall = recall(0)
    val refinedRecall = recall(5)
    assert(seedRecall <= 6,
      s"planted seed codebook should probe badly, got $seedRecall/10")
    assert(refinedRecall >= 9,
      s"refined codebook recall too low: $refinedRecall/10")
    assert(refinedRecall > seedRecall)

    // k-means objective (sum of squared distance to nearest centroid)
    // must not increase under assign→mean rounds; here it strictly drops
    val pts = df.select($"embedding".cast("array<double>"))
      .as[Array[Double]].collect()
    def qerr(cb: Array[Array[Double]]): Double =
      pts.map(p => cb.map(ct =>
        ct.indices.map(t => (ct(t) - p(t)) * (ct(t) - p(t))).sum)
        .min).sum
    val seedCb = Ann.centroidVectors(df, "embedding", "vec_id", 4)
    val refinedCb = Ann.lloydRefine(df, "embedding", seedCb, 5)
    assert(qerr(refinedCb) < qerr(seedCb))
  }

  test("lloydRefine: null-element rows are excluded from means; " +
      "empty seed rejected") {
    val df = plantedClusters
    val seedCb = Ann.centroidVectors(df, "embedding", "vec_id", 4)
    // a row whose NULL element would fall to the last cell's mean if
    // (wrongly) included: n inflates while sum skips the null — a ~%
    // level skew, far above the tolerance here
    val withNull = df.unionByName(spark.range(1).select(
      lit(999L).as("vec_id"),
      array(lit(0.1f), lit(null).cast("float"), lit(0.2f),
        lit(0.3f)).as("embedding")))
    val clean = Ann.lloydRefine(df, "embedding", seedCb, 3)
    val dirty = Ann.lloydRefine(withNull, "embedding", seedCb, 3)
    clean.zip(dirty).foreach { case (ct, dt) =>
      ct.indices.foreach(t =>
        assert(math.abs(ct(t) - dt(t)) < 1e-6,
          s"null-element row skewed a centroid: ${ct.toSeq} vs ${dt.toSeq}"))
    }
    assertThrows[IllegalArgumentException](
      Ann.lloydRefine(df, "embedding", Array.empty, 1))
  }

  test("PQ: seeds encode to their own codes; ADC ranks the query's " +
      "own vector first; recall overlaps exact top-k") {
    val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val (m, k) = (8, 16)
    // a seed row's subspace slices ARE codebook entries, so it must
    // encode to its own index in every subspace (distance 0; a
    // different code would mean the argmin or slicing is off-by-one)
    val codes = Ann.pqEncode(e, "embedding", "vec_id", m, k)
      .filter($"vec_id" < k)
      .as[(Long, Seq[Long])].collect().toMap
    (0L until k.toLong).foreach { c =>
      assert(codes(c) == Seq.fill(m)(c),
        s"seed $c encoded to ${codes(c)}")
    }
    // ADC against seed 0's own vector: distance exactly 0, rank 1
    val q = e.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0)
    val top = Ann.pqTopK(e, "embedding", "vec_id", q, m, k, 10)
      .as[(Long, Double)].collect()
    assert(top.head == (0L, 0.0), top.toSeq.toString)
    // quantized distance approximates SQUARED L2 (cosine ranks
    // differently on unnormalized vectors), so recall is judged
    // against the exact-L2 top-10, computed brute-force here
    val all = e.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val exact = all.map { case (id, v) =>
      id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val seedRecall = (top.map(_._1).toSet & exact).size
    assert(seedRecall >= 4, // deterministic on this fixture
      s"PQ seed recall dropped: $seedRecall/10")
    // per-subspace Lloyd refinement's contract is LOWER QUANTIZATION
    // SSE (k-means' objective is monotonically non-increasing from
    // ANY initialization) — single-query ADC recall is too noisy a
    // target, and this query is literally seed entry 0, which makes
    // seed books artificially favorable for it.
    def quantSse(books: Array[Array[Array[Double]]]): Double = {
      val sub = books.head.head.length
      all.map { case (_, v) =>
        (0 until m).map { j =>
          val slice = v.slice(j * sub, (j + 1) * sub)
          books(j).map(c =>
            slice.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          ).min
        }.sum
      }.sum
    }
    val seedBooks = Ann.pqCodebooks(e, "embedding", "vec_id", m, k)
    val refinedBooks = Ann.pqCodebooks(e, "embedding", "vec_id", m, k,
      lloydIters = 3)
    val (se, re) = (quantSse(seedBooks), quantSse(refinedBooks))
    assert(re < se,
      s"refined books did not reduce quantization SSE: $re >= $se")
  }

  test("IVF+PQ: prunes by cell first, then agrees with PQ on the " +
      "probed subset") {
    val e = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0)
    val got = Ann.ivfPqTopK(e, "embedding", "vec_id", q,
      kCoarse = 8, nProbe = 3, m = 8, k = 16, topK = 10)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 10)
    // every hit comes from a probed cell (≤ nProbe distinct cells)
    assert(got.map(_._2).distinct.length <= 3, got.toSeq.toString)
    // the query's own vector survives the composition at distance 0
    assert(got.head == (0L, 0L, 0.0))
    // within the probed cells the ranking IS the PQ ADC ranking:
    // re-rank those cells' rows by pqTopK over the full corpus and
    // drop the unprobed ones — same order
    val probedCells = got.map(_._2).toSet
    val assigned = Ann.ivfAssign(e, "embedding", "vec_id", 8)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val pqAll = Ann.pqTopK(e, "embedding", "vec_id", q, 8, 16,
        topK = Int.MaxValue)
      .as[(Long, Double)].collect()
    val expect = pqAll.filter { case (id, _) =>
      probedCells.contains(assigned(id)) }.take(10)
    assert(got.map(t => (t._1, t._3)).toSeq == expect.toSeq)
  }

  test("semanticDedupReport removes lower-id-duplicated vectors " +
      "within a cluster only") {
    val e = Seq(
      // cluster 0: 1 duplicates 0 (cos 1.0); 2 is orthogonal
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      // cluster 1: identical to vec 0 but in another cluster — never
      // paired (cluster-locality is the point of SemDeDup)
      (3L, 1, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      // cluster 2: 4, 5, 6 all colinear → ALL THREE pairs
      // (4,5),(4,6),(5,6) pass the threshold; removed = {5, 6}
      (4L, 2, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, 2, Array(0.0f, 0.0f, 3.0f, 0.0f)),
      (6L, 2, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Ann.semanticDedupReport(e, "embedding", "vec_id",
        "label", 0.95)
      .orderBy("cluster")
      .select("cluster", "n_vectors", "dup_pairs", "removed")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 3L, 1L, 1L), (1, 1L, 0L, 0L),
      (2, 3L, 3L, 2L)))
    // maxClusterSize: clusters over the cap keep their report row with
    // NULL dup stats (scan skipped — visibly, not a silent 0); at-cap
    // clusters scan normally
    val capped = Ann.semanticDedupReport(e, "embedding", "vec_id",
        "label", 0.95, maxClusterSize = 1)
      .orderBy("cluster")
      .select("cluster", "n_vectors", "dup_pairs", "removed")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(capped == Seq((0, 3L, -1L, -1L), (1, 1L, 0L, 0L),
      (2, 3L, -1L, -1L)))
  }

  test("multimodal demo media decodes REAL synthesized wav/mp4 " +
      "containers; raw-text payloads come back unknown") {
    val meta = Multimodal.decodeMeta(
      Multimodal.demoMedia(spark, sf("sf0.001")), "media_id", "payload")
    val byFormat = meta.groupBy("format").count().as[(String, Long)]
      .collect().toMap
    assert(byFormat.values.sum == 500L)
    assert(byFormat.keySet == Set("wav", "mp4", "unknown"))
    val cells = meta.collect().map(m => m.id -> m).toMap
    cells.values.foreach { m =>
      (m.id % 3) match {
        case 0 => // wav: real header parse, not fabrication
          assert(m.format == "wav" && m.sample_rate >= 8000 &&
            m.channels >= 1 && m.width == 0)
        case 1 =>
          assert(m.format == "mp4" && m.width >= 160 &&
            m.height >= 120 && m.n_bytes == 236L)
        case _ =>
          assert(m.format == "unknown" && m.width == 0 &&
            m.sample_rate == 0 && m.duration_ms == 0L)
      }
    }
  }

  test("wav/mp4 header parsers recover the exact synthesized fields; " +
      "corrupt payloads degrade to unknown, never fail the task") {
    import spark.implicits._
    val wav = Multimodal.synthWav(sampleRate = 44100, channels = 2,
      dataBytes = 44100 * 2 * 2) // exactly 1 s of 16-bit stereo
    val mp4 = Multimodal.synthMp4(width = 1920, height = 1080,
      durationMs = 123456L)
    // corrupt: a PNG signature over garbage makes the ImageIO plugin
    // reader throw a RuntimeException mid-header — must not propagate
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26,
      10) ++ Array.fill[Byte](16)(0x7f)
    val truncatedWav = wav.take(10)
    val rows = Seq((1L, wav), (2L, mp4), (3L, corrupt),
      (4L, truncatedWav))
    val meta = Multimodal.decodeMeta(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).format == "wav" && meta(1L).sample_rate == 44100 &&
      meta(1L).channels == 2 && meta(1L).duration_ms == 1000L &&
      meta(1L).n_bytes == wav.length.toLong)
    assert(meta(2L).format == "mp4" && meta(2L).width == 1920 &&
      meta(2L).height == 1080 && meta(2L).duration_ms == 123456L)
    assert(meta(3L).format == "unknown" && meta(3L).n_bytes ==
      corrupt.length.toLong)
    assert(meta(4L).format == "unknown")
  }

  test("multimodal decode reads REAL png/jpeg headers through the " +
      "Dataset path; unrecognised payloads come back unknown") {
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    val rows = Seq(
      (1L, imageBytes("png", 640, 480)),
      (2L, imageBytes("jpg", 31, 17)),
      (3L, "definitely not an image".getBytes("UTF-8")))
    val meta = Multimodal.decodeMeta(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 640 &&
      meta(1L).height == 480 && meta(1L).n_frames == 1)
    assert(meta(2L).format.startsWith("jp") && meta(2L).width == 31 &&
      meta(2L).height == 17)
    // no arm claims plain text → honest unknown, zeroed fields
    assert(meta(3L).format == "unknown")
    assert(meta(3L).n_bytes == rows(2)._2.length.toLong)
  }
}
