package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    // near-duplicate of 1 (one word changed)
    (2L, "the quick brown fox jumps over the lazy cat near the river"),
    // exact duplicate of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river"),
    // unrelated
    (4L, "completely different content about spark catalyst planning"),
    (5L, "another unrelated document mentioning parquet shuffles only")
  ).toDF("doc_id", "text")

  test("wordNgrams counts") {
    val g = Dedup.wordNgrams(corpus, "doc_id", "text", 3)
    // doc 4: 7 words → 5 distinct trigrams
    assert(g.filter($"id" === 4).count() == 5)
  }

  test("exact jaccard finds planted near-dups only") {
    val pairs = Dedup
      .exactJaccardPairs(corpus, "doc_id", "text", 3, 1, 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // exact dup
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH finds the same planted dups") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs distance 0, near-dups small distance") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 3)
      .select($"doc_a", $"doc_b", $"dist").as[(Long, Long, Long)]
      .collect().toMap2
    assert(pairs((1L, 3L)) == 0L)
    assert(!pairs.contains((4L, 5L)))
  }

  implicit class Tuple3Ops(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("boilerplateFilter scores the common-gram share and flags the cut") {
    import spark.implicits._
    // "a b c" appears in docs 0-2 (df 3 ≥ 2 → common); every other
    // gram is unique; doc 3's repeated-token text collapses to ONE
    // distinct gram (GramHashes de-dups), none common
    val docs = Seq(
      (0L, "a b c d"), // grams {a b c, b c d}: 1 of 2 common
      (1L, "a b c e"),
      (2L, "a b c f"),
      (3L, "z z z z z")) // grams {z z z}: 0 of 1 common
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.boilerplateFilter(
        docs, "doc_id", "text", 3, minDf = 2L, maxFrac = 0.4)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.5, false), // 0.5 > 0.4: dropped as boilerplate
      (1L, 2L, 1L, 0.5, false),
      (2L, 2L, 1L, 0.5, false),
      (3L, 1L, 0L, 0.0, true)), got)
    // boundary is inclusive: frac == maxFrac keeps
    val edge = graft.operators.Dedup.boilerplateFilter(
        docs, "doc_id", "text", 3, minDf = 2L, maxFrac = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(edge.forall(_._5), edge.toSeq)
  }

  test("gram-df cap drops join-exploding grams, keeps planted dups") {
    // every doc shares one universal trigram ("shared boiler plate"),
    // which alone would connect all 2+k docs pairwise (K² join rows);
    // docs 1/2 additionally share their real content
    val skewed = (Seq(
      (1L, "shared boiler plate alpha beta gamma delta"),
      (2L, "shared boiler plate alpha beta gamma delta"),
      (3L, "shared boiler plate totally different text one"),
      (4L, "shared boiler plate other unrelated words two")) ++
      (5L to 40L).map(i =>
        (i, s"shared boiler plate unique$i filler$i content$i end$i")))
      .toDF("doc_id", "text")
    // uncapped: the universal gram inflates common counts everywhere
    val uncapped = Dedup
      .exactJaccardPairs(skewed, "doc_id", "text", 3, 1, 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    // capped at df≤4: the universal trigram (df=40) is excluded from
    // the join AND the set sizes; true dups survive on their content
    val capped = Dedup
      .exactJaccardPairs(skewed, "doc_id", "text", 3, 1, 2,
        maxDocFreq = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists(p => p._1 >= 5L && p._2 >= 5L),
      "filler docs must not pair once the universal gram is capped")
    // default (cap off) is unchanged — the oracle-compared behavior
    val default = Dedup
      .exactJaccardPairs(skewed, "doc_id", "text", 3, 1, 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(default == uncapped)
  }

  test("bucket cap drops degenerate LSH buckets, keeps disjoint dups") {
    // 60 identical boilerplate docs share EVERY band → each band bucket
    // holds all 60 and the candidate self-join is K² (the 100 TB
    // job-killer); two distinct near-dup docs live in their own buckets
    val skewed = ((1L to 60L).map(i =>
      (i, "same boilerplate text repeated in every single document")) ++
      Seq((900L, "one genuinely distinct pair of documents talking " +
          "about spark catalyst planning"),
        (901L, "one genuinely distinct pair of documents talking " +
          "about spark catalyst shuffles")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(skewed, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count(p => p._1 <= 60L) == 60 * 59 / 2)
    val capped = Dedup
      .minhashLshPairs(skewed, "doc_id", "text", maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 <= 60L && p._2 <= 60L),
      "over-cap boilerplate buckets must be dropped before the join")
    assert(capped.contains((900L, 901L)),
      "pairs in small buckets survive the cap")
    val cappedSim = Dedup
      .simhashPairs(skewed, "doc_id", "text", maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!cappedSim.exists(p => p._1 <= 60L && p._2 <= 60L))
  }

  test("canonicalIds labels every component with its min id") {
    // components: {1,2,3} (via 1-2, 2-3 chain), {4,5}, {6} isolated
    val nodes = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val canon = Dedup.canonicalIds(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
    // a longer chain exercises multiple propagation rounds
    val chain = (1L to 10L).map(i => (i, "x")).toDF("doc_id", "text")
    val chainPairs = (1L until 10L).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val canon2 = Dedup.canonicalIds(chain, "doc_id", chainPairs)
      .as[(Long, Long)].collect().toMap
    assert(canon2.values.forall(_ == 1L))
  }

  test("canonicalIds contracts a 1000-link chain in O(log n) rounds") {
    // label propagation needed diameter (=999) rounds here; the
    // large-star/small-star contraction must stay logarithmic, with
    // ONE Spark action per round (convergence is an Observation on
    // the checkpoint job, not a separate count()).
    val n = 1000L
    val chain = (1L to n).map(i => (i, "x")).toDF("doc_id", "text")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val idsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (canon, rounds) =
      Dedup.canonicalIdsWithRounds(chain, "doc_id", pairs)
    assert(rounds <= 20, s"chain of $n took $rounds rounds")
    val labels = canon.as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 1L),
      "every chain node must label to the component min")
    // superseded rounds are freed EAGERLY (CheckpointUtil digs the
    // backing RDD out of the checkpoint leaf), so after `rounds`
    // localCheckpoints only the final round's edge set may still hold
    // blocks — without the eager free this is O(rounds) entries until
    // the driver's next GC cycle
    // count only RDDs persisted BY THIS TEST (set difference, not a
    // size delta — the ContextCleaner may free other suites' RDDs
    // concurrently and skew a raw count)
    val live =
      (spark.sparkContext.getPersistentRDDs.keySet -- idsBefore).size
    assert(live <= 1,
      s"$live new persisted RDDs alive after $rounds checkpointed " +
        "rounds — superseded rounds are not being freed eagerly")
  }

  test("canonicalIds matches union-find on random graphs") {
    // star contraction vs a trusted O(α) union-find, 30 random graphs
    // (fixed seed): same component minimum for every node. Shapes the
    // chain/star specs don't cover — multi-component, cycles, dense
    // cores, self-loops, duplicate and reversed edges.
    val rnd = new scala.util.Random(42)
    (1 to 30).foreach { trial =>
      val n = 2 + rnd.nextInt(60)
      val m = rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r))
          r = parent(r) }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      // root-min per node: path-compress fully, then min over members
      val members = (1 to n).groupBy(find)
      val expect = members.flatMap { case (_, ms) =>
        val mn = ms.min.toLong; ms.map(_.toLong -> mn) }
      val docs = (1L to n.toLong).map(i => (i, "x"))
        .toDF("doc_id", "text")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toDF("doc_a", "doc_b")
      val got = Dedup.canonicalIds(docs, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("contaminatedDocs counts distinct shared n-grams per train doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown",
                                           // "quick brown fox" with b1
      (2L, "totally unrelated words here entirely"),
      (3L, "the quick brown fox jumps")    // same overlap as 1
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox sleeps"),
      (101L, "unseen benchmark content only")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(train, bench, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    // "the quick brown" + "quick brown fox" = 2 shared grams
    assert(out == Map(1L -> 2L, 3L -> 2L))
    // raising the floor drops the evidence-poor docs
    val strict = Dedup.contaminatedDocs(train, bench, "doc_id", "text",
      3, minShared = 3L)
    assert(strict.count() == 0)
  }

  test("CheckpointUtil finds the RDD behind a checkpoint leaf only") {
    import graft.plan.CheckpointUtil
    val df = Seq((1L, 2L)).toDF("a", "b")
    assert(CheckpointUtil.checkpointRdd(df.filter($"a" > 0)).isEmpty,
      "non-leaf plans must be left alone")
    val ck = df.localCheckpoint(true)
    val rdd = CheckpointUtil.checkpointRdd(ck)
    assert(rdd.isDefined, "LogicalRDD reflection broke — eager " +
      "checkpoint cleanup has silently degraded to GC-paced cleanup")
    // assert on THIS rdd's id, not the global persistent-RDD count —
    // the ContextCleaner may unpersist other suites' RDDs mid-test
    val id = rdd.get.id
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "the checkpoint's backing RDD should be persisted")
    CheckpointUtil.freeCheckpoint(ck)
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "freeCheckpoint should unpersist the backing RDD")
  }

  test("LSH recall matches exact jaccard on the real documents table") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val exact = Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 1, 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // LSH output is a subset (verified exactly) with high recall
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size * 8 / 10,
      s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("paragraphOccurrences keeps the first global occurrence by " +
      "(id, position) and drops empty paragraphs") {
    val docs = Seq(
      (3L, "s0", "dup para\nunique one"),
      (1L, "s1", "first para\ndup para\n\ndup para"),
      (2L, "s2", "dup para")).toDF("doc_id", "source", "text")
    val out = Dedup.paragraphOccurrences(docs, "doc_id", "text",
        keepCols = Seq("source"))
      .select($"id", $"para_idx", $"para", $"is_kept")
      .as[(Long, Int, String, Boolean)].collect().toSet
    assert(out == Set(
      // doc 1: both its paragraphs win ("dup para" first occurrence is
      // (1, 1) — the empty split between \n\n never appears)
      (1L, 0, "first para", true), (1L, 1, "dup para", true),
      (1L, 2, "dup para", false),
      (2L, 0, "dup para", false),
      (3L, 0, "dup para", false), (3L, 1, "unique one", true)))
  }

  test("paragraphOccurrences rebuilds deduplicated documents in " +
      "position order") {
    val docs = Seq(
      (1L, "a\nb"), (2L, "b\nc\na")).toDF("doc_id", "text")
    val rebuilt = Dedup.paragraphOccurrences(docs, "doc_id", "text")
      .filter($"is_kept")
      .groupBy($"id")
      .agg(concat_ws("\n", sort_array(
        collect_list(struct($"para_idx", $"para"))).getField("para"))
        .as("text"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt == Map(1L -> "a\nb", 2L -> "c"))
  }

  test("paragraphOccurrences matches a naive reference on 300 random " +
      "documents") {
    val rnd = new scala.util.Random(160815L)
    val paraPool = Vector("alpha beta", "gamma", "delta epsilon zeta",
      "eta", "theta iota")
    val docs = (1L to 300L).map { id =>
      val n = 1 + rnd.nextInt(4)
      (id, Seq.fill(n)(paraPool(rnd.nextInt(paraPool.size)))
        .mkString("\n"))
    }
    // naive winner rule: first (id, idx) per distinct paragraph —
    // iterating id-sorted docs in paragraph order, the first insert
    // into the map IS the minimum
    val expected = {
      val m = scala.collection.mutable.Map[String, (Long, Int)]()
      for ((id, text) <- docs.sortBy(_._1);
           (p, i) <- text.split("\n").zipWithIndex)
        if (!m.contains(p)) m(p) = (id, i)
      for ((id, text) <- docs; (p, i) <- text.split("\n").zipWithIndex)
        yield (id, i, p, m(p) == (id, i))
    }.toSet
    val got = Dedup.paragraphOccurrences(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .select($"id", $"para_idx", $"para", $"is_kept")
      .as[(Long, Int, String, Boolean)].collect().toSet
    assert(got == expected)
  }

  test("paragraphOccurrences rejects keepCols that collide with its " +
      "reserved output names") {
    val docs = Seq((1L, "a", "x")).toDF("doc_id", "text", "para")
    val e = intercept[IllegalArgumentException] {
      Dedup.paragraphOccurrences(docs, "doc_id", "text",
        keepCols = Seq("para"))
    }
    assert(e.getMessage.contains("para"))
  }

  test("paragraphOccurrences elects a non-null id as winner over a " +
      "NULL id (NULLS LAST, the DuckDB default ordering)") {
    // java boxing keeps the null id; doc 7 must win even though NULL
    // sorts FIRST under Spark's default asc
    val docs = Seq(
      (java.lang.Long.valueOf(7L), "dup para"),
      (null.asInstanceOf[java.lang.Long], "dup para"))
      .toDF("doc_id", "text")
    val kept = Dedup.paragraphOccurrences(docs, "doc_id", "text")
      .filter($"is_kept").select($"id")
      .as[Option[Long]].collect().toSeq
    assert(kept == Seq(Some(7L)))
  }

  test("paragraph winner decision is ONE hash exchange on the " +
      "paragraph, window partitioned by it (never a global sort)") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Dedup.paragraphOccurrences(
        docs.withColumn("t2", concat_ws("\n", $"text", $"text")),
        "doc_id", "t2", keepCols = Seq("source"))
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(para"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  // ---- substring-level dedup: maximal duplicated spans ----

  private val sharedPhrase =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tok
  private val spanCorpus = Seq(
    (10L, "srcA", s"u1 u2 $sharedPhrase u3"), // phrase at tokens 2..11
    (11L, "srcA", s"v1 $sharedPhrase v2 v3"), // phrase at tokens 1..10
    // 6-token phrase repeated WITHIN one doc (occurrences in the same
    // document count toward minOcc, like a suffix array would)
    (12L, "srcB", "p q r s t u w1 p q r s t u"),
    (13L, "srcB", "unique only words here now")
  ).toDF("doc_id", "source", "text")

  test("duplicatedSpans recovers the planted cross-document span " +
      "with exact token boundaries") {
    val spans = Dedup
      .duplicatedSpans(spanCorpus, "doc_id", "text", 3, 2L, 10L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only grams fully inside the shared 10-token phrase are
    // duplicated: doc 10 positions 2..9 (8 grams), doc 11 positions
    // 1..8 — each one island of span_tokens = 8 + 3 - 1 = 10
    assert(spans == Seq((10L, 2L, 8L, 10L), (11L, 1L, 8L, 10L)), spans)
  }

  test("duplicatedSpans counts same-document repetitions and splits " +
      "non-adjacent islands") {
    val spans = Dedup
      .duplicatedSpans(spanCorpus, "doc_id", "text", 3, 2L, 6L)
      .filter($"doc_id" === 12L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "p q r s t u" twice in doc 12: grams 0..3 and 7..10, separated
    // by the unique w1-straddling grams — two maximal 6-token spans
    assert(spans == Seq((12L, 0L, 4L, 6L), (12L, 7L, 4L, 6L)), spans)
  }

  test("dupGramFractionBySource counts gram positions once each") {
    val rows = Dedup
      .dupGramFractionBySource(spanCorpus, "doc_id", "text", "source",
        3, 2L)
      .as[(String, Long, Long, Double)].collect().toSeq
    // srcA: docs 10/11 have 11 grams each, 8 duplicated each;
    // srcB: doc 12 has 11 grams, 8 duplicated (4 per copy), doc 13
    // has 3 unique grams
    assert(rows == Seq(
      ("srcA", 22L, 16L, math.rint(16.0 / 22 * 1e4) / 1e4),
      ("srcB", 14L, 8L, math.rint(8.0 / 14 * 1e4) / 1e4)), rows)
  }

  test("applySpanCuts reports the surviving token budget per " +
      "affected doc and drops unaffected docs") {
    val cuts = Dedup
      .applySpanCuts(spanCorpus, "doc_id", "text", 3, 2L, 10L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // docs 10/11: 13 tokens each, one 10-token span → 3 survive;
    // docs 12/13 have no qualifying span (6 < 10) and are absent
    assert(cuts == Seq((10L, 13L, 10L, 3L), (11L, 13L, 10L, 3L)), cuts)
  }

  test("applySpanCuts counts overlapping adjacent span extents " +
      "once (union-exact)") {
    // doc 20: grams 0..3 duplicated (island tokens 0..5), gram 4
    // ("e f G") unique, grams 5..9 duplicated (island tokens 5..11) —
    // the two extents share token 5, so the union is ALL 12 tokens,
    // not 6 + 7 = 13
    val docs = Seq(
      (20L, "a b c d e f G h i j k l"),
      (21L, "a b c d e f"),
      (22L, "f G h i j k l")
    ).toDF("doc_id", "text")
    val cuts = Dedup.applySpanCuts(docs, "doc_id", "text", 3, 2L, 6L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cuts == Seq((20L, 12L, 12L, 0L), (21L, 6L, 6L, 0L),
      (22L, 7L, 7L, 0L)), cuts)
  }

  test("applySpanCuts is keyed by doc id end to end: no " +
      "single-partition window, no self-join, no position explode") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Dedup.applySpanCuts(docs, "doc_id", "text", 3, 2L, 10L)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(id"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("hashpartitioning(gh"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the union correction is the lag window, not an explode+distinct
    assert(!p.contains("Generate explode(sequence"), p)
  }

  test("duplicatedSpans island merge is window-partitioned by doc " +
      "id, never a global sort; no self-join anywhere") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Dedup.duplicatedSpans(docs, "doc_id", "text", 3, 2L, 10L)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(id"), p)
    assert(!p.contains("SinglePartition"), p)
    // the duplicated-gram set and the position join share the 8-byte
    // gram-hash shuffle key; no pairwise join anywhere
    assert(p.contains("hashpartitioning(gh"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
