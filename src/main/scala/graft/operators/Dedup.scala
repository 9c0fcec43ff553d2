package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale text deduplication operators, Spark-first.
  *
  * Scale design (100 TB): every pipeline is shingle-explode → map-side
  * hash → shuffle on a SMALL key (64-bit hash or band id), never on
  * document bodies. Candidate generation (LSH) reduces the quadratic
  * verify step to bucket-local pairs; exact verification joins only the
  * candidate set. Signatures are fixed-width (k longs), so memory per
  * row is bounded regardless of document size.
  */
object Dedup {

  /** distinct word n-grams per document: (id, gram). A doc with
    * size-n words yields size-n+1 grams; under n words, none.
    */
  def wordNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val words = split(col(textCol), "\\s+")
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("id"),
      explode(array_distinct(grams)).as("gram"))
      .filter(col("gram") =!= "")
  }

  /** (id, gh): distinct grams as 64-bit hashes — the join/shuffle
    * currency for the pair pipelines, generated in one pass by the
    * [[graft.functions.GramHashes]] expression (hash-equal to
    * xxhash64 over the gram strings). Shuffling and comparing 8-byte
    * longs instead of gram strings cuts shuffle volume ~3× on real
    * text; a cross-gram hash collision (P ≈ |grams|²/2⁶⁵) would
    * overcount one `common` by 1 — negligible against the integer
    * thresholds used here, and deterministic on fixed data.
    */
  private def gramHashes(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.GramHashes(col(textCol), n)).as("gh"))

  /** (id, nset): distinct-gram set sizes, map-side — the GramHashes
    * array is already distinct, so its length IS the set size; docs
    * with no grams drop exactly like a groupBy-count would drop them.
    */
  private def gramSetSizes(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      size(graft.functions.GramHashes(col(textCol), n))
        .cast("long").as("nset"))
      .filter(col("nset") > 0)

  /** Exact n-gram Jaccard similar pairs: every (a < b) with
    * |A∩B| / |A∪B| ≥ num/den, computed via a gram-join (shuffle key =
    * gram hash, never the text).
    *
    * SKEW GUARD: a gram present in K documents contributes K² rows to
    * the self-join — one boilerplate phrase shared by 10⁶ documents is
    * a job-killer at scale. `maxDocFreq > 0` drops grams with document
    * frequency above the cap BEFORE the join, and computes Jaccard
    * consistently over the filtered gram sets (sizes and intersections
    * both exclude capped grams). High-df grams carry almost no
    * similarity signal — they connect everything — so the capped
    * measure ranks near-duplicates the same way; 0 (the default) keeps
    * the exact measure for oracle comparison. The LSH path
    * ([[minhashLshPairs]]) remains the designated 100 TB route.
    */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, num: Int, den: Int, maxDocFreq: Int = 0): DataFrame = {
    val allGrams = gramHashes(docs, idCol, textCol, n)
    val grams =
      if (maxDocFreq <= 0) allGrams
      else {
        val rare = allGrams.groupBy("gh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
          .select("gh")
        allGrams.join(rare, "gh")
      }
    // set sizes: map-side when grams are uncapped; the df-capped
    // variant must count the FILTERED gram set, so it keeps the agg
    val sizes =
      if (maxDocFreq <= 0) gramSetSizes(docs, idCol, textCol, n)
      else grams.groupBy("id").agg(count(lit(1)).as("nset"))
    val a = grams.as("a")
    val b = grams.as("b")
    val common = a.join(b, col("a.gh") === col("b.gh") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("nset", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("nset", "nb"), "doc_b")
      // integer-exact threshold: common/(na+nb-common) >= num/den
      .filter(col("common") * den >= (col("na") + col("nb") -
        col("common")) * num)
      .select("doc_a", "doc_b", "common", "na", "nb")
  }

  /** SKEW GUARD for bucket-local self-joins: a bucket holding K rows
    * yields K² candidate pairs, so one degenerate bucket — boilerplate
    * documents sharing every band, or malformed rows concentrating in a
    * sentinel signature — turns the candidate stage quadratic at scale.
    * `maxBucketSize > 0` drops buckets above the cap BEFORE the
    * self-join. Near-duplicate recall inside a dropped bucket is lost
    * by design: a bucket that large is either boilerplate (pairs carry
    * no signal) or an attack on the hash family; the reference measure
    * is unchanged for every surviving bucket, and 0 (the default) keeps
    * exact parity with the oracle. The count aggregation shuffles on
    * the same key as the self-join, so AQE plans both from one exchange.
    */
  private[operators] def capBuckets(rows: DataFrame,
      keyCols: Seq[String], maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) rows
    else {
      val small = rows.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= maxBucketSize)
        .drop("__bsz")
      rows.join(small, keyCols)
    }

  /** MinHash signatures: k columns sig_0..sig_{k-1} per id, computed
    * in ONE map-side pass by [[graft.functions.MinHashSigs]] —
    * bit-identical to the former explode + groupBy(id) + k×min shape,
    * which shuffled one row per gram. No shuffle at any corpus size;
    * gram-less docs are dropped like the groupBy dropped them.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.MinHashSigs(col(textCol), n, k).as("__sigs"))
      .filter(col("__sigs").isNotNull)
      .select(col("id") +: (0 until k).map(i =>
        element_at(col("__sigs"), i + 1).as(s"sig_$i")): _*)

  /** MinHash+LSH near-dup candidate pairs verified by exact Jaccard.
    * bands × rowsPerBand must equal k. Probability a pair with true
    * Jaccard s becomes a candidate: 1-(1-s^rows)^bands.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      num: Int = 1, den: Int = 2, maxBucketSize: Int = 0): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)
    // band key = hash of the band's signature slice; explode to
    // (band_idx, band_key, id) and self-join bucket-locally
    val bandRows = capBuckets(sigs.select(col("id"),
      posexplode(array((0 until bands).map { bnd =>
        hash((bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
          .map(i => col(s"sig_$i")): _*)
      }: _*)).as(Seq("band_idx", "band_key"))),
      Seq("band_idx", "band_key"), maxBucketSize)
    val l = bandRows.as("l")
    val r = bandRows.as("r")
    val candidates = l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    // exact verify on candidates only (64-bit gram hashes, like
    // exactJaccardPairs); set sizes map-side from the gram-array length
    val grams = gramHashes(docs, idCol, textCol, n)
    val sizes = gramSetSizes(docs, idCol, textCol, n)
    val ga = grams.toDF("doc_a", "gram_a")
    val gb = grams.toDF("doc_b2", "gram_b")
    candidates
      .join(ga, Seq("doc_a"))
      .join(gb, col("doc_b") === col("doc_b2") &&
        col("gram_a") === col("gram_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("nset", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("nset", "nb"), "doc_b")
      .filter(col("common") * den >= (col("na") + col("nb") -
        col("common")) * num)
      .select("doc_a", "doc_b", "common", "na", "nb")
  }

  /** Near-duplicate CANONICALIZATION — the step that actually dedups a
    * corpus once pairs are known: connected components over the
    * similar-pair graph, labelling every document with the smallest id
    * in its component (`canonical`); keeping rows where
    * `doc_id = canonical` yields the deduplicated corpus.
    *
    * Iterative min-label propagation: each round every node adopts the
    * minimum label among itself and its neighbours, localCheckpoint'ed
    * so round N's plan never re-derives rounds 0..N-1, until a round
    * changes nothing. Rounds needed = component diameter — near-dup
    * clusters are shallow (boilerplate families, O(1)-ish). `maxRounds`
    * fails LOUDLY on adversarially long chains (a 10⁵-link path would
    * otherwise drive 10⁵ shuffle rounds); raising it is safe, but a
    * corpus that deep wants a star-contraction implementation instead.
    */
  def canonicalIds(docs: DataFrame, idCol: String,
      pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = docs.select(col(idCol).as("id"), col(idCol).as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"canonicalIds did not converge in $maxRounds rounds — " +
            "component diameter exceeds the cap; raise maxRounds or " +
            "use a star-contraction variant for chain-shaped graphs")
      rounds += 1
      val viaNbr = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min("lbl").as("nlbl"))
      val updated = labels.join(viaNbr, col("id") === col("src"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl")))
            .as("nextLbl"))
        .localCheckpoint(true)
      changed = updated.filter(col("nextLbl") < col("lbl")).count()
      labels = updated.select(col("id"), col("nextLbl").as("lbl"))
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("canonical"))
  }

  /** SimHash fingerprint as 4 × 16-bit band columns band_0..band_3:
    * bit j of band b is the sign of Σ_tokens (±1 per bit j of the
    * token's band-b sub-hash). Keeping the fingerprint banded (instead
    * of one 64-bit word) gives the LSH join its bucket key directly and
    * avoids 1<<63 signed-overflow asymmetries between engines.
    *
    * One pass, NO shuffle: [[graft.functions.SimHashBands]] tokenizes,
    * hashes, and majority-votes inside the projection — hash-identical
    * to the former explode(split) → md5-band columns → 64-sum groupBy
    * shape (which shuffled one row per TOKEN), with token-less docs
    * dropped like the groupBy dropped them. At 100 TB fingerprinting
    * is now a map-only scan; the banded candidate join is the
    * pipeline's only shuffle.
    */
  def simhashBands(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.SimHashBands(col(textCol)).as("__bands"))
      .filter(col("__bands").isNotNull)
      .select(col("id") +: (0 until 4).map(b =>
        element_at(col("__bands"), b + 1).as(s"band_$b")): _*)

  /** combined 64-bit SimHash (band_3 .. band_0 packed high-to-low). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    simhashBands(docs, idCol, textCol).select(col("id"),
      (0 until 4).map(b => shiftleft(col(s"band_$b"), b * 16))
        .reduceLeft(_ bitwiseOR _).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. The
    * band-rotation trick keeps this join bucket-local at scale: 4
    * 16-bit bands; a pair within distance ≤ 3 shares at least one
    * exact band (pigeonhole). Candidates are distinct (doc_a, doc_b)
    * keys only — fingerprints are re-joined after dedup so the shuffle
    * carries 16-byte rows, not repeated fingerprints.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 0): DataFrame = {
    val fp = simhashBands(docs, idCol, textCol)
    val banded = capBuckets(fp.select(col("id"),
      posexplode(array((0 until 4).map(b => col(s"band_$b")): _*))
        .as(Seq("band_idx", "band_key"))),
      Seq("band_idx", "band_key"), maxBucketSize)
    val l = banded.as("l")
    val r = banded.as("r")
    val cand = l.join(r, col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    val fa = fp.select(col("id").as("doc_a") +:
      (0 until 4).map(b => col(s"band_$b").as(s"a$b")): _*)
    val fb = fp.select(col("id").as("doc_b") +:
      (0 until 4).map(b => col(s"band_$b").as(s"b$b")): _*)
    cand.join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("dist", (0 until 4).map(b =>
        bit_count(col(s"a$b").bitwiseXOR(col(s"b$b"))).cast("long"))
        .reduceLeft(_ + _))
      .filter(col("dist") <= maxDist)
      .select("doc_a", "doc_b", "dist")
  }
}
