package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-pipeline operators: hash sampling,
  * train/val/test splitting, weighted source mixing, and the
  * quality-filter funnel — the bookkeeping layer of a training-data
  * pipeline.
  *
  * All decisions are pure map-side functions of a row's key: a
  * lexicographic comparison of an md5-hex prefix against a threshold
  * string. No RNG state, no shuffle, no driver coordination — so at
  * 100 TB the sample/split/mix stage is a codegen'd filter fused into
  * the scan (only the final small per-group aggregation exchanges
  * anything), and the decision for a given row is reproducible across
  * runs, partitionings, engines (DuckDB computes the identical md5 and
  * the identical byte-wise string compare), and cluster sizes —
  * re-running a 1000-executor job yields byte-identical corpus
  * membership, which is what makes ablations and incremental rebuilds
  * sound.
  *
  * Rate resolution is 1/65536 (a 4-hex-digit prefix). Salting the key
  * (`concat(salt, key)`) decorrelates independent sampling decisions
  * on the same corpus.
  */
object Pipeline {

  /** 4-lowercase-hex threshold for a keep-rate in [0, 1]; rows keep
    * when `md5prefix(key) < threshold`, so rate quantizes to
    * round(rate * 65536) / 65536.
    */
  def rateHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    val t = math.round(rate * 65536.0)
    if (t >= 65536) "g" // 'g' > 'f': keeps every prefix
    else f"$t%04x"
  }

  private def prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 4)

  /** deterministic keep-decision at `rate` for `key` (any expression;
    * cast to string before hashing so engines agree on bytes).
    */
  def hashKeep(key: Column, rate: Double): Column =
    prefix(key) < lit(rateHex(rate))

  /** Deterministic train/val/test assignment by hash range:
    * [0, train) → train, [train, train+val) → val, rest → test.
    * One scan, no shuffle until the (3-row) summary aggregation.
    */
  def sampleSplit(docs: DataFrame, idCol: String, trainRate: Double,
      valRate: Double): DataFrame = {
    require(trainRate + valRate <= 1.0, "train+val must be <= 1")
    val p = prefix(col(idCol))
    val split = when(p < lit(rateHex(trainRate)), "train")
      .when(p < lit(rateHex(trainRate + valRate)), "val")
      .otherwise("test")
    docs.withColumn("split", split)
      .groupBy("split")
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"))
      .orderBy("split")
  }

  /** Weighted source mixing: each source keeps a deterministic
    * hash-sample at its configured rate (sources absent from `weights`
    * keep everything). Emits the per-source funnel (total vs kept) —
    * the mix report every pipeline run logs. The keep decision salts
    * the id with the source name so the same document id draws
    * independent decisions under different sources.
    */
  def mixSources(docs: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    val keep = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(true)) { case (els, (src, rate)) =>
        when(col(sourceCol) === src,
          prefix(concat(lit(src), lit(":"), col(idCol)))
            < lit(rateHex(rate))).otherwise(els)
      }
    docs.groupBy(sourceCol)
      .agg(count(lit(1)).as("total"),
        sum(keep.cast("long")).as("kept"))
      .orderBy(sourceCol)
  }

  /** Sequence packing (concat-then-chunk): assign each document to a
    * fixed-token-budget training bin — the batching step that turns a
    * filtered corpus into model-ready context windows. Documents are
    * concatenated in `idCol` order WITHIN each `byCol` group (source,
    * shard, …) and chunked every `budget` tokens:
    * `bin = floor((running_sum − tokens) / budget)`, i.e. a document
    * starts the bin its first token falls into — the standard
    * concat-then-chunk packing (greedy first-fit needs a sequential
    * scan; chunking is what large pipelines actually run because it is
    * deterministic and parallel).
    *
    * 100 TB shape: packing is embarrassingly parallel across `byCol`
    * groups — ONE hash exchange on the group key, a sort, and a
    * running sum; no global order, no driver loop. Group counts are
    * corpus shards (thousands), so the window never sees a single
    * giant partition; skewed groups split further by salting the
    * group key upstream if a shard outgrows an executor.
    */
  def packSequences(docs: DataFrame, idCol: String, byCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(byCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    docs.select(col(idCol), col(byCol),
        tokensCol.cast("long").as("tokens"))
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens"))
          / lit(budget)))
  }

  /** Sliding-window document chunking: split each document's token
    * stream into windows of `chunkTokens` advancing by `stride`
    * (overlap = chunkTokens − stride) — the preparation stage for
    * embedding indexes and fixed-context training windows. A document
    * with n tokens yields `1 + ceil((n − chunkTokens) / stride)`
    * chunks (one when n ≤ chunkTokens); the final window simply runs
    * shorter rather than padding or dropping the tail.
    *
    * 100 TB shape: entirely per-document — tokenize once, `explode` a
    * chunk-index `sequence`, slice the token array per index. A narrow
    * map/generate with no shuffle at all; downstream consumers
    * aggregate or embed the chunk rows. Chunk counts stay integer-exact
    * (the ceil runs on longs), so external engines reproduce the
    * chunking bit-for-bit.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int,
      keepCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride ($stride) <= chunkTokens ($chunkTokens)")
    val toks = split(col(textCol), "\\s+")
    val n = size(toks).cast("long")
    // integer ceil: 1 + floor((n - chunk + stride - 1) / stride);
    // floor over doubles is exact here (token counts << 2^52)
    val nChunks = when(n <= chunkTokens, lit(1L)).otherwise(
      floor((n - chunkTokens + (stride - 1)) / lit(stride)) + 1L)
    docs
      .withColumn("__toks", toks)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks - 1L)))
      .select(col(idCol) +: keepCols.map(col) ++: Seq(col("chunk_id"),
        array_join(slice(col("__toks"),
          (col("chunk_id") * stride + 1L).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong),
          size(col("__toks")).cast("long") - col("chunk_id") * stride)
          .as("chunk_tokens")): _*)
  }

  /** Unicode text normalization — the canonicalization pass a corpus
    * runs BEFORE hashing, deduplicating, or tokenizing: NFC canonical
    * composition (web text arrives in both composed and decomposed
    * forms; un-normalized corpora under-deduplicate), control/format
    * characters (`\p{Cc}\p{Cf}`) replaced with spaces, whitespace runs
    * collapsed, ends trimmed. Returns the input frame with
    * `<textCol>_norm` added.
    *
    * 100 TB shape: pure map-side — one codegen'd [[graft.functions.NfcNormalize]]
    * node (already-NFC rows return the input buffer uncopied) and two
    * fused `regexp_replace`s inside whole-stage codegen; no shuffle, no
    * UDF. The regexes stay in the RE2 ∩ java.util.regex subset, so
    * external engines (DuckDB `nfc_normalize` + `regexp_replace`)
    * reproduce the normalization byte-for-byte — which is what lets a
    * mixed-engine pipeline share dedup hashes.
    */
  def normalizeText(docs: DataFrame, textCol: String): DataFrame = {
    val nfc = graft.functions.NfcNormalize(col(textCol))
    // controls/format chars → space FIRST, so the collapse pass only
    // ever sees plain spaces (java \s and RE2 \s differ on \x0B, which
    // is Cc and therefore already gone by then)
    val deCtrl = regexp_replace(nfc, "[\\p{Cc}\\p{Cf}]", " ")
    docs.withColumn(s"${textCol}_norm",
      trim(regexp_replace(deCtrl, "\\s+", " ")))
  }

  /** Token-bigram vocabulary: the corpus's `topK` most frequent
    * adjacent token pairs — the first merge-candidate table of a BPE
    * tokenizer build, and the probe corpus linters use for boilerplate
    * phrases. Ties break on the bigram string so the result is a total
    * order (reproducible across engines and partitionings).
    *
    * 100 TB shape: bigrams are generated per-document by a narrow
    * `transform(sequence)` over the token array (no self-join), the
    * count is a two-phase hash aggregate (map-side partials over ~8-byte
    * keys), and the top-K compiles to TakeOrderedAndProject — parallel
    * per-partition heaps, never a global sort. The only exchange is the
    * partial-aggregate shuffle on the bigram key.
    */
  /** one row per adjacent token pair ("w1 w2"), shared by
    * [[bigramVocab]] and [[bigramLogProbReport]] so the two cannot
    * silently diverge on tokenization — BOTH use the engine-wide
    * WordStats contract (single ASCII spaces, empties dropped), so a
    * vocabulary built by one is valid input to the other's scorer. Tokenizes ONCE in a projection
    * below the Generate: expressions referenced several times inside
    * explode() re-evaluate per reference (no CSE across a Generate),
    * and the split is the expensive term — measured 8x on the x100
    * corpus. array_remove drops the empty tokens split() keeps at the
    * text's edges (leading whitespace would otherwise fabricate an
    * ""+word pair, violating the engine-wide empties-dropped token
    * contract).
    */
  private def adjacentPairs(docs: DataFrame, textCol: String)
      : DataFrame = {
    val ws = col("__ws")
    val pairs = transform(
      sequence(lit(0), greatest(size(ws) - 2, lit(-1))),
      i => concat(element_at(ws, i + 1), lit(" "),
        element_at(ws, i + 2)))
    docs
      .select(array_remove(split(col(textCol), " "), "").as("__ws"))
      .select(explode(
        when(size(ws) >= 2, pairs).otherwise(array())).as("pair"))
  }

  def bigramVocab(docs: DataFrame, textCol: String, topK: Int)
      : DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    adjacentPairs(docs, textCol)
      .select(col("pair").as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topK)
  }

  /** CCNet-style unigram language-model quality report: score every
    * document by its tokens' log-probability under the corpus's own
    * top-`topV` unigram LM, flag documents whose per-token score falls
    * below `flagMlnPerToken` (fixed-point milli-micro-nats, 1e6 units
    * per nat — e.g. -3_900_000 ≈ -3.9 nats/token), and report per
    * `byCol` group: docs, tokens, summed score, flagged count. The
    * standard "looks nothing like the reference corpus" filter big
    * pipelines run next to the Gopher rules.
    *
    * The LM is QUANTIZED to integer milli-micro-nats at build time
    * ([[graft.functions.UnigramLogProb.mln]]), so scores and flags are
    * integer-exact: no float-summation-order divergence across
    * executors, partitionings, or engines. OOV tokens score ln(1) = 0
    * (the count-1 floor).
    *
    * 100 TB shape: pass 1 is a token-count aggregate (two-phase,
    * vocab-sized keys) from which the driver collects only the
    * `topV`-row vocabulary + one total — the same bounded collect the
    * ANN codebooks use; pass 2 scores map-side through ONE compiled
    * [[graft.functions.UnigramLogProb]] scan (the vocabulary rides
    * along as a plan reference object, i.e. a broadcast-sized
    * hashmap), and the report is a small per-group aggregate. No
    * token-level shuffle ever reaches pass 2.
    */
  def unigramLogProbReport(docs: DataFrame, textCol: String,
      byCol: String, topV: Int, flagMlnPerToken: Long): DataFrame = {
    import graft.functions.UnigramLogProb
    require(topV > 0, s"topV $topV must be positive")
    // intermediates live under __-prefixed names, so a pre-existing
    // words/score_mln document column is never silently overwritten;
    // the remaining hazard is byCol colliding with an OUTPUT column
    // (duplicate names in the report) — reject it loudly
    val uniReserved = Set("__words", "__score_mln",
      "n_docs", "tokens", "sum_score_mln", "flagged")
    require(!uniReserved.contains(byCol) && !uniReserved.contains(textCol),
      s"unigramLogProbReport reserves columns ${uniReserved.mkString(", ")}")
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    counts.persist()
    try {
      // sum over ZERO rows is NULL (empty/token-less corpus): treat as
      // an empty LM — every token is OOV, every score 0 — instead of
      // NPEing at plan-build
      val totalRow = counts.agg(sum(col("c"))).head()
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      val vocab = counts.orderBy(col("c").desc, col("tok"))
        .limit(topV).collect()
        .map(r => r.getString(0) -> UnigramLogProb.mln(r.getLong(1)))
        .toMap
      val mlnTotal = if (total == 0L) 0L else UnigramLogProb.mln(total)
      val st = UnigramLogProb(col(textCol), vocab)
      val score = st.getField("mln_sum") -
        st.getField("words") * lit(mlnTotal)
      // the per-group score sum runs in DECIMAL(38,0): per-token
      // magnitude reaches ~3e7 milli-micro-nats, so a group beyond
      // ~3e11 tokens (squarely inside the 100 TB regime) would wrap a
      // silent Long sum while the oracle's HUGEINT stays exact
      docs
        .withColumn("__words", st.getField("words"))
        .withColumn("__score_mln", score)
        .groupBy(byCol)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__words")).as("tokens"),
          sum(col("__score_mln").cast(
            org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sum_score_mln"),
          sum((col("__score_mln") <
            lit(flagMlnPerToken) * col("__words")).cast("long"))
            .as("flagged"))
        .orderBy(byCol)
    } finally counts.unpersist()
  }

  /** Deterministic training-shard assignment: permute the corpus into
    * a reproducible pseudo-random order (rank of `md5(salt || id)`)
    * and cut it into fixed-size shards — the final stage before a
    * training run, where data ORDER matters (curriculum effects,
    * resume points) and must be byte-reproducible across reruns,
    * engines, and cluster sizes. Returns one row per document:
    * (id, shard, pos_in_shard). Salting re-deals the permutation per
    * epoch without touching the data.
    *
    * 100 TB shape: a RANGE repartition on the hash plus
    * within-partition sorts (what every training-shard writer pays),
    * then the dense global rank via `zipWithIndex` — per-partition
    * counts prefix-summed over ONE RDD instance, so the range
    * boundaries the offsets were computed against are exactly the
    * boundaries the rank job reads (a cached-DataFrame variant can
    * silently re-sample different range bounds between the two jobs).
    * NO unpartitioned window: a naive `row_number() OVER (ORDER BY
    * hash)` funnels the corpus through one task — the exact
    * single-partition anti-pattern the `limit N` eviction path was
    * once flagged for. This is the repo's one deliberate RDD use
    * beside the multimodal codec init: a dense cross-partition index
    * is genuinely per-partition imperative logic.
    */
  def shuffleShards(docs: DataFrame, idCol: String, salt: String,
      shardSize: Long): DataFrame =
    shuffleShardsWithCleanup(docs, idCol, salt, shardSize)._1

  /** [[shuffleShards]] plus an explicit cache-release handle. The
    * assignment caches the fully sorted corpus (MEMORY_AND_DISK)
    * across `zipWithIndex`'s two jobs; `shuffleShards` leaves the
    * release to the ContextCleaner (freed when the result DataFrame's
    * lineage is collected), which is fine for a read-once epoch but
    * lets a multi-epoch caller that HOLDS results accumulate
    * full-corpus cached copies. Call `release()` as soon as the shard
    * assignment has been written/consumed; any later action on the
    * returned DataFrame recomputes the sort.
    */
  def shuffleShardsWithCleanup(docs: DataFrame, idCol: String,
      salt: String, shardSize: Long): (DataFrame, () => Unit) = {
    require(shardSize > 0, s"shardSize $shardSize must be positive")
    val spark = docs.sparkSession
    // the id keeps its ORIGINAL type (UUID strings are the common
    // corpus key; a silent long cast would NULL them out and collide
    // numeric strings like "01" and "1")
    // NULLS LAST on both sort legs: a NULL id (null-propagated md5)
    // must land where the oracle's default ORDER BY puts it, or every
    // rank shifts between engines
    val sorted = docs
      .select(col(idCol).as("id"),
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string")))
          .as("__k"))
      .repartitionByRange(col("__k").asc_nulls_last,
        col("id").asc_nulls_last)
      .sortWithinPartitions(col("__k").asc_nulls_last,
        col("id").asc_nulls_last)
      .select(col("id"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__rank", org.apache.spark.sql.types.LongType, nullable = false))
    // persist across zipWithIndex's TWO jobs (its partition-count job
    // plus the main read) so the corpus-wide sort is paid once; the
    // ContextCleaner unpersists when the lineage is collected
    val sortedRdd = sorted.rdd
    sortedRdd.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    val ranked = spark.createDataFrame(
      sortedRdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
    val out = ranked.select(col("id"),
      floor(col("__rank") / shardSize).cast("long").as("shard"),
      (col("__rank") % shardSize).as("pos_in_shard"))
    (out, () => { sortedRdd.unpersist(blocking = false); () })
  }

  /** Corpus snapshot diff — the bookkeeping pass behind INCREMENTAL
    * corpus rebuilds: compare two snapshots by document id and classify
    * every id as `added` (only in `after`), `removed` (only in
    * `before`), `changed` (both, text differs) or `unchanged`. Returns
    * one row per id: (id, status, chars) where `chars` is the
    * after-side length (before-side for removed docs), so callers audit
    * both counts and volume per class.
    *
    * 100 TB shape: each side reduces map-side to (id, md5(text),
    * length) — 32-byte digests shuffle, never text — then ONE
    * full-outer sort-merge join on the id (co-partitioned/bucketed
    * snapshots join without any shuffle at all). The digest, not the
    * text, decides `changed`, so the comparison is engine-reproducible
    * (DuckDB computes the identical md5) and the shuffle width is
    * independent of document size.
    *
    * PRECONDITION: `idCol` is unique within each snapshot — the id is
    * the join key, so a duplicated id fans out through the full-outer
    * join and double-counts docs/chars for its status. Snapshots are
    * the OUTPUT of a dedup stage in every intended pipeline position;
    * run [[exact dedup|graft.queries.AnalyticsExtras]] first if the
    * input may be dirty.
    */
  def corpusDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def digest(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"),
        md5(col(textCol)).as(s"${side}_h"),
        length(col(textCol)).cast("long").as(s"${side}_chars"))
    val old = digest(before, "old")
    val neu = digest(after, "new")
    // null-SAFE digest compare (<=>): a text changing to or from NULL
    // must classify as changed, not fall through a NULL =!= to
    // 'unchanged' and silently skip reprocessing
    val status = when(col("old_id").isNull, "added")
      .when(col("new_id").isNull, "removed")
      .when(col("old_h") <=> col("new_h"), "unchanged")
      .otherwise("changed")
    old.join(neu, col("old_id") === col("new_id"), "full_outer")
      .select(coalesce(col("new_id"), col("old_id")).as("id"),
        status.as("status"),
        coalesce(col("new_chars"), col("old_chars")).as("chars"))
  }

  /** Bigram conditional-LM quality report — the KenLM-shaped upgrade
    * of [[unigramLogProbReport]]: score every document by
    * Σ ln P(w2|w1) = Σ (ln c(w1 w2) − ln c(w1·)) under the corpus's
    * own top-`topV` bigram LM, both vocabularies QUANTIZED to integer
    * milli-micro-nats so scores and flags stay integer-exact across
    * engines and partitionings. OOV terms score ln(1) = 0
    * independently on each side (the count-1 floor). Flags documents
    * whose per-PAIR score falls below `flagMlnPerPair`.
    *
    * 100 TB shape: ONE corpus scan aggregates pair counts (two-phase,
    * pair-string keys); the left-token marginals derive from that
    * vocab-squared-bounded aggregate WITHOUT a second corpus pass
    * (`c(w1·) = Σ_pairs c(w1 w2)` grouped on the pair's left word).
    * The driver collects only the two `topV`-row vocabularies; pass 2
    * scores map-side through one compiled
    * [[graft.functions.BigramLogProb]] scan.
    */
  def bigramLogProbReport(docs: DataFrame, textCol: String,
      byCol: String, topV: Int, flagMlnPerPair: Long): DataFrame = {
    import graft.functions.{BigramLogProb, UnigramLogProb}
    require(topV > 0, s"topV $topV must be positive")
    // same collision contract as unigramLogProbReport: __-prefixed
    // intermediates never clobber document columns, and byCol may not
    // shadow an output column of the report itself
    val biReserved = Set("__pairs", "__score_mln",
      "n_docs", "pairs", "sum_score_mln", "flagged")
    require(!biReserved.contains(byCol) && !biReserved.contains(textCol),
      s"bigramLogProbReport reserves columns ${biReserved.mkString(", ")}")
    val pairCounts = adjacentPairs(docs, textCol)
      .groupBy("pair").agg(count(lit(1)).as("c"))
    pairCounts.persist()
    try {
      val pairVocab = pairCounts.orderBy(col("c").desc, col("pair"))
        .limit(topV).collect()
        .map(r => r.getString(0) -> UnigramLogProb.mln(r.getLong(1)))
        .toMap
      val leftCounts = pairCounts
        .groupBy(substring_index(col("pair"), " ", 1).as("left"))
        .agg(sum(col("c")).as("c"))
      // leftVocab must COVER every in-vocab pair's left word: a pair
      // scoring mln(c_pair) against a truncated-away marginal would
      // yield ln P > 0 (an impossible probability that REWARDS the
      // document). ONE bounded collect serves both needs (top-V lefts
      // ∪ every pair-vocab left) — the in-vocab lefts are known after
      // the pair collect, so the coverage probe unions into the top-V
      // query instead of running as a third sequential driver action;
      // duplicate lefts carry identical counts, so toMap dedup is
      // value-exact. Both legs stay bounded by topV.
      val pvLefts = pairVocab.keySet.map(_.split(" ", 2)(0)).toSeq
      val topLeftsQ = leftCounts
        .orderBy(col("c").desc, col("left")).limit(topV)
      val leftVocab =
        (if (pvLefts.isEmpty) topLeftsQ
         else topLeftsQ.unionAll(
           leftCounts.filter(col("left").isin(pvLefts: _*))))
          .collect()
          .map(r => r.getString(0) -> UnigramLogProb.mln(r.getLong(1)))
          .toMap
      val st = BigramLogProb(col(textCol), pairVocab, leftVocab)
      docs
        .withColumn("__pairs", st.getField("pairs"))
        .withColumn("__score_mln", st.getField("mln_sum"))
        .groupBy(byCol)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__pairs")).as("pairs"),
          sum(col("__score_mln").cast(
            org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sum_score_mln"),
          sum((col("__score_mln") <
            lit(flagMlnPerPair) * col("__pairs")).cast("long"))
            .as("flagged"))
        .orderBy(byCol)
    } finally pairCounts.unpersist()
  }

  /** Quality-filter funnel: per-document FIRST failing rule (ordered
    * CASE — a document dropped for length is not also counted under
    * language), survivors labelled `kept`. Rules are (name, predicate)
    * in funnel order; the output is the drop report (stage, docs,
    * chars) that corpus builds alarm on.
    */
  def qualityFunnel(docs: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    val stage = rules.reverse.foldLeft(lit("kept")) {
      case (els, (name, dropIf)) => when(dropIf, name).otherwise(els)
    }
    docs.withColumn("stage", stage)
      .groupBy("stage")
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"))
      .orderBy("stage")
  }
}
