package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Dedup, Multimodal, Pipeline, Retrieval,
  Scrub}

/** Training-data pipeline operators (dedup / similarity / multimodal) as
  * driver-checkable queries. SQL-expressible ones carry DuckDB oracles;
  * the probabilistic/LSH ones are rows-only (their exactness is covered
  * by ScalaTest against planted duplicates + their exact twins here).
  *
  * Float-bearing oracles recompute cosine with the same left-to-right
  * double fold Spark's `aggregate` uses, so values agree bit-for-bit
  * before rounding.
  */
object LlmExtras {

  private def docs(s: SparkSession, dir: String) =
    Tables(s, dir, "documents")
  /** spread docs — for the gram/signature-heavy operators whose
    * results are partitioning-independent (see [[Tables.spread]]).
    */
  private def sdocs(s: SparkSession, dir: String) =
    Tables.spread(docs(s, dir))
  private def embs(s: SparkSession, dir: String) =
    Tables(s, dir, "embeddings")

  /** per-source mix rates: 1.0 / 0.5 / 0.25 / 0.1 by source index mod
    * 4 — the same rule the oracle SQL derives from the source name, so
    * the two cannot silently diverge.
    */
  private[queries] val mixWeights: Map[String, Double] =
    (0 until 20).map(i =>
      s"src$i" -> Seq(1.0, 0.5, 0.25, 0.1)(i % 4)).toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact n-gram Jaccard near-dup pairs (integer-exact threshold 1/2)
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.exactJaccardPairs(sdocs(s, dir), "doc_id", "text", 3, 1, 2)
        .orderBy("doc_a", "doc_b")),

    // MinHash+LSH candidates verified by exact Jaccard — the scale path
    // of dedup_ngram_jaccard. Oracled against the exact-pair SQL: the
    // verify stage is exact (output ⊆ exact pairs) and the banded
    // signatures are deterministic, with 100% recall on this fixture
    // (pinned by DedupSpec's recall test).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(sdocs(s, dir), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // near-dup canonicalization: connected components over the exact
    // Jaccard pair graph — every document labelled with the smallest
    // id in its component. The oracle computes the same components via
    // a recursive-CTE transitive closure, so the clustering itself is
    // hash-verified.
    "dedup_near_cluster" -> ((s, dir) =>
      Dedup.canonicalIds(docs(s, dir), "doc_id",
          Dedup.exactJaccardPairs(sdocs(s, dir), "doc_id", "text",
            3, 1, 2))
        .orderBy("doc_id")),

    // SimHash near-dups within Hamming distance 3. The md5-band hash
    // family is computable in DuckDB, so the oracle reproduces the
    // fingerprints bit-for-bit.
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(sdocs(s, dir), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // banded hyperplane LSH near-dup (the ANN scale path): candidates
    // from 8 tables × 8-bit signatures (256 buckets per table — ~5% of
    // random pairs survive as candidates vs a brute-force cross join),
    // exact cosine ≥ 0.4 verify. The oracle recomputes identical
    // signatures from the same inlined ±1 sign constants, so recall
    // never affects the comparison.
    "ann_lsh_near_dup" -> ((s, dir) =>
      Ann.bandedLshNearDupPairs(embs(s, dir), "embedding", "vec_id",
          nTables = 8, bitsPerTable = 8, threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos"))
        .orderBy("id_a", "id_b")),

    // brute-force cosine top-10 against vec_id=0's embedding
    "ann_cosine_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.cosineTopK(embs(s, dir), "embedding", "vec_id", q, 10)
        .select(col("vec_id"), round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    // IVF-style ANN top-10: coarse-quantize to 8 seeded cells, probe
    // the 3 nearest to the query, exact cosine inside them. The oracle
    // recomputes the same codebook, assignment CASE chain, and probe
    // ranking from the raw parquet floats, so the pruning itself is
    // verified — not just the final distances.
    "ann_ivf_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.ivfTopK(embs(s, dir), "embedding", "vec_id", q,
          k = 8, nProbe = 3, topK = 10)
        .select(col("vec_id"), col("cell"),
          round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    // product-quantization ANN: 8 subspaces × 16 codes (seed books),
    // asymmetric-distance top-10 — the compressed-scan axis of the ANN
    // trade-off space. The oracle recomputes books, per-subspace
    // argmin encoding, the query's distance table, AND the table-
    // lookup sum from the raw floats, so the whole compression path
    // is hash-verified.
    "ann_pq_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.pqTopK(embs(s, dir), "embedding", "vec_id", q,
        m = 8, k = 16, topK = 10)
    }),

    // IVF+PQ: coarse-probe 3 of 8 cells, PQ-ADC ranking within them —
    // the composed serving pipeline; the oracle replays every stage
    "ann_ivf_pq_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.ivfPqTopK(embs(s, dir), "embedding", "vec_id", q,
        kCoarse = 8, nProbe = 3, m = 8, k = 16, topK = 10)
    }),

    // embedding near-dup pairs (exact twin of the LSH path)
    "ann_near_dup" -> ((s, dir) =>
      Ann.exactNearDupPairs(Tables.spread(embs(s, dir)),
          "embedding", "vec_id", 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos"))
        .orderBy("id_a", "id_b")),

    // boilerplate survey: every 3-gram shared by ≥5 documents, with
    // its document frequency and lowest example doc. The gram hash
    // itself is engine-specific, so the driver compares the (df,
    // example_doc) multiset — identical iff both engines derived the
    // same gram sets; a pure minDf cut (no top-N) keeps the boundary
    // deterministic across engines when dfs tie.
    "text_boilerplate_grams" -> ((s, dir) =>
      Dedup.boilerplateGrams(docs(s, dir), "doc_id", "text", 3,
          minDf = 5L, topN = Int.MaxValue)
        .select(col("df"), col("example_doc"))
        .orderBy(col("df").desc, col("example_doc"))),

    // boilerplate-fraction filter: per-doc share of corpus-common
    // 3-grams (df ≥ 5) with the keep decision at ≤ 0.2 — the survey's
    // companion act; both sides of the cut are oracle-compared
    "text_boilerplate_filter" -> ((s, dir) =>
      Dedup.boilerplateFilter(docs(s, dir), "doc_id", "text", 3,
        minDf = 5L, maxFrac = 0.2)),

    // substring-level dedup: maximal duplicated spans (runs of token
    // positions whose 3-gram occurs ≥2 times corpus-wide) of ≥10
    // tokens — the ExactSubstr-style cut list at region granularity
    "dedup_duplicated_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(sdocs(s, dir), "doc_id", "text", 3,
        minOcc = 2L, minSpanTokens = 10L)),

    // per-source duplicated-gram mass: how much of each source's
    // token stream is globally repeated text
    "dedup_dup_fraction_by_source" -> ((s, dir) =>
      Dedup.dupGramFractionBySource(docs(s, dir), "doc_id", "text",
        "source", 3, minOcc = 2L)),

    // the APPLY act of the span cut list: per-doc surviving token
    // mass after removing every qualifying duplicated span
    // (union-exact — overlapping adjacent extents counted once)
    "dedup_apply_span_cuts" -> ((s, dir) =>
      Dedup.applySpanCuts(sdocs(s, dir), "doc_id", "text", 3,
        minOcc = 2L, minSpanTokens = 10L)),

    // BM25 top-20 retrieval for a fixed query-term bag — the
    // targeted-slice puller (seed-set expansion, eval-adjacent
    // mining); idf integer-quantized, scores engine-reproducible
    "text_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(docs(s, dir), "doc_id", "text", bm25Terms,
        k1 = 1.2, b = 0.75, topK = 20)),

    // per-doc token-distribution Shannon entropy — the diversity
    // axis of quality filtering, one compiled map-side scan
    "text_token_entropy" -> ((s, dir) =>
      Retrieval.tokenEntropy(docs(s, dir), "doc_id", "text")),

    // sequence packing: concat-then-chunk documents into 512-token
    // training bins within each source, parallel across sources
    "pipeline_pack_sequences" -> ((s, dir) =>
      Pipeline.packSequences(docs(s, dir), "doc_id", "source",
          size(split(col("text"), "\\s+")), 512L)
        .orderBy("source", "doc_id")),

    // benchmark decontamination: training docs (id % 50 ≠ 0) sharing
    // any 3-gram with the held-out eval slice (id % 50 = 0); the eval
    // gram set broadcasts, so the training side never shuffles grams
    "pipeline_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminatedDocs(
          d.filter(col("doc_id") % 50 =!= 0),
          d.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    // multimodal: binary payloads (REAL synthesized WAV/MP4 containers
    // + raw-text unknowns) → per-partition header decode → typed
    // metadata aggregation; the oracle reproduces every decoded field
    // from (doc_id, length(text)) because the synthesis is
    // deterministic (see Multimodal.demoMedia)
    "multimodal_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.demoMedia(s, dir), "media_id",
        "payload")
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("width_sum"),
          sum(col("height").cast("long")).as("height_sum"),
          sum("n_bytes").as("bytes_sum"),
          sum(col("sample_rate").cast("long")).as("sr_sum"),
          sum(col("channels").cast("long")).as("ch_sum"),
          sum("duration_ms").as("dur_ms_sum"))
        .orderBy("format")),

    // deterministic train/val/test split by md5-hex range — map-side
    // keep decision, reproducible across runs/partitionings/engines
    "pipeline_sample_split" -> ((s, dir) =>
      Pipeline.sampleSplit(docs(s, dir), "doc_id", 0.8, 0.1)),

    // weighted source mixing: per-source deterministic sample rates
    // (1.0 / 0.5 / 0.25 / 0.1 by source index mod 4), reported as the
    // per-source total-vs-kept funnel
    "pipeline_mix_sources" -> ((s, dir) =>
      Pipeline.mixSources(docs(s, dir), "source", "doc_id",
        mixWeights)),

    // quality-filter funnel: first-failing-rule attribution
    // (short → non-target language → too few tokens), survivors 'kept'
    "pipeline_quality_funnel" -> ((s, dir) =>
      Pipeline.qualityFunnel(docs(s, dir), Seq(
        "too_short" -> (col("n_chars") < 100),
        "lang_filter" -> !col("lang").isin("en", "de", "fr", "es"),
        "too_few_tokens" ->
          (size(split(col("text"), " ")) < 15)))),

    // PII/secret scrub report. The synthetic corpus carries no PII, so
    // the query plants a deterministic payload per document — an email
    // and an IPv4 on every doc, a 32-hex token on every third — with
    // the SAME concat expression the oracle builds, then audits the
    // scrub per source. The operator itself is general; the injection
    // is the fixture.
    "pipeline_pii_scrub" -> ((s, dir) => {
      val injected = docs(s, dir).withColumn("pii_text",
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10."),
          (col("doc_id") % 200).cast("string"), lit(".0.1"),
          when(col("doc_id") % 3 === 0,
            lit(" token 0123456789abcdef0123456789abcdef"))
            .otherwise(lit(""))))
      Scrub.report(injected, "pii_text", "source")
        .orderBy("source")
    }),

    // sliding-window chunking (64-token windows, stride 48 → 16-token
    // overlap) — the embedding-index / fixed-context prep stage. The
    // report hashes the chunking decisions themselves: chunk counts,
    // distinct chunk texts, token and char sums all shift if any
    // window boundary is off by one.
    "pipeline_chunk_documents" -> ((s, dir) =>
      Pipeline.chunkDocuments(docs(s, dir), "doc_id", "text", 64, 48,
          keepCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_text")).as("distinct_chunks"),
          sum(col("chunk_tokens")).as("sum_chunk_tokens"),
          sum(length(col("chunk_text"))).as("sum_chunk_chars"))
        .orderBy("source")),

    // paragraph-level exact dedup (the sub-document pass: boilerplate
    // repeats across pages that are NOT document-level duplicates).
    // The corpus is single-line, so the fixture first rebuilds each
    // document as 8-word paragraphs joined by \n with integer-exact
    // arithmetic both engines reproduce; the operator then keeps the
    // first global occurrence of each paragraph and the report audits
    // removal per source.
    "dedup_paragraph" -> ((s, dir) => {
      val ws = split(col("text"), "\\s+")
      val np = floor((size(ws) + 7) / lit(8.0)).cast("long")
      val paraDoc = array_join(
        transform(sequence(lit(0L), np - 1L),
          i => array_join(
            slice(ws, (i * 8 + 1).cast("int"), lit(8)), " ")), "\n")
      Dedup.paragraphOccurrences(
          sdocs(s, dir).withColumn("para_doc", paraDoc),
          "doc_id", "para_doc", "\\n", keepCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("paras_total"),
          sum(col("is_kept").cast("long")).as("paras_kept"),
          sum((!col("is_kept")).cast("long")).as("paras_removed"),
          sum(when(!col("is_kept"), length(col("para")))
            .otherwise(0L)).as("chars_removed"))
        .orderBy("source")
    }),

    // Unicode normalization audit: NFC + control strip + whitespace
    // collapse. The synthetic corpus is pure ASCII, so the fixture
    // appends a deterministic payload per doc_id%3 — decomposed
    // combining marks + a double space, a tab + a decomposed mark, and
    // an already-NFC clean tail — with the SAME literals the oracle
    // interpolates, then audits the normalization per source.
    "text_normalize" -> ((s, dir) => {
      val payload = element_at(
        array(normPayloads.map(lit): _*),
        (col("doc_id") % 3).cast("int") + 1)
      val injected = docs(s, dir)
        .withColumn("raw", concat(col("text"), payload))
      Pipeline.normalizeText(injected, "raw")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("raw_norm") =!= col("raw")).cast("long"))
            .as("docs_changed"),
          sum(length(col("raw"))).as("chars_before"),
          sum(length(col("raw_norm"))).as("chars_after"))
        .orderBy("source")
    }),

    // bigram conditional-LM quality report (the KenLM-shaped upgrade
    // of the unigram filter): per-source pair counts, integer-exact
    // summed ln P(w2|w1) score over quantized pair/left vocabularies,
    // and the count flagged below -3.44 nats/pair (this corpus's
    // ~5th-percentile tail). The oracle rebuilds both quantized
    // vocabularies from the same pair counts — including the
    // left-marginal derivation — so the conditional scoring itself is
    // hash-verified.
    "text_quality_bigram_logprob" -> ((s, dir) =>
      Pipeline.bigramLogProbReport(docs(s, dir), "text", "source",
        topV = 4096, flagMlnPerPair = -3440000L)),

    // token-bigram vocabulary: corpus-wide top-50 adjacent token pairs
    // (the first merge-candidate table of a BPE tokenizer build); ties
    // break on the bigram string so the top-K is a total order
    "text_bigram_vocab" -> ((s, dir) =>
      Pipeline.bigramVocab(docs(s, dir), "text", 50)),

    // normalize -> dedup composition: the reason the NFC stage exists.
    // The corpus has no exact-duplicate texts, so the fixture builds
    // them: every doc with a composed suffix, PLUS a decomposed-suffix
    // replica of every 10th doc (an encoding-variant duplicate — raw
    // dedup misses it, normalized dedup catches it) and an exact
    // composed replica of every 20th (a true byte duplicate both
    // catch). Both variants' dup-group stats are oracle-compared.
    "dedup_exact_normalized" -> ((s, dir) => {
      val d = docs(s, dir)
      def withSuffix(df: DataFrame, suffix: String) =
        df.select(concat(col("text"), lit(suffix)).as("raw"))
      val injected = withSuffix(d, normSuffixComposed)
        .unionAll(withSuffix(d.filter(col("doc_id") % 10 === 0),
          normSuffixDecomposed))
        .unionAll(withSuffix(d.filter(col("doc_id") % 20 === 0),
          normSuffixComposed))
      val norm = Pipeline.normalizeText(injected, "raw")
      def stats(c: String, label: String) = norm
        .groupBy(col(c)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(count(lit(1)).as("dup_groups"),
          coalesce(sum(col("n")), lit(0L)).as("dup_docs"))
        .select(lit(label).as("variant"),
          col("dup_groups"), col("dup_docs"))
      stats("raw", "raw").unionAll(stats("raw_norm", "normalized"))
        .orderBy("variant")
    }),

    // deterministic training-shard assignment: permute the corpus by
    // rank of md5(salt:id) and cut into 128-doc shards. The report
    // hashes the shard memberships themselves (sum of ids per shard
    // shifts if ANY document lands in a different shard), so the
    // global permutation order is oracle-verified end to end.
    "pipeline_shuffle_shards" -> ((s, dir) =>
      Pipeline.shuffleShards(docs(s, dir), "doc_id", "epoch0", 128L)
        .groupBy("shard")
        .agg(count(lit(1)).as("docs"), sum(col("id")).as("sum_id"),
          max(col("pos_in_shard")).as("max_pos"))
        .orderBy("shard")),

    // corpus snapshot diff (the incremental-rebuild bookkeeping): the
    // fixture derives snapshot B from the corpus deterministically —
    // every 17th doc removed, every remaining 13th mutated, a clone of
    // every 19th re-added under a disjoint id range — then classifies
    // ids per status. The md5 digests, join, and classification are
    // all oracle-replayed.
    "pipeline_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val after = d
        .filter(col("doc_id") % 17 =!= 0 && col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), col("text"))
        .unionAll(d.filter(col("doc_id") % 13 === 0 &&
            col("doc_id") % 17 =!= 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2"))
            .as("text")))
        .unionAll(d.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + (1L << 42)).as("doc_id"),
            col("text")))
      Pipeline.corpusDiff(d, after, "doc_id", "text")
        .groupBy("status")
        .agg(count(lit(1)).as("docs"), sum(col("chars")).as("chars"))
        .orderBy("status")
    }),

    // CCNet-style unigram-LM quality report: per-source doc/token
    // counts, integer-exact summed log-prob score (quantized
    // milli-micro-nats), and the count flagged below -3.42 nats/token
    // (the 5th-percentile tail of this corpus, so both sides of the
    // cut stay populated at every SF).
    // The oracle recomputes the quantized LM from the same counts, so
    // the scoring itself is hash-verified, not just the flags.
    "text_quality_logprob" -> ((s, dir) =>
      Pipeline.unigramLogProbReport(docs(s, dir), "text", "source",
        topV = 1024, flagMlnPerToken = -3420000L))
  )

  /** normalization-fixture payloads, index = doc_id % 3: decomposed
    * e+COMBINING ACUTE / i+COMBINING DIAERESIS with a double space; a
    * tab plus a decomposed mark; an already-NFC clean tail. Shared
    * literally with the oracle SQL so the two engines cannot diverge.
    */
  private[queries] val normPayloads = Seq(
    " cafe\u0301  nai\u0308ve",
    " caf\u00e9\tnai\u0308ve",
    " caf\u00e9 na\u00efve")

  /** the same suffix in NFC and NFD form \u2014 equal only after
    * normalization; shared literally with the dedup_exact_normalized
    * oracle.
    */
  private[queries] val normSuffixComposed = " caf\u00e9 na\u00efve"
  private[queries] val normSuffixDecomposed = " cafe\u0301 nai\u0308ve"

  /** shared gram/size/common CTEs (trigram shingles, 1/2 threshold) —
    * ONE definition feeding both the pair oracle and the clustering
    * oracle, so the constants cannot silently diverge.
    */
  private val jaccardCtes =
    """w AS (SELECT doc_id AS id,
               string_split_regex(text, '\s+') AS ws FROM documents),
         g AS (SELECT DISTINCT id,
                 ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
               FROM w, UNNEST(range(greatest(len(ws)-2, 0))) AS t(i)),
         s AS (SELECT id, count(*) AS nset FROM g GROUP BY id),
         c AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS common
               FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
               GROUP BY 1, 2)"""

  /** exact n-gram Jaccard pair SQL — also the oracle for the MinHash+
    * LSH path: its verify stage is exact, so output ⊆ exact pairs, and
    * recall is 100% on the fixture (deterministic signatures; pinned by
    * DedupSpec's recall test).
    */
  private val exactJaccardSql =
    s"""WITH $jaccardCtes
         SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
              CAST(sa.nset AS BIGINT) AS na, CAST(sb.nset AS BIGINT) AS nb
         FROM c JOIN s sa ON sa.id = doc_a JOIN s sb ON sb.id = doc_b
         WHERE 2 * common >= (sa.nset + sb.nset - common)
         ORDER BY doc_a, doc_b"""

  /** Generated SimHash oracle: reproduces the md5-band fingerprints of
    * [[Dedup.simhashBands]] bit-for-bit (64 bit-majority sums, 4 16-bit
    * bands), then the same band-bucket candidate join and Hamming
    * filter.
    */
  private def simhashSql: String = {
    val hCols = (0 until 4).map(b =>
      s"CAST('0x' || substr(md5(tok), ${1 + 4 * b}, 4) AS BIGINT) AS h$b")
      .mkString(",\n             ")
    val bitSums = (for { b <- 0 until 4; j <- 0 until 16 } yield
      s"sum(CASE WHEN ((h$b >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS s_${b}_$j")
      .mkString(",\n             ")
    val bandExprs = (0 until 4).map { b =>
      (0 until 16).map(j =>
        s"CASE WHEN s_${b}_$j > 0 THEN ${1L << j} ELSE 0 END")
        .mkString("(", " + ", s") AS band_$b")
    }.mkString(",\n             ")
    val bandUnion = (0 until 4).map(b =>
      s"SELECT id, $b AS band_idx, band_$b AS band_key FROM f")
      .mkString("\n             UNION ALL ")
    val distExpr = (0 until 4).map(b =>
      s"bit_count(xor(fa.band_$b, fb.band_$b))").mkString(" + ")
    s"""WITH t AS (SELECT doc_id AS id,
               unnest(string_split_regex(text, '\\s+')) AS tok
             FROM documents),
         tk AS (SELECT id,
             $hCols
           FROM t WHERE tok <> ''),
         s AS (SELECT id,
             $bitSums
           FROM tk GROUP BY id),
         f AS (SELECT id,
             $bandExprs
           FROM s),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT l.id AS doc_a, r.id AS doc_b
                  FROM bands l JOIN bands r
                  ON l.band_idx = r.band_idx AND l.band_key = r.band_key
                     AND l.id < r.id),
         d AS (SELECT doc_a, doc_b, CAST($distExpr AS BIGINT) AS dist
               FROM cand JOIN f fa ON fa.id = doc_a
                         JOIN f fb ON fb.id = doc_b)
         SELECT doc_a, doc_b, dist FROM d WHERE dist <= 3
         ORDER BY doc_a, doc_b"""
  }

  /** Generated banded-hyperplane-LSH oracle: identical ±1 sign
    * constants (from [[Ann.planeSign]]) inlined as list literals;
    * list_sum folds left-to-right like Spark's reduceLeft, so sign
    * decisions agree bit-for-bit. dim=64 matches the testdata
    * embeddings at every SF.
    */
  private def annLshSql(nTables: Int, bitsPerTable: Int, dim: Int,
      threshold: Double): String = {
    val signLists = (0 until nTables).flatMap { t =>
      (0 until bitsPerTable).map { p =>
        val plane = t * bitsPerTable + p
        (0 until dim).map(d => Ann.planeSign(plane, d))
          .mkString(s"[", ",", s"] AS sg_${t}_$p")
      }
    }.mkString(",\n             ")
    val sigDefs = (0 until nTables).map { t =>
      (0 until bitsPerTable).map { p =>
        s"""(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
           i -> CAST(embedding[i] AS DOUBLE) * sg_${t}_$p[i])) > 0
           THEN ${1L << p} ELSE 0 END)"""
      }.mkString("(", " + ", s") AS sig_$t")
    }.mkString(",\n             ")
    val sigUnion = (0 until nTables).map(t =>
      s"SELECT vec_id, $t AS ti, sig_$t AS sv FROM sig")
      .mkString("\n             UNION ALL ")
    def l2(col: String) =
      s"""sqrt(list_sum(list_transform(range(1, ${dim + 1}),
         i -> CAST($col[i] AS DOUBLE) * CAST($col[i] AS DOUBLE))))"""
    s"""WITH signs AS (SELECT
             $signLists),
         sig AS (SELECT vec_id,
             $sigDefs
           FROM embeddings, signs),
         bands AS ($sigUnion),
         cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
                  FROM bands l JOIN bands r
                  ON l.ti = r.ti AND l.sv = r.sv
                     AND l.vec_id < r.vec_id),
         p AS (SELECT id_a, id_b,
                 list_sum(list_transform(range(1, ${dim + 1}),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                        * CAST(b.embedding[i] AS DOUBLE)))
                 / (${l2("a.embedding")} * ${l2("b.embedding")}) AS cos
               FROM cand JOIN embeddings a ON a.vec_id = id_a
                         JOIN embeddings b ON b.vec_id = id_b)
         SELECT id_a, id_b, round(cos, 5) AS cos FROM p
         WHERE cos >= $threshold ORDER BY id_a, id_b"""
  }

  /** Generated IVF oracle: same seed codebook (embeddings of the k
    * smallest ids, via ORDER BY vec_id LIMIT 1 OFFSET j — no density
    * assumption), same squared-L2 ascending fold, the same first-wins
    * argmin CASE chain, and the same (distance, cell) probe ranking —
    * every stage of the pruning is recomputed from the raw floats, so
    * a wrong assignment or probe set fails the hash compare.
    */
  private def annIvfSql(k: Int, dim: Int, nProbe: Int,
      topK: Int): String = {
    // same codebook filter as Ann.centroidVectors: the k smallest ids
    // with non-null, full-dimension embeddings
    val ceDefs = (0 until k).map(j =>
      s"""(SELECT embedding FROM embeddings
         WHERE embedding IS NOT NULL AND len(embedding) = $dim
         ORDER BY vec_id LIMIT 1 OFFSET $j) AS ce$j""")
      .mkString(",\n             ")
    def sqd(e: String, c: String) =
      s"""list_sum(list_transform(range(1, ${dim + 1}),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
              * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    val dDefs = (0 until k).map(j =>
      s"${sqd("e.embedding", s"ce$j")} AS d$j")
      .mkString(",\n             ")
    val caseChain = (0 until k - 1).map { j =>
      val conds = (j + 1 until k).map(m => s"d$j <= d$m")
        .mkString(" AND ")
      s"WHEN $conds THEN $j"
    }.mkString("CASE ", "\n             ", s" ELSE ${k - 1} END")
    val qdUnion = (0 until k).map(j =>
      s"SELECT $j AS cid, ${sqd("qe", s"ce$j")} AS qdist FROM q, ce")
      .mkString("\n             UNION ALL ")
    def l2(col: String) =
      s"""sqrt(list_sum(list_transform(range(1, ${dim + 1}),
         i -> CAST($col[i] AS DOUBLE) * CAST($col[i] AS DOUBLE))))"""
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
         ce AS (SELECT
             $ceDefs),
         d AS (SELECT e.vec_id, e.embedding,
             $dDefs
           FROM embeddings e, ce),
         a AS (SELECT vec_id, embedding,
             $caseChain AS cell
           FROM d),
         qd AS ($qdUnion),
         probe AS (SELECT cid FROM qd ORDER BY qdist, cid
                   LIMIT $nProbe),
         scored AS (SELECT a.vec_id, a.cell,
             list_sum(list_transform(range(1, ${dim + 1}),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(qe[i] AS DOUBLE)))
             / (${l2("a.embedding")} * ${l2("qe")}) AS cos
           FROM a, q WHERE a.cell IN (SELECT cid FROM probe)),
         top AS (SELECT vec_id, cell, cos FROM scored
                 ORDER BY cos DESC, vec_id LIMIT $topK)
         SELECT vec_id, CAST(cell AS BIGINT) AS cell,
           round(cos, 5) AS cos
         FROM top"""
  }

  /** Generated PQ-ADC oracle: same seed codebooks as [[annIvfSql]]'s
    * (k lowest-id well-formed embeddings), per-subspace squared-L2
    * over the index window j·sub+1 .. (j+1)·sub (DuckDB's sequential
    * list_sum fold = SqDists' ascending accumulate on the slice), the
    * same first-wins argmin CASE per subspace, the query's m×k
    * distance table from the same arithmetic, and the final
    * table-lookup sum left-associated like Spark's `+` reduce.
    */
  private def annPqSql(m: Int, k: Int, dim: Int, topK: Int): String = {
    val sub = dim / m
    val ceDefs = (0 until k).map(j =>
      s"""(SELECT embedding FROM embeddings
         WHERE embedding IS NOT NULL AND len(embedding) = $dim
         ORDER BY vec_id LIMIT 1 OFFSET $j) AS ce$j""")
      .mkString(",\n             ")
    // squared L2 between expr arrays over subspace j's index window
    def sqd(j: Int, e: String, c: String) =
      s"""list_sum(list_transform(range(${j * sub + 1},
         ${(j + 1) * sub + 1}),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
              * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    val dDefs = (for { j <- 0 until m; c <- 0 until k } yield
      s"${sqd(j, "e.embedding", s"ce$c")} AS d_${j}_$c")
      .mkString(",\n             ")
    def caseChain(j: Int) = (0 until k - 1).map { a =>
      val conds = (a + 1 until k).map(b => s"d_${j}_$a <= d_${j}_$b")
        .mkString(" AND ")
      s"WHEN $conds THEN $a"
    }.mkString("CASE ", "\n             ", s" ELSE ${k - 1} END")
    val codeDefs = (0 until m).map(j => s"${caseChain(j)} AS code_$j")
      .mkString(",\n             ")
    val qtDefs = (for { j <- 0 until m; c <- 0 until k } yield
      s"${sqd(j, "qe", s"ce$c")} AS t_${j}_$c")
      .mkString(",\n             ")
    val adist = (0 until m).map { j =>
      (0 until k).map(c => s"WHEN $c THEN t_${j}_$c")
        .mkString(s"(CASE a.code_$j ", " ", " END)")
    }.mkString(" + ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
         ce AS (SELECT
             $ceDefs),
         d AS (SELECT e.vec_id,
             $dDefs
           FROM embeddings e, ce),
         a AS (SELECT vec_id,
             $codeDefs
           FROM d),
         qt AS (SELECT
             $qtDefs
           FROM q, ce),
         scored AS (SELECT a.vec_id,
             round($adist, 5) AS adist
           FROM a, qt)
         SELECT vec_id, adist FROM scored
         ORDER BY adist, vec_id LIMIT $topK"""
  }

  /** Generated IVF+PQ oracle: [[annIvfSql]]'s coarse codebook,
    * assignment CASE chain and probe ranking composed with
    * [[annPqSql]]'s per-subspace encoding, distance table and lookup
    * sum — the full pruning-then-compressed-scan pipeline replayed
    * from the raw floats.
    */
  private def annIvfPqSql(kc: Int, nProbe: Int, m: Int, k: Int,
      dim: Int, topK: Int): String = {
    val sub = dim / m
    val ceDefs = (0 until math.max(kc, k)).map(j =>
      s"""(SELECT embedding FROM embeddings
         WHERE embedding IS NOT NULL AND len(embedding) = $dim
         ORDER BY vec_id LIMIT 1 OFFSET $j) AS ce$j""")
      .mkString(",\n             ")
    def sqdFull(e: String, c: String) =
      s"""list_sum(list_transform(range(1, ${dim + 1}),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
              * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    def sqdSub(j: Int, e: String, c: String) =
      s"""list_sum(list_transform(range(${j * sub + 1},
         ${(j + 1) * sub + 1}),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
              * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    val coarseDefs = (0 until kc).map(c =>
      s"${sqdFull("e.embedding", s"ce$c")} AS cd_$c")
      .mkString(",\n             ")
    val coarseCase = (0 until kc - 1).map { a =>
      val conds = (a + 1 until kc).map(b => s"cd_$a <= cd_$b")
        .mkString(" AND ")
      s"WHEN $conds THEN $a"
    }.mkString("CASE ", "\n             ", s" ELSE ${kc - 1} END")
    val qdUnion = (0 until kc).map(c =>
      s"SELECT $c AS cid, ${sqdFull("qe", s"ce$c")} AS qdist FROM q, ce")
      .mkString("\n             UNION ALL ")
    val subDefs = (for { j <- 0 until m; c <- 0 until k } yield
      s"${sqdSub(j, "e.embedding", s"ce$c")} AS d_${j}_$c")
      .mkString(",\n             ")
    def codeCase(j: Int) = (0 until k - 1).map { a =>
      val conds = (a + 1 until k).map(b => s"d_${j}_$a <= d_${j}_$b")
        .mkString(" AND ")
      s"WHEN $conds THEN $a"
    }.mkString("CASE ", "\n             ", s" ELSE ${k - 1} END")
    val codeDefs = (0 until m).map(j => s"${codeCase(j)} AS code_$j")
      .mkString(",\n             ")
    val qtDefs = (for { j <- 0 until m; c <- 0 until k } yield
      s"${sqdSub(j, "qe", s"ce$c")} AS t_${j}_$c")
      .mkString(",\n             ")
    val adist = (0 until m).map { j =>
      (0 until k).map(c => s"WHEN $c THEN t_${j}_$c")
        .mkString(s"(CASE a.code_$j ", " ", " END)")
    }.mkString(" + ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
         ce AS (SELECT
             $ceDefs),
         d AS (SELECT e.vec_id, e.embedding,
             $coarseDefs,
             $subDefs
           FROM embeddings e, ce),
         a AS (SELECT vec_id,
             $coarseCase AS cell,
             $codeDefs
           FROM d),
         qd AS ($qdUnion),
         probe AS (SELECT cid FROM qd ORDER BY qdist, cid
                   LIMIT $nProbe),
         qt AS (SELECT
             $qtDefs
           FROM q, ce),
         scored AS (SELECT a.vec_id, a.cell,
             round($adist, 5) AS adist
           FROM a, qt
           WHERE a.cell IN (SELECT cid FROM probe))
         SELECT vec_id, CAST(cell AS BIGINT) AS cell, adist
         FROM scored ORDER BY adist, vec_id LIMIT $topK"""
  }

  /** Near-dup clustering oracle: the exact-Jaccard pair graph (same
    * CTEs as [[exactJaccardSql]]) closed transitively with a recursive
    * CTE; canonical = min reachable id. Bidirectional edges make the
    * reachable-set minimum equal the connected-component minimum.
    */
  private val nearClusterSql =
    s"""WITH RECURSIVE $jaccardCtes,
         p AS (SELECT doc_a, doc_b FROM c
               JOIN s sa ON sa.id = doc_a JOIN s sb ON sb.id = doc_b
               WHERE 2 * common >= (sa.nset + sb.nset - common)),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
         SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical
         FROM reach GROUP BY id ORDER BY doc_id"""

  /** Decontamination oracle: same word-split + 3-gram CTEs as the
    * Jaccard family (the `w`/`g` CTEs of [[jaccardCtes]]), benchmark
    * slice = id % 50 = 0, joined on the gram STRING where Spark joins
    * on the 8-byte gram hash — so a hash collision would surface as a
    * count mismatch here.
    */
  private val decontaminateSql =
    s"""WITH $jaccardCtes,
         bg AS (SELECT DISTINCT gram FROM g WHERE id % 50 = 0)
         SELECT g.id AS doc_id, CAST(count(*) AS BIGINT) AS shared_grams
         FROM g JOIN bg USING (gram)
         WHERE g.id % 50 <> 0
         GROUP BY 1 ORDER BY doc_id"""

  /** Packing oracle: same whitespace tokenizer as text_token_count's
    * (proven engine-equal there), same running-sum chunk rule —
    * explicit DOUBLE division because DuckDB `/` and Spark `/` must
    * both be true division before the floor.
    */
  private val packSequencesSql =
    """WITH t AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
               AS tokens
           FROM documents)
       SELECT doc_id, source, tokens,
         CAST(FLOOR(CAST(SUM(tokens) OVER (PARTITION BY source
             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tokens
           AS DOUBLE) / 512) AS BIGINT) AS bin
       FROM t ORDER BY source, doc_id"""

  /** Boilerplate oracle: the shared w/g gram CTEs, df + example over
    * gram STRINGS (Spark groups the 8-byte hashes — a collision would
    * shift a df and fail the multiset compare).
    */
  private val boilerplateSql =
    s"""WITH $jaccardCtes,
         bp AS (SELECT gram, count(*) AS df, min(id) AS example_doc
                FROM g GROUP BY 1)
         SELECT CAST(df AS BIGINT) AS df, example_doc
         FROM bp WHERE df >= 5
         ORDER BY df DESC, example_doc"""

  /** Filter oracle: same w/g CTEs; common grams over gram STRINGS,
    * per-doc LEFT-JOIN count (cg is distinct so the join never fans
    * out), the fraction in DOUBLE on both engines (identical IEEE
    * division → identical ≤ comparison), rounded to 4 decimals for the
    * exported score only.
    */
  private val boilerplateFilterSql =
    s"""WITH $jaccardCtes,
         bp AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
         cg AS (SELECT gram FROM bp WHERE df >= 5),
         pd AS (SELECT g.id, CAST(count(*) AS BIGINT) AS nset,
                  CAST(count(cg.gram) AS BIGINT) AS ncommon
                FROM g LEFT JOIN cg USING (gram) GROUP BY 1)
         SELECT id AS doc_id, nset, ncommon,
           round(CAST(ncommon AS DOUBLE) / nset, 4) AS boiler_frac,
           (CAST(ncommon AS DOUBLE) / nset) <= 0.2 AS kept
         FROM pd ORDER BY doc_id"""

  /** positional 3-gram CTEs shared by the span-dedup oracles — the
    * [[jaccardCtes]] tokenization but keeping token POSITION and
    * MULTIPLICITY (no DISTINCT), mirroring Dedup.posGramHashes.
    */
  private val posGramCtes =
    """w AS (SELECT doc_id AS id, source,
               string_split_regex(text, '\s+') AS ws FROM documents),
         g AS (SELECT id, source, CAST(i AS BIGINT) AS pos,
                 ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
               FROM w, UNNEST(range(greatest(len(ws)-2, 0))) AS t(i))"""

  /** gaps-and-islands over duplicated gram positions — the same
    * maximal-span definition as [[Dedup.duplicatedSpans]] (3-gram,
    * minOcc 2, minSpanTokens 10).
    */
  private val duplicatedSpansSql =
    s"""WITH $posGramCtes,
         d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         p AS (SELECT id, pos, pos - row_number()
                 OVER (PARTITION BY id ORDER BY pos) AS grp
               FROM g WHERE gram IN (SELECT gram FROM d)),
         sp AS (SELECT id, min(pos) AS start_pos, count(*) AS n_grams
                FROM p GROUP BY id, grp)
         SELECT id AS doc_id, CAST(start_pos AS BIGINT) AS start_pos,
                CAST(n_grams AS BIGINT) AS n_grams,
                CAST(n_grams + 2 AS BIGINT) AS span_tokens
         FROM sp WHERE n_grams + 2 >= 10
         ORDER BY doc_id, start_pos"""

  /** BM25 query-term bag — a rare term (df≈5%) plus common ones, so
    * idf spread and tf/dl normalization both show in the top-k.
    */
  private[queries] val bm25Terms =
    Seq("dup", "spark", "vector", "customer", "merge", "stream")

  /** Mirrors [[Retrieval.bm25TopK]] op for op: same tokenization
    * (single-space split, empties dropped), same integer-quantized
    * idf, same left-associated contribution chain — scores agree
    * bit-for-bit before the final round.
    */
  private def bm25Sql(terms: Seq[String], k1: Double, b: Double,
      topK: Int): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val avgdl = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    val contribs = terms.indices.map { i =>
      val idf = s"CAST(round(ln((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)" +
        s" + 0.5) / (CAST(df$i AS DOUBLE) + 0.5) + 1.0) * 1000000.0)" +
        " AS BIGINT)"
      s"($idf * (CAST(tf$i AS DOUBLE) / (CAST(tf$i AS DOUBLE) + " +
        s"CAST($k1 AS DOUBLE) * (CAST(${1.0 - b} AS DOUBLE) + " +
        s"CAST($b AS DOUBLE) * (CAST(dl AS DOUBLE) / $avgdl)))))"
    }.mkString(" + ")
    val matched = terms.indices.map(i =>
      s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
         st AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, $tfCols
                FROM t),
         corpus AS (SELECT count(*) AS n, sum(dl) AS sumdl, $dfCols
                    FROM st)
         SELECT doc_id, round(($contribs) / 1000000.0, 4) AS bm25,
                CAST($matched AS BIGINT) AS matched_terms
         FROM st, corpus
         ORDER BY bm25 DESC, doc_id LIMIT $topK"""
  }

  /** Mirrors [[Retrieval.tokenEntropy]]: per-(doc, token) counts,
    * each ln quantized to integer milli-micro-nats, one double
    * division at the end.
    */
  private val tokenEntropySql =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c FROM w
               WHERE tok <> '' GROUP BY doc_id, tok),
         s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tokens,
                 CAST(count(*) AS BIGINT) AS distinct_tokens,
                 CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE))
                   * 1000000.0) AS BIGINT)) AS BIGINT) AS mln_sum
               FROM c GROUP BY doc_id)
         SELECT doc_id, tokens, distinct_tokens,
                round((CAST(CAST(round(ln(CAST(tokens AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS DOUBLE)
                  - CAST(mln_sum AS DOUBLE) / CAST(tokens AS DOUBLE))
                  / 1000000.0, 4) AS entropy
         FROM s WHERE tokens > 0 ORDER BY doc_id"""

  /** The span-cut APPLY act — [[duplicatedSpansSql]]'s islands, the
    * lag-overlap union correction, and the per-doc token budget.
    */
  private val applySpanCutsSql =
    s"""WITH $posGramCtes,
         d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         p AS (SELECT id, pos, pos - row_number()
                 OVER (PARTITION BY id ORDER BY pos) AS grp
               FROM g WHERE gram IN (SELECT gram FROM d)),
         sp AS (SELECT id, min(pos) AS p0, count(*) AS ng
                FROM p GROUP BY id, grp),
         q AS (SELECT id, p0, ng + 2 AS span_tokens,
                 p0 + ng + 1 AS end_pos
               FROM sp WHERE ng + 2 >= 10),
         o AS (SELECT id, span_tokens - greatest(0,
                 coalesce(lag(end_pos)
                   OVER (PARTITION BY id ORDER BY p0), -1)
                 - p0 + 1) AS cut
               FROM q),
         cut AS (SELECT id, sum(cut) AS tokens_cut FROM o GROUP BY id),
         nt AS (SELECT doc_id AS id,
                  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                    AS n_tokens
                FROM documents)
         SELECT id AS doc_id, n_tokens,
                CAST(tokens_cut AS BIGINT) AS tokens_cut,
                CAST(n_tokens - tokens_cut AS BIGINT) AS clean_tokens
         FROM cut JOIN nt USING (id) ORDER BY doc_id"""

  private val dupFractionSql =
    s"""WITH $posGramCtes,
         o AS (SELECT gram, count(*) AS occ FROM g GROUP BY gram)
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup,
                round(CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 4) AS dup_frac
         FROM g JOIN o USING (gram)
         GROUP BY source ORDER BY source"""

  val oracle: Map[String, String] = Map(
    "text_boilerplate_grams" -> boilerplateSql,
    "text_boilerplate_filter" -> boilerplateFilterSql,
    "dedup_duplicated_spans" -> duplicatedSpansSql,
    "dedup_dup_fraction_by_source" -> dupFractionSql,
    "dedup_apply_span_cuts" -> applySpanCutsSql,
    "text_bm25_topk" -> bm25Sql(bm25Terms, 1.2, 0.75, 20),
    "text_token_entropy" -> tokenEntropySql,
    "pipeline_pack_sequences" -> packSequencesSql,
    "pipeline_decontaminate" -> decontaminateSql,
    "dedup_near_cluster" -> nearClusterSql,
    "ann_ivf_topk" -> annIvfSql(8, 64, 3, 10),
    "ann_pq_topk" -> annPqSql(8, 16, 64, 10),
    "ann_ivf_pq_topk" -> annIvfPqSql(8, 3, 8, 16, 64, 10),
    "dedup_ngram_jaccard" -> exactJaccardSql,
    "dedup_minhash_lsh" -> exactJaccardSql,
    "dedup_simhash" -> simhashSql,
    "ann_lsh_near_dup" -> annLshSql(8, 8, 64, 0.4),
    "ann_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings
                    WHERE vec_id = 0),
         c AS (SELECT vec_id,
                 list_sum(list_transform(range(1, len(embedding)+1),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(qe[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1,
                      len(embedding)+1),
                      i -> CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(qe)+1),
                      i -> CAST(qe[i] AS DOUBLE)
                           * CAST(qe[i] AS DOUBLE))))) AS cos
               FROM embeddings, q),
         top AS (SELECT vec_id, cos FROM c
                 ORDER BY cos DESC, vec_id LIMIT 10)
         SELECT vec_id, round(cos, 5) AS cos FROM top""",
    "ann_near_dup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_sum(list_transform(range(1, len(a.embedding)+1),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                        * CAST(b.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1,
                      len(a.embedding)+1),
                      i -> CAST(a.embedding[i] AS DOUBLE)
                           * CAST(a.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1,
                      len(b.embedding)+1),
                      i -> CAST(b.embedding[i] AS DOUBLE)
                           * CAST(b.embedding[i] AS DOUBLE))))) AS cos
               FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(cos, 5) AS cos FROM p
         WHERE cos >= 0.4 ORDER BY id_a, id_b""",
    // mirrors Multimodal.demoMedia's deterministic container
    // synthesis: doc_id%3 → wav (44-byte header + data chunk) / mp4
    // (236-byte ftyp+moov) / raw text (unknown); every decoded field
    // is a pure function of (doc_id, length(text))
    "multimodal_decode_meta" ->
      """WITH m AS (SELECT doc_id AS id,
               CAST(length(text) AS BIGINT) AS nn,
               doc_id % 3 AS arm
             FROM documents),
         f AS (SELECT id, nn,
               CASE arm WHEN 0 THEN 'wav' WHEN 1 THEN 'mp4'
                 ELSE 'unknown' END AS format,
               CASE arm WHEN 1 THEN 160 + (nn % 16) * 16
                 ELSE 0 END AS width,
               CASE arm WHEN 1 THEN 120 + (id % 9) * 8
                 ELSE 0 END AS height,
               CASE arm WHEN 0 THEN 8000 + (nn % 8) * 1000
                 ELSE 0 END AS sr,
               CASE arm WHEN 0 THEN 1 + id % 2 ELSE 0 END AS ch,
               CASE arm WHEN 0 THEN
                 ((nn % 50) + 1) * (1 + id % 2) * 2 * 8
                 ELSE 0 END AS db
             FROM m)
         SELECT format, count(*) AS n,
           CAST(sum(width) AS BIGINT) AS width_sum,
           CAST(sum(height) AS BIGINT) AS height_sum,
           CAST(sum(CASE format WHEN 'wav' THEN 44 + db
             WHEN 'mp4' THEN 236 ELSE nn END) AS BIGINT) AS bytes_sum,
           CAST(sum(sr) AS BIGINT) AS sr_sum,
           CAST(sum(ch) AS BIGINT) AS ch_sum,
           CAST(sum(CASE format
             WHEN 'wav' THEN (db * 1000) // (sr * ch * 2)
             WHEN 'mp4' THEN nn % 10000
             ELSE 0 END) AS BIGINT) AS dur_ms_sum
         FROM f GROUP BY format ORDER BY format""",

    // hash thresholds are Pipeline.rateHex values: 0.8→'cccd',
    // 0.9→'e666' (md5 hex prefix < threshold, byte-wise compare — both
    // engines collate binary)
    "pipeline_sample_split" ->
      """SELECT split, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM (SELECT CASE
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
               < 'cccd' THEN 'train'
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
               < 'e666' THEN 'val'
             ELSE 'test' END AS split, n_chars
           FROM documents)
         GROUP BY split ORDER BY split""",

    // per-source rates 1.0/0.5/0.25/0.1 by source index mod 4
    // (rateHex: 1.0→'g', 0.5→'8000', 0.25→'4000', 0.1→'199a'); the
    // keep hash salts the id with the source name, like mixSources
    "pipeline_mix_sources" ->
      """SELECT source, count(*) AS total,
           CAST(sum(CASE WHEN
             substring(md5(source || ':' || CAST(doc_id AS VARCHAR)),
               1, 4) <
             CASE CAST(substring(source, 4) AS INT) % 4
               WHEN 0 THEN 'g' WHEN 1 THEN '8000'
               WHEN 2 THEN '4000' ELSE '199a' END
             THEN 1 ELSE 0 END) AS BIGINT) AS kept
         FROM documents GROUP BY source ORDER BY source""",

    "pipeline_quality_funnel" ->
      """SELECT stage, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM (SELECT CASE
             WHEN n_chars < 100 THEN 'too_short'
             WHEN lang NOT IN ('en', 'de', 'fr', 'es')
               THEN 'lang_filter'
             WHEN len(string_split(text, ' ')) < 15
               THEN 'too_few_tokens'
             ELSE 'kept' END AS stage, n_chars
           FROM documents)
         GROUP BY stage ORDER BY stage""",

    // sequential count-then-replace fold, one CTE per rule, patterns
    // interpolated from the Scala constants so the two engines cannot
    // diverge (all three stay in the RE2-compatible subset)
    "pipeline_pii_scrub" ->
      s"""WITH inj AS (SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.'
                  || CAST(doc_id % 200 AS VARCHAR) || '.0.1'
                  || CASE WHEN doc_id % 3 = 0
                     THEN ' token 0123456789abcdef0123456789abcdef'
                     ELSE '' END AS pii_text
           FROM documents),
         r1 AS (SELECT source, pii_text,
             len(regexp_extract_all(pii_text, '${Scrub.EmailRe}'))
               AS ne,
             regexp_replace(pii_text, '${Scrub.EmailRe}', '<EMAIL>',
               'g') AS t1
           FROM inj),
         r2 AS (SELECT source, pii_text, ne,
             len(regexp_extract_all(t1, '${Scrub.Ipv4Re}')) AS ni,
             regexp_replace(t1, '${Scrub.Ipv4Re}', '<IP>', 'g') AS t2
           FROM r1),
         r3 AS (SELECT source, pii_text, ne, ni,
             len(regexp_extract_all(t2, '${Scrub.HexSecretRe}')) AS nh,
             regexp_replace(t2, '${Scrub.HexSecretRe}', '<SECRET>',
               'g') AS t3
           FROM r2)
         SELECT source, count(*) AS n_docs,
           CAST(sum(ne) AS BIGINT) AS emails_redacted,
           CAST(sum(ni) AS BIGINT) AS ipv4s_redacted,
           CAST(sum(nh) AS BIGINT) AS hex_secrets_redacted,
           CAST(sum(length(pii_text) - length(t3)) AS BIGINT)
             AS chars_removed
         FROM r3 GROUP BY source ORDER BY source""",

    // same 64/48 window arithmetic on integer math; DuckDB list
    // slicing is 1-based inclusive-inclusive, so window i is
    // ws[1+i*48 : i*48+64] (clamped at the end like Spark's slice)
    "pipeline_chunk_documents" ->
      """WITH w AS (SELECT doc_id, source,
             string_split_regex(text, '\s+') AS ws FROM documents),
         n AS (SELECT source, ws, len(ws) AS n,
             CASE WHEN len(ws) <= 64 THEN 1
                  ELSE 1 + (len(ws) - 64 + 47) // 48 END AS nc
           FROM w),
         c AS (SELECT source,
             array_to_string(ws[1 + i*48 : i*48 + 64], ' ')
               AS chunk_text,
             least(64, n - i*48) AS chunk_tokens
           FROM n, UNNEST(range(nc)) AS t(i))
         SELECT source, count(*) AS n_chunks,
           count(DISTINCT chunk_text) AS distinct_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
           CAST(sum(length(chunk_text)) AS BIGINT) AS sum_chunk_chars
         FROM c GROUP BY source ORDER BY source""",

    // same 8-word paragraph rebuild (DuckDB list slicing is 1-based
    // inclusive-inclusive), then first-global-occurrence by
    // (doc_id, paragraph position) via a partitioned row_number —
    // the exact winner rule of Dedup.paragraphOccurrences
    "dedup_paragraph" ->
      """WITH w AS (SELECT doc_id, source,
             string_split_regex(text, '\s+') AS ws FROM documents),
         n AS (SELECT doc_id, source, ws,
             (len(ws) + 7) // 8 AS np FROM w),
         p AS (SELECT doc_id, source, i AS para_idx,
             array_to_string(ws[1 + i*8 : i*8 + 8], ' ') AS para
           FROM n, UNNEST(range(np)) AS t(i)),
         r AS (SELECT source, para,
             row_number() OVER (PARTITION BY para
               ORDER BY doc_id, para_idx) AS rn
           FROM p WHERE length(para) > 0)
         SELECT source, count(*) AS paras_total,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS paras_kept,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS paras_removed,
           CAST(sum(CASE WHEN rn > 1 THEN length(para) ELSE 0 END)
             AS BIGINT) AS chars_removed
         FROM r GROUP BY source ORDER BY source""",

    // identical payload injection (literals interpolated from
    // normPayloads so the engines cannot diverge), then the same
    // three normalization stages: NFC, controls→space, collapse+trim
    "text_normalize" ->
      s"""WITH inj AS (SELECT source,
             text || CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN '${normPayloads(0)}'
               WHEN 1 THEN '${normPayloads(1)}'
               ELSE '${normPayloads(2)}' END AS raw
           FROM documents),
         n1 AS (SELECT source, raw,
             regexp_replace(nfc_normalize(raw),
               '[\\p{Cc}\\p{Cf}]', ' ', 'g') AS t1
           FROM inj),
         n2 AS (SELECT source, raw,
             trim(regexp_replace(t1, '\\s+', ' ', 'g')) AS norm
           FROM n1)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN norm <> raw THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_changed,
           CAST(sum(length(raw)) AS BIGINT) AS chars_before,
           CAST(sum(length(norm)) AS BIGINT) AS chars_after
         FROM n2 GROUP BY source ORDER BY source""",

    // zip-unnest adjacent pairs (single-space WordStats tokenization,
    // empties dropped like the operator), two-phase count,
    // deterministic (count DESC, bigram) top-50
    "text_bigram_vocab" ->
      """WITH w AS (SELECT list_filter(
               string_split(text, ' '), x -> x <> '') AS ws
             FROM documents),
         b AS (SELECT ws[i+1] || ' ' || ws[i+2] AS bigram
           FROM w, UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i))
         SELECT bigram, count(*) AS n FROM b GROUP BY bigram
         ORDER BY n DESC, bigram LIMIT 50""",

    // same replica construction (NFD copy of every 10th doc, byte
    // copy of every 20th), same three-stage normalization, then
    // duplicate-group stats on raw vs normalized
    "dedup_exact_normalized" ->
      s"""WITH inj AS (
             SELECT text || '$normSuffixComposed' AS raw
               FROM documents
             UNION ALL
             SELECT text || '$normSuffixDecomposed' AS raw
               FROM documents WHERE doc_id % 10 = 0
             UNION ALL
             SELECT text || '$normSuffixComposed' AS raw
               FROM documents WHERE doc_id % 20 = 0),
         n AS (SELECT raw,
             trim(regexp_replace(regexp_replace(nfc_normalize(raw),
               '[\\p{Cc}\\p{Cf}]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
           FROM inj),
         r AS (SELECT 'raw' AS variant,
             CAST(count(*) AS BIGINT) AS dup_groups,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS dup_docs
           FROM (SELECT count(*) AS n FROM n GROUP BY raw
                 HAVING count(*) > 1)),
         m AS (SELECT 'normalized' AS variant,
             CAST(count(*) AS BIGINT) AS dup_groups,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS dup_docs
           FROM (SELECT count(*) AS n FROM n GROUP BY norm
                 HAVING count(*) > 1))
         SELECT * FROM m UNION ALL SELECT * FROM r ORDER BY variant""",

    // same permutation: rank of md5('epoch0:' || id) with id
    // tie-break, same 128-doc shard arithmetic
    "pipeline_shuffle_shards" ->
      """WITH r AS (SELECT doc_id AS id,
             row_number() OVER (ORDER BY
               md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
               AS rnk
           FROM documents)
         SELECT rnk // 128 AS shard, count(*) AS docs,
           CAST(sum(id) AS BIGINT) AS sum_id,
           CAST(max(rnk % 128) AS BIGINT) AS max_pos
         FROM r GROUP BY 1 ORDER BY 1""",

    // same snapshot-B construction, same md5-digest full outer join
    // and classification
    "pipeline_corpus_diff" ->
      """WITH b AS (
             SELECT doc_id, text FROM documents
               WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0
             UNION ALL
             SELECT doc_id, text || ' v2' FROM documents
               WHERE doc_id % 13 = 0 AND doc_id % 17 <> 0
             UNION ALL
             SELECT doc_id + (1::BIGINT << 42), text FROM documents
               WHERE doc_id % 19 = 0),
         oldd AS (SELECT doc_id AS old_id, md5(text) AS old_h,
             length(text) AS old_chars FROM documents),
         newd AS (SELECT doc_id AS new_id, md5(text) AS new_h,
             length(text) AS new_chars FROM b),
         j AS (SELECT CASE
               WHEN old_id IS NULL THEN 'added'
               WHEN new_id IS NULL THEN 'removed'
               WHEN old_h <> new_h THEN 'changed'
               ELSE 'unchanged' END AS status,
             coalesce(new_chars, old_chars) AS chars
           FROM oldd FULL OUTER JOIN newd ON old_id = new_id)
         SELECT status, count(*) AS docs,
           CAST(sum(chars) AS BIGINT) AS chars
         FROM j GROUP BY status ORDER BY status""",

    // rebuild both quantized vocabularies from the same pair counts
    // (left marginals = sum of pair counts grouped on the pair's left
    // word, the operator's own derivation), join each adjacent pair,
    // and rebuild the integer conditional score
    "text_quality_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
         bp AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS pair,
             ws[i+1] AS left_tok
           FROM w, UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)),
         vc AS (SELECT pair, count(*) AS c FROM bp GROUP BY pair),
         pv AS (SELECT pair,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
               AS mp
           FROM (SELECT pair, c FROM vc ORDER BY c DESC, pair
                 LIMIT 4096)),
         lc AS (SELECT string_split(pair, ' ')[1] AS left_tok,
             sum(c) AS c FROM vc GROUP BY 1),
         lv AS (SELECT left_tok,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
               AS ml
           FROM lc
           WHERE left_tok IN (SELECT left_tok FROM
                 (SELECT left_tok FROM lc ORDER BY c DESC, left_tok
                  LIMIT 4096))
              OR left_tok IN (SELECT string_split(pair, ' ')[1]
                  FROM pv)),
         ds AS (SELECT bp.doc_id, count(*) AS pairs,
             CAST(sum(coalesce(pv.mp, 0) - coalesce(lv.ml, 0))
               AS BIGINT) AS score
           FROM bp LEFT JOIN pv USING (pair)
                   LEFT JOIN lv ON bp.left_tok = lv.left_tok
           GROUP BY bp.doc_id),
         dd AS (SELECT w.source, coalesce(d.pairs, 0) AS pairs,
             coalesce(d.score, 0) AS score
           FROM w LEFT JOIN ds d USING (doc_id))
         SELECT source, count(*) AS n_docs,
           CAST(sum(pairs) AS BIGINT) AS pairs,
           CAST(sum(score) AS BIGINT) AS sum_score_mln,
           CAST(sum(CASE WHEN score < -3440000 * pairs THEN 1 ELSE 0
             END) AS BIGINT) AS flagged
         FROM dd GROUP BY source ORDER BY source""",

    // recompute the quantized unigram LM from the same token counts
    // (round(ln(c)*1e6) as BIGINT; ln parity with the JVM is the same
    // contract text_tfidf_top_terms already pins), join each token
    // occurrence against it (OOV -> 0 = ln(1)), and rebuild the
    // integer score: mln_sum - words * mln(total); -3.42 nats/token
    // = -3420000 per-token flag threshold, integer compare
    "text_quality_logprob" ->
      """WITH w AS (SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
         t AS (SELECT unnest(ws) AS tok FROM w),
         vc AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
         tot AS (SELECT coalesce(
             CAST(round(ln(CAST(sum(c) AS DOUBLE)) * 1000000)
               AS BIGINT), 0) AS mln_total FROM vc),
         vocab AS (SELECT tok,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
               AS mln
           FROM (SELECT tok, c FROM vc ORDER BY c DESC, tok
                 LIMIT 1024)),
         dtok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
         dsum AS (SELECT doc_id,
             CAST(sum(coalesce(v.mln, 0)) AS BIGINT) AS mln_sum
           FROM dtok LEFT JOIN vocab v USING (tok) GROUP BY doc_id),
         ds AS (SELECT w.source, len(w.ws) AS words,
             coalesce(d.mln_sum, 0)
               - len(w.ws) * (SELECT mln_total FROM tot) AS score
           FROM w LEFT JOIN dsum d USING (doc_id))
         SELECT source, count(*) AS n_docs,
           CAST(sum(words) AS BIGINT) AS tokens,
           CAST(sum(score) AS BIGINT) AS sum_score_mln,
           CAST(sum(CASE WHEN score < -3420000 * words THEN 1 ELSE 0
             END) AS BIGINT) AS flagged
         FROM ds GROUP BY source ORDER BY source"""
  )
}
