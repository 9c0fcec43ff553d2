package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine is the exact baseline: one narrow projection +
  * a top-k (TakeOrdered — no full sort at scale). The LSH variant
  * (random-hyperplane signs) is the 100 TB path: bucket by an nBits-bit
  * signature so the candidate join is bucket-local; planes are derived
  * deterministically from xxhash64 so executors need no broadcast state.
  *
  * All cosine arithmetic goes through [[graft.functions.CosineSim]], a
  * compact codegen'd node: Spark's higher-order functions
  * (aggregate/zip_with) are CodegenFallback — interpreted per row —
  * and the historical UNROLLED element_at formulation (3 × dim terms)
  * stopped compiling once embeddings reached dim 64: inlined into a
  * BroadcastNestedLoopJoin condition it pushes `bnlj_doConsume` past
  * the JVM's 64 KB method limit, janino fails, and the whole join
  * silently runs interpreted (measured 31 s vs 3 s on the sf0.1 pair
  * join). The node reads the raw float arrays directly (no per-pair
  * cast allocation) and keeps the oracle's left-assoc IEEE fold order.
  *
  * FORMULATION RULES, each measured on the sf0.1 pair join:
  *  - cosine is ONE expression node over the RAW relations' columns;
  *    hoisting pieces (casts, norms) into projected join inputs gets
  *    re-inlined by CollapseProject into every reference and is
  *    catastrophic (65–200 s in the unrolled era).
  *  - the all-pairs join side is explicitly broadcast: projected inputs
  *    have no size stats, and a CartesianProduct fallback evaluates the
  *    pushed-down cosine condition row-at-a-time with extra overhead.
  *  - float→double widening per element equals the old
  *    `cast(arr AS array<double>)` element values, so oracle parity is
  *    unaffected by any of this.
  */
object Ann {

  /** embedding dimension, read from one non-null row (plan-build-time
    * constant).
    */
  def dimOf(embeddings: DataFrame, embCol: String): Int =
    embeddings.filter(col(embCol).isNotNull)
      .select(size(col(embCol))).head().getInt(0)

  /** cosine(embedding, query) against a fixed query vector (inlined
    * as an array literal — constant per task, no broadcast state).
    */
  def cosine(emb: Column, queryVec: Seq[Double]): Column =
    graft.functions.CosineSim(emb, lit(queryVec.toArray),
      queryVec.length)

  /** exact top-k by cosine against a fixed query vector. */
  def cosineTopK(embeddings: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], k: Int): DataFrame =
    embeddings.select(col(idCol),
        cosine(col(embCol), queryVec).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** deterministic ±1 hyperplane component for (plane, dim index):
    * splitmix64 finalizer over the pair, computed in plain Scala so the
    * identical sign constants can be inlined into the Spark plan AND
    * into generated DuckDB oracle SQL (the plan sees only literals —
    * constant-folded, no broadcast state, no per-row hash calls).
    */
  def planeSign(plane: Int, d: Int): Int = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L +
      (d + 1).toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1 else -1
  }

  /** the ±1 sign matrix for planes [0, nPlanes) over `dim` components,
    * shared (same constants) by the Spark expression and the generated
    * oracle SQL.
    */
  private def signMatrix(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(d =>
      planeSign(p, d)))

  /** nBits-bit random-hyperplane signature per embedding, via the
    * compact codegen'd [[graft.functions.HyperplaneSigs]] node (one
    * table of nBits planes).
    */
  /** MALFORMED-ROW GUARD: [[graft.functions.HyperplaneSigs]] emits an
    * ALL-ZERO signature for too-short embeddings — correct for oracle
    * parity, but at scale a corpus with 10⁶ malformed rows would
    * concentrate them all in bucket 0 of every table and the candidate
    * self-join goes quadratic. Dropping `size(emb) < dim` rows BEFORE
    * signature generation is output-equivalent: a short embedding's
    * exact-cosine verify is NULL (element_at past the end), so such
    * rows can never appear in the result anyway. Longer-than-dim rows
    * are KEPT — both signatures and the verify use their dim-prefix,
    * exactly as before. Null-ELEMENT rows pass this filter and still
    * share the zero bucket; [[Dedup.capBuckets]] is the backstop for
    * that class.
    */
  private def wellFormed(embeddings: DataFrame, embCol: String,
      dim: Int): DataFrame =
    embeddings.filter(size(col(embCol)) >= dim)

  def hyperplaneSignature(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val sig = element_at(graft.functions.HyperplaneSigs(
      col(embCol), signMatrix(nBits, dim), nBits), 1)
    wellFormed(embeddings, embCol, dim)
      .select(col(idCol), col(embCol), sig.as("lsh_sig"))
  }

  /** LSH-bucketed near-neighbour pairs: same signature bucket, then
    * exact cosine ≥ threshold within the bucket. `maxBucketSize` is the
    * degenerate-bucket skew guard ([[Dedup.capBuckets]]); 0 = off.
    */
  def lshNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int, threshold: Double,
      maxBucketSize: Int = 0): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val sigs = Dedup.capBuckets(
      hyperplaneSignature(embeddings, embCol, idCol, nBits)
        .select(col(idCol), col("lsh_sig")),
      Seq("lsh_sig"), maxBucketSize)
    val l = sigs.as("l")
    val r = sigs.as("r")
    val cand = l.join(r, col("l.lsh_sig") === col("r.lsh_sig") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
    verifyPairs(cand, embeddings, embCol, idCol, dim, threshold)
  }

  /** exact-cosine verify over candidate (id_a, id_b) pairs. The cos
    * expression is ONE [[graft.functions.CosineSim]] node evaluated
    * inline per pair: alias tricks that precompute norms per embedding
    * backfire — predicate pushdown re-inlines the aliased SQRT trees
    * into pushed filters and the extra projection layers measured ~5×
    * SLOWER end-to-end than the flat codegen'd expression.
    */
  private def verifyPairs(cand: DataFrame, embeddings: DataFrame,
      embCol: String, idCol: String, dim: Int,
      threshold: Double): DataFrame = {
    val ea = embeddings.select(col(idCol).as("id_a"),
      col(embCol).as("__ea"))
    val eb = embeddings.select(col(idCol).as("id_b"),
      col(embCol).as("__eb"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("cos",
        graft.functions.CosineSim(col("__ea"), col("__eb"), dim))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Banded (multi-table) hyperplane LSH: nTables signatures of
    * bitsPerTable bits each; a pair is a candidate when ANY table's
    * signature matches exactly (the OR-of-ANDs construction, same shape
    * as MinHash banding). Candidate recall for a pair at angle θ is
    * 1-(1-(1-θ/π)^bits)^tables — more tables raise recall, more bits
    * per table sharpen bucket selectivity. Exact cosine verifies every
    * candidate, so precision is exact; only recall is probabilistic.
    *
    * Scale: the candidate join shuffles (table_idx, table_sig, id) —
    * 20-byte rows, never embeddings; distinct pairs then re-join the
    * embedding table twice (hash join on id) for the verify step.
    */
  def bandedLshNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, nTables: Int, bitsPerTable: Int,
      threshold: Double, maxBucketSize: Int = 0): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val sigRows = Dedup.capBuckets(
      wellFormed(embeddings, embCol, dim).select(col(idCol).as("id"),
        posexplode(graft.functions.HyperplaneSigs(col(embCol),
          signMatrix(nTables * bitsPerTable, dim), bitsPerTable))
          .as(Seq("table_idx", "table_sig"))),
      Seq("table_idx", "table_sig"), maxBucketSize)
    val l = sigRows.as("l")
    val r = sigRows.as("r")
    val cand = l.join(r, col("l.table_idx") === col("r.table_idx") &&
        col("l.table_sig") === col("r.table_sig") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    verifyPairs(cand, embeddings, embCol, idCol, dim, threshold)
  }

  // ---------- IVF-style coarse quantization ----------

  /** The k seed centroid vectors: embeddings of the k smallest ids
    * WITH well-formed (non-null, full-dimension) embeddings, collected
    * at plan-build time (k rows, like [[dimOf]]'s one-row read) — one
    * malformed row among the lowest ids must not crash or skew the
    * codebook. A deterministic seed codebook keeps the whole pipeline
    * — and its DuckDB oracle — reproducible; a Lloyd-refined codebook
    * drops in by replacing this function without touching the assign /
    * probe / verify plumbing.
    */
  def centroidVectors(embeddings: DataFrame, embCol: String,
      idCol: String, k: Int): Array[Array[Double]] = {
    val dim = dimOf(embeddings, embCol)
    val cents = embeddings
      .filter(col(embCol).isNotNull && size(col(embCol)) === dim)
      .orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == k,
      s"only ${cents.length} well-formed embeddings for $k centroids")
    cents
  }

  /** Lloyd (k-means) refinement of a codebook: `iters` rounds of
    * assign-to-nearest (the same first-wins argmin the query path
    * uses, so refinement and probing agree on cell shapes) followed by
    * per-cell coordinate means. Empty cells keep their previous
    * centroid. Each round is ONE distributed pass — a map-side
    * [[graft.functions.SqDists]] assignment feeding a (dim+1)-column
    * partial+final aggregate over k cells — then a k-row collect to
    * rebuild the literal codebook, exactly like [[centroidVectors]]'s
    * plan-build-time collect. Malformed rows (shorter than `dim`) are
    * excluded from the means the same way [[wellFormed]] excludes them
    * from signatures.
    *
    * Determinism: the update rule is fixed (assign → mean → replace),
    * but distributed double summation folds in partition order, so the
    * refined codebook is reproducible on a fixed partitioning rather
    * than bit-stable across engines — which is why the DuckDB-oracled
    * `ann_ivf_topk` path keeps the seed codebook (lloydIters = 0) and
    * refinement is pinned by AnnSpec's "lloydRefine: planted clusters"
    * recall + quantization-error test instead (reference recall
    * anchor, not a hash compare).
    *
    * Rows with a NULL element in the dim-prefix are excluded here even
    * though they pass [[wellFormed]]'s length check: their [[
    * graft.functions.SqDists]] distances are NULL, so in
    * [[ivfAssignWith]] they fall through the argmin to cell k−1 — fine
    * for a query-side scan, but in a MEAN they would inflate that
    * cell's `n` while `sum` skips their NULLs, deflating the centroid.
    */
  def lloydRefine(embeddings: DataFrame, embCol: String,
      seed: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    if (iters <= 0) return seed
    require(seed.nonEmpty, "lloydRefine: empty seed codebook")
    val dim = seed.head.length
    var cents = seed
    val wf = embeddings.filter(col(embCol).isNotNull &&
      size(col(embCol)) >= dim &&
      !exists(slice(col(embCol), 1, dim), _.isNull))
    for (_ <- 0 until iters) {
      val aggs = count(lit(1)).as("n") +: (0 until dim).map(d =>
        sum(element_at(col(embCol), d + 1).cast("double")).as(s"s$d"))
      val rows = ivfAssignWith(wf, embCol, cents)
        .groupBy("cell").agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val cell = r.getLong(r.fieldIndex("cell")).toInt
        val n = r.getLong(r.fieldIndex("n"))
        if (n > 0)
          next(cell) = Array.tabulate(dim)(d =>
            r.getDouble(r.fieldIndex(s"s$d")) / n)
      }
      cents = next
    }
    cents
  }

  /** first-wins argmin CASE chain over k distance columns:
    * deterministic and engine-identical on identical doubles (the
    * DuckDB oracles run the same CASE shape); null distances
    * (ragged/null-element rows) fail every <= and fall through to the
    * ELSE arm on both engines.
    */
  private def argminChain(ds: Seq[Column]): Column = {
    val k = ds.length
    (0 until k - 1).foldRight(lit(k - 1): Column)((j, els) =>
      when((j + 1 until k).map(m => ds(j) <= ds(m)).reduce(_ && _),
        lit(j)).otherwise(els))
  }

  private def ivfAssignWith(embeddings: DataFrame, embCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val k = cents.length
    // ALL k distances from one compact codegen'd node
    // ([[graft.functions.SqDists]]): the unrolled k×dim Column tree is
    // cheap to run but catastrophic to PLAN once a filter references
    // the argmin cell (measured 18 s of driver optimizer time/query)
    val withD = embeddings.withColumn("__dists",
      graft.functions.SqDists(col(embCol), cents))
    val ds = (0 until k).map(j => element_at(col("__dists"), j + 1))
    withD.withColumn("cell", argminChain(ds).cast("long"))
      .drop("__dists")
  }

  /** IVF coarse assignment: each row gains its inverted-list `cell`
    * (nearest of k seed centroids, squared-L2). One map-side projection
    * over literal centroid constants — no shuffle, no broadcast state,
    * whole-stage codegen'd — so assignment cost is a single scan at any
    * corpus size. At 100 TB the assignment is written once (or bucketed
    * by cell) and every query then prunes (k-nProbe)/k of the corpus
    * before any distance work.
    *
    * `lloydIters` > 0 refines the deterministic seed codebook with
    * [[lloydRefine]] before assignment (recall path); 0 keeps the seed
    * codebook (oracle-reproducible path).
    */
  def ivfAssign(embeddings: DataFrame, embCol: String, idCol: String,
      k: Int, lloydIters: Int = 0): DataFrame =
    ivfAssignWith(embeddings, embCol,
      lloydRefine(embeddings, embCol,
        centroidVectors(embeddings, embCol, idCol, k), lloydIters))

  /** IVF top-k: rank the k cells by centroid distance to the query (in
    * plain Scala over the collected codebook — same ascending fold, so
    * the oracle's SQL ranking agrees), scan only the nProbe nearest
    * cells, exact cosine top-k within them. Recall loss is confined to
    * true neighbours living in unprobed cells; precision is exact.
    */
  def ivfTopK(embeddings: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], k: Int, nProbe: Int,
      topK: Int, lloydIters: Int = 0): DataFrame = {
    val cents = lloydRefine(embeddings, embCol,
      centroidVectors(embeddings, embCol, idCol, k), lloydIters)
    val qd = cents.map { c =>
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val d = queryVec(i) - c(i); acc += d * d; i += 1
      }
      acc
    }
    val probed = qd.zipWithIndex.sortBy { case (d, j) => (d, j) }
      .take(nProbe).map(_._2.toLong)
    ivfAssignWith(embeddings, embCol, cents)
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol), col("cell"),
        cosine(col(embCol), queryVec).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }

  // ---------------- product quantization (PQ) ----------------

  /** Per-subspace seed codebooks for product quantization: the corpus
    * dimension splits into `m` equal subspaces and subspace j's k-entry
    * codebook is the j-th slice of the k lowest-id well-formed
    * embeddings — the same deterministic seed rule as
    * [[centroidVectors]], so the DuckDB oracle recomputes the books
    * from the raw parquet floats. Returns [m][k][dim/m].
    */
  def pqCodebooks(embeddings: DataFrame, embCol: String, idCol: String,
      m: Int, k: Int, lloydIters: Int = 0): Array[Array[Array[Double]]] = {
    val full = centroidVectors(embeddings, embCol, idCol, k)
    val dim = full.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val seeds =
      Array.tabulate(m)(j => full.map(_.slice(j * sub, (j + 1) * sub)))
    if (lloydIters <= 0) seeds
    else {
      // recall path: per-subspace k-means over the sliced column,
      // reusing [[lloydRefine]]'s one-distributed-pass-per-iteration
      // machinery (m × iters passes — a refinement-time cost paid once
      // per codebook build, not per query). Seeds stay the default so
      // the DuckDB-oracled query remains engine-reproducible; the
      // AnnSpec recall test pins that refinement helps.
      seeds.zipWithIndex.map { case (seed, j) =>
        lloydRefine(
          embeddings.select(
            slice(col(embCol), j * sub + 1, sub).as("__sub")),
          "__sub", seed, lloydIters)
      }
    }
  }

  /** PQ encode: each embedding compresses to `m` small codes —
    * code_j = first-wins argmin over subspace j's k codebook entries
    * (squared L2). Output (id, codes ARRAY<LONG> of length m).
    *
    * 100 TB shape: encoding is a map-only projection over one literal
    * codebook constant (a single compact [[graft.functions.PqCodes]]
    * node — no shuffle, no broadcast state), and the encoded table
    * stores m·⌈log₂k⌉ bits per vector instead of 32·dim — dim=64
    * float32 → m=8, k=16 is a 64× compression of what a query-time
    * scan must read.
    */
  def pqEncode(embeddings: DataFrame, embCol: String, idCol: String,
      m: Int, k: Int, lloydIters: Int = 0): DataFrame =
    pqEncodeWith(embeddings, embCol, idCol,
      pqCodebooks(embeddings, embCol, idCol, m, k, lloydIters))

  private def pqEncodeWith(embeddings: DataFrame, embCol: String,
      idCol: String, books: Array[Array[Array[Double]]]): DataFrame =
    // the whole encode is ONE compact node ([[graft.functions
    // .PqCodes]]): composing m SqDists-on-slice nodes + m unrolled
    // argmin chains generated un-compilable code at m=8, k=16 (caught
    // by the codegen-fallback-off sweep)
    embeddings.select(col(idCol),
      graft.functions.PqCodes(col(embCol), books).as("codes"))

  /** PQ top-k by asymmetric distance computation (ADC): the query
    * builds one m×k distance table on the driver (plain Scala over the
    * collected codebooks, ascending-index fold so the SQL oracle's
    * list_sum agrees bit-for-bit), and each row's approximate squared
    * L2 is Σ_j table_j[code_j] — m array lookups per row against the
    * compressed codes, the raw floats are never read at query time.
    * TakeOrdered top-k, ascending distance.
    *
    * Recall is bounded by quantization error (k entries per subspace);
    * the exact-cosine [[cosineTopK]] and IVF paths remain for
    * precision-critical queries — PQ is the memory/IO axis of the ANN
    * trade-off space (IVF prunes candidates, LSH buckets pairs, PQ
    * compresses the scan).
    */
  def pqTopK(embeddings: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], m: Int, k: Int, topK: Int,
      lloydIters: Int = 0): DataFrame = {
    val books = pqCodebooks(embeddings, embCol, idCol, m, k, lloydIters)
    val sub = books.head.head.length
    val tables: Array[Array[Double]] = Array.tabulate(m) { j =>
      Array.tabulate(k) { c =>
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val d = queryVec(j * sub + i) - books(j)(c)(i)
          acc += d * d
          i += 1
        }
        acc
      }
    }
    val encoded = pqEncodeWith(embeddings, embCol, idCol, books)
    val adist = (0 until m).map(j =>
      element_at(lit(tables(j)),
        (element_at(col("codes"), j + 1) + 1).cast("int")))
      .reduce(_ + _)
    encoded.withColumn("adist", adist)
      .select(col(idCol), round(col("adist"), 5).as("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  /** IVF+PQ top-k — the two ANN scale axes composed the way a
    * large-scale serving pipeline runs them: the coarse quantizer
    * prunes (k−nProbe)/k of the corpus BEFORE any per-row distance
    * work (map-side cell filter, like [[ivfTopK]]), and the surviving
    * rows rank by PQ asymmetric distance (m table lookups against the
    * compressed codes, like [[pqTopK]]) instead of touching the raw
    * floats. At 100 TB the corpus is stored cell-bucketed with only
    * (id, codes) hot — the scan reads m bytes per candidate vector.
    *
    * Both codebooks stay on the deterministic lowest-id seed rule so
    * the DuckDB oracle recomputes the entire pipeline — coarse
    * assignment, probe ranking, per-subspace encoding, distance
    * table, lookup sum — from the raw parquet floats; `lloydIters`
    * refines both for the recall path.
    */
  def ivfPqTopK(embeddings: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], kCoarse: Int, nProbe: Int,
      m: Int, k: Int, topK: Int, lloydIters: Int = 0): DataFrame = {
    val coarse = lloydRefine(embeddings, embCol,
      centroidVectors(embeddings, embCol, idCol, kCoarse), lloydIters)
    val qd = coarse.map { c =>
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val d = queryVec(i) - c(i); acc += d * d; i += 1
      }
      acc
    }
    val probed = qd.zipWithIndex.sortBy { case (d, j) => (d, j) }
      .take(nProbe).map(_._2.toLong)
    val books = pqCodebooks(embeddings, embCol, idCol, m, k,
      lloydIters)
    val sub = books.head.head.length
    val tables: Array[Array[Double]] = Array.tabulate(m) { j =>
      Array.tabulate(k) { c =>
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val d = queryVec(j * sub + i) - books(j)(c)(i)
          acc += d * d
          i += 1
        }
        acc
      }
    }
    val candidates = ivfAssignWith(embeddings, embCol, coarse)
      .filter(col("cell").isin(probed: _*))
    val withCodes = candidates.select(col(idCol), col("cell"),
      graft.functions.PqCodes(col(embCol), books).as("codes"))
    val adist = (0 until m).map(j =>
      element_at(lit(tables(j)),
        (element_at(col("codes"), j + 1) + 1).cast("int")))
      .reduce(_ + _)
    withCodes.withColumn("adist", adist)
      .select(col(idCol), col("cell"),
        round(col("adist"), 5).as("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  /** exact (brute-force) near-dup pairs — the small-SF oracle twin of
    * [[lshNearDupPairs]]; at scale the LSH path replaces the cross join.
    */
  def exactNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, threshold: Double): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val l = embeddings.as("l")
    val r = embeddings.as("r")
    // broadcast explicitly so the non-equi pair join is a codegen'd
    // BroadcastNestedLoopJoin, never an interpreted CartesianProduct
    l.join(broadcast(r), col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", graft.functions.CosineSim(
        col(s"l.$embCol"), col(s"r.$embCol"), dim))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("cos"))
  }

  /** SemDeDup-style semantic-dedup report (cluster-then-dedup, Abbas
    * et al., arXiv:2303.09540): within each pre-computed cluster, a
    * vector is a semantic duplicate when some LOWER-id vector of the
    * same cluster has cosine ≥ `threshold` — the lowest id is the kept
    * representative. Emits the per-cluster report `(cluster,
    * n_vectors, dup_pairs, removed)`.
    *
    * Scale shape: the pair join is an EQUI-join on the cluster key, so
    * both sides shuffle once by cluster and the quadratic verify is
    * cluster-local — never a corpus-wide cross join (the separation
    * [[Dedup.minhashLshPairs]] measures at ×10 applies here
    * unchanged). `maxClusterSize` exempts clusters LARGER than the cap
    * from the quadratic pair scan (the same deterministic cap the LSH
    * dedups use) — such a cluster KEEPS its report row, with NULL dup
    * stats marking the skipped scan rather than a silent 0 or a
    * vanished row; 0 (the default) scans every cluster and keeps exact
    * parity with the small-SF oracle. The two aggregations shuffle on
    * the same key, so AQE plans them off one exchange.
    */
  def semanticDedupReport(embeddings: DataFrame, embCol: String,
      idCol: String, clusterCol: String, threshold: Double,
      maxClusterSize: Int = 0): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val base = embeddings.select(col(idCol), col(clusterCol),
      col(embCol))
    val e = Dedup.capBuckets(base, Seq(clusterCol), maxClusterSize)
    val l = e.as("l")
    val r = e.as("r")
    val dupStats = l.join(r,
        col(s"l.$clusterCol") === col(s"r.$clusterCol") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", graft.functions.CosineSim(
        col(s"l.$embCol"), col(s"r.$embCol"), dim))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$clusterCol").as("cluster"),
        col(s"r.$idCol").as("id_b"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("dup_pairs"),
        countDistinct(col("id_b")).as("removed"))
    // sizes come from the UNCAPPED input: an over-cap cluster keeps
    // its row (with NULL dup stats); a scanned-but-dup-free cluster
    // reports 0
    val sizes = base.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).as("n_vectors"))
    val scanned =
      if (maxClusterSize <= 0) lit(true)
      else col("n_vectors") <= maxClusterSize
    sizes.join(dupStats, Seq("cluster"), "left")
      .select(col("cluster"), col("n_vectors"),
        when(scanned, coalesce(col("dup_pairs"), lit(0L)))
          .as("dup_pairs"),
        when(scanned, coalesce(col("removed"), lit(0L)))
          .as("removed"))
  }
}
