package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Bm25TermStats, TokenEntropyStats}

/** Retrieval-style scoring over a document corpus — the operators a
  * training-data pipeline uses to PULL targeted slices out of 100 TB
  * (quality-targeted retrieval, seed-set expansion, eval-adjacent
  * mining) rather than to cut it down. Both operators are exact and
  * engine-reproducible: BM25 quantizes its idf to integer
  * milli-micro-nats (the [[graft.functions.UnigramLogProb]]
  * fixed-point convention) and composes the remaining arithmetic as a
  * fixed left-associated chain of IEEE ops, so an external engine
  * running the same formula reproduces every score bit-for-bit before
  * rounding.
  */
object Retrieval {

  /** BM25 top-k retrieval for a fixed bag of query `terms` (Robertson
    * k1/b, the `+1`-inside-`ln` idf variant whose scores are always
    * positive):
    *
    *   score = Σ_t idf(t) · tf_t·/(tf_t + k1·(1 − b + b·dl/avgdl))
    *   idf(t) = round(ln((N − df_t + 0.5)/(df_t + 0.5) + 1)·1e6)
    *
    * Returns (doc_id, bm25, matched_terms): the `topK` highest-scoring
    * documents, score in nats rounded to 4 decimals, ties broken by
    * id. Scores are deterministic across engines and partitionings:
    * idf is quantized to an integer, every remaining operation is a
    * single correctly-rounded IEEE double op on exact inputs, and the
    * per-term contributions add in fixed term order (a left-assoc
    * `+` chain, never a float SUM aggregate).
    *
    * 100 TB shape: pass 1 is one map-side compiled
    * [[graft.functions.Bm25TermStats]] scan reduced to a SINGLE row
    * (N, Σdl, df per term — all two-phase partial aggs); that row
    * broadcasts back over pass 2's identical map-side scan, and the
    * top-k is a TakeOrderedAndProject (per-partition heaps, never a
    * global sort). Text never shuffles; the only exchanges are the
    * 1-row aggregate and the k-row ordered take.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double, b: Double, topK: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(topK > 0, s"topK $topK must be positive")
    val st = Bm25TermStats(col(textCol), terms)
    val base = docs.select(col(idCol).as("id"),
      st.getField("dl").as("dl"), st.getField("tfs").as("tfs"))
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
        terms.indices.map(i =>
          sum((col("tfs").getItem(i) > 0L).cast("long")).as(s"df$i"))
    val corpus = base.agg(aggCols.head, aggCols.tail: _*)
    val nD = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / nD
    def contrib(i: Int): Column = {
      val tf = col("tfs").getItem(i).cast("double")
      val df = col(s"df$i").cast("double")
      // integer milli-micro-nat idf — the one transcendental op,
      // quantized so engines agree exactly (ln parity per UnigramLogProb)
      val idfMicro = round(log((nD - df + lit(0.5)) / (df + lit(0.5)) +
        lit(1.0)) * lit(1e6)).cast("long").cast("double")
      idfMicro * (tf / (tf + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    val matched = terms.indices.map(i =>
      (col("tfs").getItem(i) > 0L).cast("long")).reduceLeft(_ + _)
    base.crossJoin(broadcast(corpus))
      .select(col("id").as("doc_id"),
        round(score / lit(1e6), 4).as("bm25"),
        matched.as("matched_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Per-document token-distribution Shannon entropy (nats, 4
    * decimals) — the diversity axis of quality filtering: templated /
    * repetitive documents score low even when no single token
    * dominates (which is all the modal-token share sees). Returns
    * (doc_id, tokens, distinct_tokens, entropy) for every document
    * with at least one token.
    *
    * 100 TB shape: ONE map-side compiled
    * [[graft.functions.TokenEntropyStats]] scan — no token explode,
    * no per-doc aggregation, no shuffle at all past the scan; every
    * `ln` is quantized to integer milli-micro-nats inside the
    * expression, leaving one deterministic double division per row.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val st = TokenEntropyStats(col(textCol))
    docs.select(col(idCol).as("doc_id"),
        st.getField("tokens").as("tokens"),
        st.getField("distinct_tokens").as("distinct_tokens"),
        st.getField("mln_tokens").as("mln_tokens"),
        st.getField("mln_sum").as("mln_sum"))
      .filter(col("tokens") > 0L)
      .select(col("doc_id"), col("tokens"), col("distinct_tokens"),
        round((col("mln_tokens").cast("double") -
          col("mln_sum").cast("double") / col("tokens").cast("double")) /
          lit(1e6), 4).as("entropy"))
      .orderBy("doc_id")
  }
}
