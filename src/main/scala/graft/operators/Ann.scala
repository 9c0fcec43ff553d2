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
  * Dot products and norms are UNROLLED element_at sums over a known
  * dimension: Spark's higher-order functions (aggregate/zip_with) are
  * CodegenFallback — interpreted per row — while the unrolled form stays
  * inside whole-stage codegen (~10× on the pair join). The left-assoc
  * sum keeps the same IEEE fold order as the DuckDB oracle's list_sum.
  */
object Ann {

  /** embedding dimension, read from one row (plan-build-time constant). */
  def dimOf(embeddings: DataFrame, embCol: String): Int =
    embeddings.select(size(col(embCol))).head().getInt(0)

  private def dot(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i))
      .reduceLeft(_ + _)

  private def norm(a: Column, dim: Int): Column =
    sqrt((1 to dim).map(i => element_at(a, i) * element_at(a, i))
      .reduceLeft(_ + _))

  /** cosine(embedding, query) against a fixed query vector. */
  def cosine(emb: Column, queryVec: Seq[Double]): Column = {
    val dim = queryVec.length
    val d = (1 to dim).map(i =>
      element_at(emb, i) * lit(queryVec(i - 1))).reduceLeft(_ + _)
    val nb = math.sqrt(queryVec.map(x => x * x).sum)
    d / (norm(emb, dim) * lit(nb))
  }

  /** exact top-k by cosine against a fixed query vector. */
  def cosineTopK(embeddings: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], k: Int): DataFrame =
    embeddings.select(col(idCol),
        cosine(col(embCol).cast("array<double>"), queryVec).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in {-1, +1} from xxhash64 — a signed random projection.
    */
  private def planeSign(plane: Int, d: Int): Column =
    when(pmod(xxhash64(lit(plane), lit(d)), lit(2)) === 0, 1.0)
      .otherwise(-1.0)

  /** nBits-bit random-hyperplane signature per embedding. */
  def hyperplaneSignature(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val e = col(embCol).cast("array<double>")
    val projections = (0 until nBits).map { p =>
      (1 to dim).map(d => element_at(e, d) * planeSign(p, d - 1))
        .reduceLeft(_ + _)
    }
    val sig = projections.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (proj, p)) =>
        acc.bitwiseOR(when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L))
    }
    embeddings.select(col(idCol), col(embCol), sig.as("lsh_sig"))
  }

  private def pairCos(embCol: String, dim: Int): Column = {
    val a = col(s"l.$embCol").cast("array<double>")
    val b = col(s"r.$embCol").cast("array<double>")
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
  }

  /** LSH-bucketed near-neighbour pairs: same signature bucket, then
    * exact cosine ≥ threshold within the bucket.
    */
  def lshNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int, threshold: Double): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val sigs = hyperplaneSignature(embeddings, embCol, idCol, nBits)
    val l = sigs.as("l")
    val r = sigs.as("r")
    l.join(r, col("l.lsh_sig") === col("r.lsh_sig") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", pairCos(embCol, dim))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("cos"))
  }

  /** exact (brute-force) near-dup pairs — the small-SF oracle twin of
    * [[lshNearDupPairs]]; at scale the LSH path replaces the cross join.
    */
  def exactNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, threshold: Double): DataFrame = {
    val dim = dimOf(embeddings, embCol)
    val l = embeddings.as("l")
    val r = embeddings.as("r")
    l.join(r, col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", pairCos(embCol, dim))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("cos"))
  }
}
