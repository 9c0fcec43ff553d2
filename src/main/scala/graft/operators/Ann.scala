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
  */
object Ann {

  /** cosine(embedding, query) as a Column (double). */
  def cosine(emb: Column, queryVec: Seq[Double]): Column = {
    val q = typedLit(queryVec)
    val dot = aggregate(zip_with(emb, q, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x * x))
    val nb = math.sqrt(queryVec.map(x => x * x).sum)
    dot / (na * lit(nb))
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
  private def planeSign(plane: Int, d: Column): Column =
    when(pmod(xxhash64(lit(plane), d), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** nBits-bit random-hyperplane signature per embedding. */
  def hyperplaneSignature(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int): DataFrame = {
    val projections = (0 until nBits).map { p =>
      // projection_p = Σ_d emb[d] * sign(hash(p, d))
      aggregate(zip_with(col(embCol).cast("array<double>"),
        sequence(lit(0), size(col(embCol)) - 1),
        (x, d) => x * planeSign(p, d)), lit(0.0), (acc, x) => acc + x)
    }
    val sig = projections.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (proj, p)) =>
        acc.bitwiseOR(when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L))
    }
    embeddings.select(col(idCol), col(embCol), sig.as("lsh_sig"))
  }

  /** LSH-bucketed near-neighbour pairs: same signature bucket, then
    * exact cosine ≥ threshold within the bucket.
    */
  def lshNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, nBits: Int, threshold: Double): DataFrame = {
    val sigs = hyperplaneSignature(embeddings, embCol, idCol, nBits)
    val l = sigs.as("l")
    val r = sigs.as("r")
    val pairDot = aggregate(
      zip_with(col(s"l.$embCol").cast("array<double>"),
        col(s"r.$embCol").cast("array<double>"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    def norm(side: String) = sqrt(aggregate(
      col(s"$side.$embCol").cast("array<double>"), lit(0.0),
      (acc, x) => acc + x * x))
    l.join(r, col("l.lsh_sig") === col("r.lsh_sig") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", pairDot / (norm("l") * norm("r")))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("cos"))
  }

  /** exact (brute-force) near-dup pairs — the small-SF oracle twin of
    * [[lshNearDupPairs]]; at scale the LSH path replaces the cross join.
    */
  def exactNearDupPairs(embeddings: DataFrame, embCol: String,
      idCol: String, threshold: Double): DataFrame = {
    val l = embeddings.as("l")
    val r = embeddings.as("r")
    val pairDot = aggregate(
      zip_with(col(s"l.$embCol").cast("array<double>"),
        col(s"r.$embCol").cast("array<double>"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    def norm(side: String) = sqrt(aggregate(
      col(s"$side.$embCol").cast("array<double>"), lit(0.0),
      (acc, x) => acc + x * x))
    l.join(r, col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", pairDot / (norm("l") * norm("r")))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("cos"))
  }
}
