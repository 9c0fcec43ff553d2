package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Dedup, Multimodal}

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
  private def embs(s: SparkSession, dir: String) =
    Tables(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact n-gram Jaccard near-dup pairs (integer-exact threshold 1/2)
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.exactJaccardPairs(docs(s, dir), "doc_id", "text", 3, 1, 2)
        .orderBy("doc_a", "doc_b")),

    // MinHash+LSH candidates verified by exact Jaccard — the scale path
    // of dedup_ngram_jaccard (rows-only; recall tested in DedupSpec)
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // SimHash near-dups within Hamming distance 3 (rows-only)
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // brute-force cosine top-10 against vec_id=0's embedding
    "ann_cosine_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.cosineTopK(embs(s, dir), "embedding", "vec_id", q, 10)
        .select(col("vec_id"), round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    // embedding near-dup pairs (exact twin of the LSH path)
    "ann_near_dup" -> ((s, dir) =>
      Ann.exactNearDupPairs(embs(s, dir), "embedding", "vec_id", 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos"))
        .orderBy("id_a", "id_b")),

    // multimodal: binary payloads → per-partition decode (stub codec) →
    // typed metadata aggregation
    "multimodal_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.demoMedia(s, dir), "media_id",
        "payload")
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("width_sum"),
          sum(col("n_frames").cast("long")).as("frames_sum"),
          sum("n_bytes").as("bytes_sum"))
        .orderBy("format"))
  )

  val oracle: Map[String, String] = Map(
    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id AS id,
               string_split_regex(text, '\s+') AS ws FROM documents),
         g AS (SELECT DISTINCT id,
                 ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
               FROM w, UNNEST(range(greatest(len(ws)-2, 0))) AS t(i)),
         s AS (SELECT id, count(*) AS nset FROM g GROUP BY id),
         c AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS common
               FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
               GROUP BY 1, 2)
         SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
              CAST(sa.nset AS BIGINT) AS na, CAST(sb.nset AS BIGINT) AS nb
         FROM c JOIN s sa ON sa.id = doc_a JOIN s sb ON sb.id = doc_b
         WHERE 2 * common >= (sa.nset + sb.nset - common)
         ORDER BY doc_a, doc_b""",
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
               FROM embeddings, q)
         SELECT vec_id, round(cos, 5) AS cos FROM c
         ORDER BY cos DESC, vec_id LIMIT 10""",
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
    "multimodal_decode_meta" ->
      """WITH m AS (SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n,
               CASE length(text) % 3 WHEN 0 THEN 'image'
                 WHEN 1 THEN 'audio' ELSE 'video' END AS format
             FROM documents)
         SELECT format, count(*) AS n,
           CAST(sum(16 + n % 624) AS BIGINT) AS width_sum,
           CAST(sum(1 + n % 24) AS BIGINT) AS frames_sum,
           CAST(sum(n) AS BIGINT) AS bytes_sum
         FROM m GROUP BY format ORDER BY format"""
  )
}
