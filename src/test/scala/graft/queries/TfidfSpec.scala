package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of [[AnalyticsExtras.tfidfTopTerms]] on a planted corpus
  * with hand-computed weights (N=3; ln(4/2) and ln(4/3) idf classes).
  */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry durian cherry durian")).toDF("doc_id", "text")

  test("top-1 term per doc: highest tf*idf, ties broken by term") {
    val top1 = AnalyticsExtras.tfidfTopTerms(corpus, "doc_id", "text", 1)
      .orderBy("doc_id")
      .select("doc_id", "term", "tf", "df", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // doc1: apple tf=2 df=1 → 2·ln(4/2)=1.3863 beats banana 0.2877
    // doc2: banana and cherry tie at ln(4/3)=0.2877 → term asc wins
    // doc3: durian 2·ln(4/2) beats cherry 2·ln(4/3)
    assert(top1.toSeq == Seq(
      (1L, "apple", 2L, 1L, 1.3863),
      (2L, "banana", 1L, 2L, 0.2877),
      (3L, "durian", 2L, 1L, 1.3863)))
  }

  test("k covers all terms; scores match hand-computed ln weights") {
    val all = AnalyticsExtras.tfidfTopTerms(corpus, "doc_id", "text", 10)
      .filter(col("doc_id") === 3L)
      .orderBy(col("score").desc, col("term"))
      .collect().map(r => (r.getAs[String]("term"),
        r.getAs[Double]("score")))
    assert(all.toSeq == Seq(("durian", 1.3863), ("cherry", 0.5754)))
  }

  test("rank is dense within a doc and respects k") {
    val k2 = AnalyticsExtras.tfidfTopTerms(corpus, "doc_id", "text", 2)
    assert(k2.groupBy("doc_id").count().collect()
      .forall(_.getLong(1) <= 2))
    // doc2 has exactly two distinct terms
    assert(k2.filter(col("doc_id") === 2L).count() == 2)
  }
}
