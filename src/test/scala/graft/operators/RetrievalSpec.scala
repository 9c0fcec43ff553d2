package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: "rare" in exactly one, "common" everywhere with varying
  // tf and dl — enough to see idf dominance and tf saturation
  private val corpus = Seq(
    (1L, "rare common filler words here"),
    (2L, "common common common common common common common common " +
      "common common filler filler filler filler filler filler"),
    (3L, "common filler"),
    (4L, "filler words only nothing else")
  ).toDF("doc_id", "text")

  private def bm25(docs: org.apache.spark.sql.DataFrame) =
    Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), k1 = 1.2, b = 0.75, topK = 10)

  test("bm25 ranks the rare-term doc first and scores absent docs 0") {
    val rows = bm25(corpus).as[(Long, Double, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L), rows)
    val byId = rows.map(r => r._1 -> r).toMap
    // doc 1 matches both terms, doc 4 neither
    assert(byId(1L)._3 == 2L && byId(4L)._3 == 0L)
    assert(byId(4L)._2 == 0.0)
    // tf saturation: doc 2 carries 10× doc 3's tf of "common" but
    // scores well under 10× doc 3 (and under idf(common) entirely)
    assert(byId(2L)._2 > byId(3L)._2)
    assert(byId(2L)._2 < 10 * byId(3L)._2)
  }

  test("bm25 scores reproduce the quantized-idf closed form") {
    val rows = bm25(corpus).as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // replicate the contract: idf = round(ln((N-df+.5)/(df+.5)+1)e6),
    // weight = tf/(tf + k1(1-b+b·dl/avgdl)), fixed term order
    val stats = Map[Long, (Long, Seq[Long])](
      1L -> (5L, Seq(1L, 1L)), 2L -> (16L, Seq(0L, 10L)),
      3L -> (2L, Seq(0L, 1L)), 4L -> (5L, Seq(0L, 0L)))
    val n = 4.0
    val avgdl = stats.values.map(_._1).sum.toDouble / n
    val dfs = Seq(1.0, 3.0)
    def idf(df: Double) =
      math.round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
        .toDouble
    for ((id, (dl, tfs)) <- stats) {
      val score = tfs.zip(dfs).map { case (tf, df) =>
        idf(df) * (tf / (tf + 1.2 *
          (0.25 + 0.75 * (dl.toDouble / avgdl))))
      }.reduceLeft(_ + _)
      val expect = BigDecimal(score / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(id) == expect, s"doc $id: ${rows(id)} vs $expect")
    }
  }

  test("bm25 ties break by doc id inside the k boundary") {
    val dup = Seq(
      (9L, "same text"), (7L, "same text"), (8L, "same text")
    ).toDF("doc_id", "text")
    val rows = Retrieval.bm25TopK(dup, "doc_id", "text", Seq("same"),
      1.2, 0.75, topK = 2).as[(Long, Double, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(7L, 8L))
  }

  test("bm25 plan: corpus row broadcasts, top-k is an ordered take, " +
      "text never shuffles") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "spark"), 1.2, 0.75, 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("hashpartitioning(text"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tokenEntropy: 0 for a one-token distribution, ln k for a " +
      "uniform k-token doc, token-less docs dropped") {
    val docs = Seq(
      (1L, "x x x x"), (2L, "a b c d"), (3L, "a a b b"), (4L, "  ")
    ).toDF("doc_id", "text")
    val rows = Retrieval.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, 4L, 1L, 0.0),
      (2L, 4L, 4L, 1.3863), // round(mln(4)/1e6, 4) = ln 4
      (3L, 4L, 2L, 0.6931)  // ln 2
    ), rows)
  }

  test("tokenEntropy is one map-side scan: no shuffle at all") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Retrieval.tokenEntropy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      p)
    assert(!p.contains("hashpartitioning"), p)
  }
}
