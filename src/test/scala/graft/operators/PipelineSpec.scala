package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences chunks each group's running token stream") {
    val docs = Seq(
      // source a: tokens 3,4,5 — cum-starts 0,3,7 → bins 0,0,0 @10;
      // then 6 starts at 12 → bin 1
      (1L, "a", 3L), (2L, "a", 4L), (3L, "a", 5L), (4L, "a", 6L),
      // source b packs independently: 9 starts at 0 → bin 0; 9 starts
      // at 9 → bin 0 (its first token is the 10th overall? no: offset
      // 9 < 10 ⇒ bin 0); 9 starts at 18 → bin 1
      (5L, "b", 9L), (6L, "b", 9L), (7L, "b", 9L)
    ).toDF("doc_id", "source", "toks")
    val out = Pipeline.packSequences(docs, "doc_id", "source",
        col("toks"), 10L)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L,
      5L -> 0L, 6L -> 0L, 7L -> 1L))
  }

  test("packSequences on real documents matches a sequential rescan") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val out = Pipeline.packSequences(docs, "doc_id", "source",
        size(split(col("text"), "\\s+")), 512L)
      .select($"source", $"doc_id", $"tokens", $"bin")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      // re-derive the concat-then-chunk rule with a plain sequential
      // scan per source: a doc's bin is where its first token lands
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, id, toks, bin) =>
        assert(bin == cum / 512L, s"$src doc $id")
        cum += toks
      }
    }
  }
}
