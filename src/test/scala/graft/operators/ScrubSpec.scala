package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): Row =
    Scrub.scrub(Seq((1L, text)).toDF("id", "text"), "text")
      .select("n_email", "n_ipv4", "n_hex_secret", "scrubbed")
      .head()

  test("counts and replaces each rule's matches") {
    val r = one("mail a@b.co and c.d@e-f.org from 10.0.0.1, " +
      "key 0123456789abcdef0123456789abcdef done")
    assert(r == Row(2, 1, 1,
      "mail <EMAIL> and <EMAIL> from <IP>, key <SECRET> done"))
  }

  test("text without PII passes through untouched") {
    val r = one("just ordinary words 42 and a.b")
    assert(r == Row(0, 0, 0, "just ordinary words 42 and a.b"))
  }

  test("over-redaction is deliberate: invalid dotted quads redact") {
    val r = one("v 999.999.999.999 w")
    assert(r == Row(0, 1, 0, "v <IP> w"))
  }

  test("earlier rules shadow later ones: a hex local part is gone " +
      "before the secret rule runs") {
    val r = one("0123456789abcdef0123456789abcdef@example.com")
    assert(r == Row(1, 0, 0, "<EMAIL>"))
  }

  test("31 hex chars is not a secret; 32 is") {
    assert(one("x " + "a" * 31 + " y").getInt(2) == 0)
    assert(one("x " + "a" * 32 + " y").getInt(2) == 1)
  }

  test("report aggregates per group with chars_removed") {
    val docs = Seq(
      ("s0", "a@b.co"), // 6 chars -> 7: removes -1
      ("s0", "no pii here"),
      ("s1", "ip 10.1.2.3 twice 10.1.2.4")).toDF("source", "text")
    val rows = Scrub.report(docs, "text", "source")
      .orderBy("source").collect()
    assert(rows(0) == Row("s0", 2L, 1L, 0L, 0L, -1L))
    assert(rows(1) == Row("s1", 1L, 0L, 2L, 0L,
      ("ip 10.1.2.3 twice 10.1.2.4".length
        - "ip <IP> twice <IP>".length).toLong))
  }

  test("the scrub projection is map-side codegen: no exchange before " +
      "the report aggregation, no UDFs") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val p = Scrub.report(docs, "text", "source")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p) // only the agg
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }
}
