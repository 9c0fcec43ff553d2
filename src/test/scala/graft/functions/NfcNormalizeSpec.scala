package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NfcNormalize(col("t")).as("n")).head().getString(0)

  test("composes decomposed sequences to NFC") {
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("nai\u0308ve") == "na\u00efve")
  }

  test("already-NFC text is unchanged, ASCII included") {
    assert(norm("caf\u00e9 na\u00efve") == "caf\u00e9 na\u00efve")
    assert(norm("plain ascii 42") == "plain ascii 42")
    assert(norm("") == "")
  }

  test("already-normalized input returns the SAME UTF8String object " +
      "(no copy on the common path)") {
    val u = UTF8String.fromString("hello world")
    assert(NfcNormalize.nfc(u) eq u)
    val d = UTF8String.fromString("e\u0301")
    assert(NfcNormalize.nfc(d).toString == "\u00e9")
  }

  test("null propagates") {
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(NfcNormalize(col("t"))).head()
    assert(r.isNullAt(0))
  }

  test("compiles under whole-stage codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("a\u0301b", "ok").toDF("t")
        .select(NfcNormalize(col("t")).as("n"))
        .collect().map(_.getString(0)).toSeq
      assert(out == Seq("\u00e1b", "ok"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("registered on the SQL surface as nfc_normalize") {
    graft.GraftFunctions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301')")
      .head().getString(0) == "caf\u00e9")
  }
}
