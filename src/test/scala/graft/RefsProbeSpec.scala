package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

class RefsProbeSpec extends AnyFunSuite {
  test("probe") {
    val c = coalesce(col("__asof_3"), lit(0))
    val e = GraftBridge.expression(c)
    info("EXPRCLASS " + e.getClass)
    info("EXPR " + e.toString)
    info("KIDS " + e.children.map(_.getClass).toString)
    val attrs = e.collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.nameParts.head }
    info("ATTRS " + attrs.toString)
  }
}
