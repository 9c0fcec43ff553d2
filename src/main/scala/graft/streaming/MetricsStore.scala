package graft.streaming

import scala.collection.mutable

import graft.mtail.Snapshot.{Cell, VFloat, VInt, VStr, Value}

/** Driver-side cumulative metric store for streaming mode — the analogue
  * of the reference's shared Store (`internal/metrics/store.go:19-23`),
  * fed by per-microbatch snapshots from `foreachBatch` and served by the
  * exporters.
  *
  * Merge semantics per kind (later batch = later arrival):
  * counters add, gauges/timers/text take the newer batch's value,
  * timestamps take the max. Scale note: only final AGGREGATED cells ever
  * reach the driver — cardinality = number of exported label tuples, not
  * input rows.
  */
final class MetricsStore {

  private val cells = mutable.LinkedHashMap[(String, Map[String, String]),
    Cell]()
  private val lock = new Object

  /** a counter/histogram cell that carries no delta — the per-batch
    * zero-init no-op merge (0 @ epoch-0), or a batch that observed
    * nothing — must not move the datum stamp.
    */
  private def isZeroDelta(c: Cell): Boolean = c.kind match {
    // a SET-written counter cell carrying 0 is a genuine write (Iset
    // to zero), not a no-op delta
    case "counter" if c.wasSet.getOrElse(false) => false
    case "counter" => c.value match {
      case VInt(0) => true
      case VFloat(v) => v == 0.0
      case _ => false
    }
    case "histogram" =>
      c.buckets.flatMap(_.get("count")).getOrElse(0L) == 0L
    case _ => false
  }

  /** `concatNames`: text metrics built by `+=` — each batch carries
    * its LOCAL ordered concat, so the store appends like counters sum
    * (last-write-replace would drop every earlier batch's suffix).
    */
  def merge(batch: Seq[Cell],
      concatNames: Set[String] = Set.empty): Unit = lock.synchronized {
    batch.foreach { c =>
      val key = (c.name, c.labels)
      cells.get(key) match {
        // a Dload-created-only cell INSERTS IF ABSENT and never
        // touches a live cell: the datum existed but was never
        // updated (GetDatum creation, round 18)
        case Some(_) if c.createOnly => ()
        case None => cells(key) = c
        case Some(prev) =>
          // Batches arrive in stream order, and the VM datum keeps the
          // LAST write's stamp (datum.SetTime on every update) — even
          // when settime moved the clock BACKWARDS, and even when the
          // last write carried NO timestamp at all — so a batch that
          // actually wrote the cell owns the timestamp VERBATIM. Only
          // the no-delta merges (zero-init, empty-observation batches)
          // fall back to max, so they can never regress a live stamp.
          // Found by the 300-iteration equivalence fuzz: maxTs
          // unconditionally applied diverged from one-shot when a
          // later batch's settime was older or absent.
          val ts =
            if (isZeroDelta(c)) maxTs(prev.tsSec, c.tsSec)
            else c.tsSec
          val merged = c.kind match {
            case "histogram" =>
              // Buckets accumulate over the whole stream like the
              // reference's datum.Buckets.Observe (datum/buckets.go:42-57):
              // per-bucket counts and the "count" entry add, sum (the cell
              // value) adds.
              c.copy(value = addValues(prev.value, c.value), tsSec = ts,
                buckets = addBuckets(prev.buckets, c.buckets))
            case "text" | "counter" | "gauge" | "timer"
                if concatNames(c.name) &&
                  !c.wasSet.getOrElse(false) =>
              // pure-`+=` batch of a String-VALUED metric (text kind,
              // or a String-PINNED counter/gauge/timer — TypeInfer):
              // append the local concat; a batch whose fold saw a set
              // (wasSet) falls through to replace — Iset makes the
              // batch value authoritative. Pre-r19 only kind==text
              // appended; String-pinned counters hit the numeric add
              // arms, whose (VStr,VStr) merge REPLACED, dropping every
              // earlier batch's suffix vs the VM's single growing
              // datum (ADVICE r18).
              c.copy(value = catValues(prev.value, c.value), tsSec = ts)
            // the batch fold reports HOW it wrote the cell: a set-write
            // makes the batch value authoritative (Iset replaces the
            // datum), pure increments add to the running cell — for ANY
            // numeric kind (`counter c; c = 5` is last-write on the VM,
            // `gauge g; g++` accumulates). Cells without the flag (the
            // engine's own counters, test fixtures) keep the kind
            // default.
            case "counter" if !c.wasSet.getOrElse(false) =>
              c.copy(value = addValues(prev.value, c.value), tsSec = ts)
            case "gauge" | "timer" if !c.wasSet.getOrElse(true) =>
              c.copy(value = addValues(prev.value, c.value), tsSec = ts)
            case _ => // set-written (or text): newer batch wins
              c.copy(tsSec = ts)
          }
          cells(key) = merged
      }
    }
  }

  private def catValues(a: Value, b: Value): Value = (a, b) match {
    case (VStr(x), VStr(y)) => VStr(x + y)
    case (_, n) => n
  }

  private def addValues(a: Value, b: Value): Value = (a, b) match {
    case (VInt(x), VInt(y)) => VInt(x + y)
    case (VFloat(x), VFloat(y)) => VFloat(x + y)
    case (VFloat(x), VInt(y)) => VFloat(x + y)
    case (VInt(x), VFloat(y)) => VFloat(x + y)
    case (_, n) => n
  }

  private def addBuckets(a: Option[Map[String, Long]],
      b: Option[Map[String, Long]]): Option[Map[String, Long]] = (a, b) match {
    case (Some(x), Some(y)) =>
      Some((x.keySet ++ y.keySet).map { k =>
        k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))
      }.toMap)
    case _ => a.orElse(b)
  }

  private def maxTs(a: Option[Long], b: Option[Long]): Option[Long] =
    (a ++ b).reduceOption(_ max _)

  /** Remove one cell — the runtime `del` reaching the cumulative
    * store (the reference's metric.RemoveDatum via the VM's Delete,
    * `metric.go:223-258`): streaming batches propagate the label
    * tuples whose delete fired, so a cell merged in an earlier batch
    * does not survive a later `del`. Unknown keys are a no-op. A
    * restarted metric (updates after the del in the same batch) is
    * re-created by the following merge of the batch snapshot.
    */
  def remove(name: String, labels: Map[String, String]): Unit =
    lock.synchronized { cells -= ((name, labels)) }

  def snapshot(): Seq[Cell] = lock.synchronized { cells.values.toSeq }

  def clear(): Unit = lock.synchronized { cells.clear() }

  /** GC pass — the analogue of the reference store's expiry loop
    * (`internal/metrics/store.go:156-203`): removes cells whose
    * `del … after d` TTL has lapsed since their last update, and trims
    * metrics declared `limit N` to the N newest cells by datum
    * timestamp (`metric.go:184-198`). `nowSec` is stream time (max
    * observed event time) rather than the reference's wall clock, so
    * replays of historical logs expire deterministically; the two
    * coincide when timestamps are ingest times. Returns cells removed.
    */
  def gc(nowSec: Long, ttlSeconds: Map[String, Long],
      limits: Map[String, Int]): Int = lock.synchronized {
    var removed = 0
    ttlSeconds.foreach { case (name, ttl) =>
      val expired = cells.keys
        .filter { case (n, _) => n == name }
        .filter(k => cells(k).tsSec.exists(_ + ttl <= nowSec)).toSeq
      expired.foreach { k => cells.remove(k); removed += 1 }
    }
    limits.foreach { case (name, n) =>
      val ks = cells.keys.filter(_._1 == name).toSeq
      if (ks.size > n) {
        val drop = ks.sortBy(k => cells(k).tsSec.getOrElse(0L))
          .dropRight(n)
        drop.foreach { k => cells.remove(k); removed += 1 }
      }
    }
    removed
  }
}

/** Pure formatters over store cells — ports of the reference's sink
  * encoders (`internal/exporter/{prometheus,json,varz,graphite,statsd,
  * collectd}.go`). Each is a total function Seq[Cell] → String, trivially
  * unit-testable and usable from any transport.
  */
object Exporters {

  private def valueString(v: Value): String = v match {
    case VInt(x) => x.toString
    case VFloat(x) =>
      // datum.Float.ValueString is Go's %g (float.go:21-23): shortest
      // round-trip, scientific past 1e6/1e-4 ("2e+06", not "2000000.0");
      // specials render NaN/+Inf/-Inf (Java's "Infinity" would make
      // Prometheus reject the scrape)
      graft.mtail.GoFmt.g(x)
    case VStr(s) => s
  }

  /** Prometheus text-format label-value escaping, as client_golang's
    * expfmt does it (the reference gets this for free from
    * prometheus.go's MustNewConstMetric): backslash, double-quote and
    * newline — labels come from regex captures over raw log lines, so
    * all three occur in practice and one unescaped value would make
    * Prometheus reject the whole scrape.
    */
  private def promEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** HELP-line escaping: only backslash and newline (expfmt rules). */
  private def promHelpEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n")

  /** JSON string escaping (encoding/json's mandatory set): quote,
    * backslash, and control characters.
    */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** export.go:161-178: ksep/sep join with replacement of separators. */
  def formatLabels(name: String, labels: Map[String, String], ksep: String,
      sep: String, rep: String): String = {
    if (labels.isEmpty) name
    else {
      val parts = labels.toSeq.sortBy(_._1).map { case (k, v) =>
        val k1 = k.replace(ksep, rep).replace(sep, rep)
        val v1 = v.replace(ksep, rep).replace(sep, rep)
        s"$k1$ksep$v1"
      }
      name + sep + parts.mkString(sep)
    }
  }

  /** Prometheus text exposition (prometheus.go:31-99): one TYPE line per
    * metric, cells as `name{prog=…,labels…} value`.
    *
    * `emitTimestamp` is the reference's opt-in flag
    * (prometheus.go:89-93, NewMetricWithTimestamp): each sample line
    * gains the datum time in MILLISECONDS. Off by default — like the
    * reference, which warns that stamped samples can trip Prometheus
    * staleness handling.
    */
  def prometheus(cells: Seq[Cell], program: String,
      omitProgLabel: Boolean = false,
      emitTimestamp: Boolean = false): String =
    prometheusMulti(Seq(program -> cells), omitProgLabel, emitTimestamp)

  /** Prometheus exposition over SEVERAL programs' stores on one
    * endpoint — the reference daemon's single registry over every
    * loaded VM. Same-name metrics from different programs merge into
    * ONE `# TYPE` family (duplicate TYPE blocks are a text-format
    * violation), distinguished per sample by the `prog` label, exactly
    * as client_golang renders mtail's shared registry.
    */
  def prometheusMulti(byProg: Seq[(String, Seq[Cell])],
      omitProgLabel: Boolean = false,
      emitTimestamp: Boolean = false): String = {
    val sb = new StringBuilder
    // text metrics have no Prometheus representation and are skipped,
    // like the reference (prometheus.go:38-40); a raw string sample
    // value would make the whole exposition unparseable
    val byName = byProg
      .flatMap { case (p, cs) => cs.filter(_.kind != "text").map(p -> _) }
      .groupBy(_._2.name).toSeq.sortBy(_._1)
    byName.foreach { case (name, pcs) =>
      val cs = pcs.map(_._2)
      val promName = name.replace("-", "_") // noHyphens
      val promType = cs.head.kind match {
        case "counter" => "counter"
        case "gauge" | "timer" => "gauge"
        case other => other
      }
      // client_golang HELP line; the reference fills it with the
      // defining source (prometheus.go:67-68,76-77) — first defining
      // program wins when several share the family
      sb.append(s"# HELP $promName defined at ${
        promHelpEscape(pcs.head._1)}\n")
      sb.append(s"# TYPE $promName $promType\n")
      pcs.foreach { case (program, c) =>
        val labels = (if (omitProgLabel) c.labels
        else c.labels + ("prog" -> program)).toSeq.sortBy(_._1)
        def labelStr(extra: (String, String)*) = {
          val all = labels ++ extra
          if (all.isEmpty) ""
          else all.map { case (k, v) => s"""$k="${promEscape(v)}"""" }
            .mkString("{", ",", "}")
        }
        // zero datum time renders as epoch-0, like time.Time zero →
        // UnixMilli on a never-updated datum in the reference
        val ts = if (emitTimestamp) s" ${c.tsSec.getOrElse(0L) * 1000}"
          else ""
        c.buckets match {
          case Some(bs) =>
            // cumulative buckets like the reference's prometheus export
            // (datum/datum.go:240-259): le="x" counts are cumulative
            val bounds = bs.keys.filter(k => k != "count" && k != "+Inf")
              .toSeq.sortBy(_.toDouble)
            var cum = 0L
            bounds.foreach { b =>
              cum += bs(b)
              sb.append(
                s"${promName}_bucket${labelStr("le" -> b)} $cum$ts\n")
            }
            cum += bs.getOrElse("+Inf", 0L)
            sb.append(
              s"${promName}_bucket${labelStr("le" -> "+Inf")} $cum$ts\n")
            sb.append(s"${promName}_sum${labelStr()} ${
              valueString(c.value)}$ts\n")
            sb.append(s"${promName}_count${labelStr()} ${
              bs.getOrElse("count", 0L)}$ts\n")
          case None =>
            sb.append(
              s"$promName${labelStr()} ${valueString(c.value)}$ts\n")
        }
      }
    }
    sb.toString
  }

  /** JSON store dump (json.go:17-30): mtail's exact field shape. */
  def json(cells: Seq[Cell], program: String, keys: Map[String,
      Seq[String]]): String =
    jsonMulti(Seq((program, cells, keys)))

  /** JSON dump over several programs' stores — one list, each metric
    * stamped with its own Program field, like the reference store's
    * WriteMetrics over every loaded program's metrics.
    */
  def jsonMulti(
      byProg: Seq[(String, Seq[Cell], Map[String, Seq[String]])])
      : String = {
    val kindNum = Map("counter" -> 1, "gauge" -> 2, "timer" -> 3,
      "text" -> 4, "histogram" -> 5)
    def typNum(v: Value) = v match {
      case VInt(_) => 0
      case VFloat(_) => 1
      case VStr(_) => 2
    }
    val groups = byProg.flatMap { case (program, cells, keys) =>
      cells.groupBy(_.name).toSeq.map { case (name, cs) =>
        (name, program, cs, keys) }
    }.sortBy { case (name, program, _, _) => (name, program) }
    val metrics = groups.map { case (name, program, cs, keys) =>
      val ks = keys.getOrElse(name, Nil)
      val lvs = cs.map { c =>
        val labelsJson =
          if (ks.isEmpty) ""
          else {
            val vals = ks.map(k =>
              "\"" + jsonEscape(c.labels.getOrElse(k, "")) + "\"")
            s""""Labels": [${vals.mkString(", ")}], """
          }
        val tsNanos = c.tsSec.getOrElse(0L) * 1000000000L
        val vj = c.value match {
          case VStr(s) => "\"" + jsonEscape(s) + "\""
          // the JSON dump goes through encoding/json, whose float rule
          // differs from %g: plain decimal unless |x|<1e-6 or >=1e21
          // (json renders 2e+06 as "2000000"; varz renders it "2e+06")
          case VFloat(x) => graft.mtail.GoFmt.jsonNumber(x)
          case other => valueString(other)
        }
        s"""{$labelsJson"Value": {"Value": $vj, "Time": $tsNanos}}"""
      }
      val keysJson =
        if (ks.isEmpty) ""
        else s""""Keys": [${
          ks.map("\"" + jsonEscape(_) + "\"").mkString(", ")}], """
      s"""{"Name": "${jsonEscape(name)}", "Program": "${
        jsonEscape(program)}", "Kind": ${
        kindNum(cs.head.kind)}, "Type": ${typNum(cs.head.value)}, $keysJson"LabelValues": [${
        lvs.mkString(", ")}]}"""
    }
    s"[${metrics.mkString(", ")}]"
  }

  /** varz (varz.go:18,46-60): `name{sorted_labels,prog=…,instance=…} v`. */
  def varz(cells: Seq[Cell], program: String, hostname: String,
      omitProgLabel: Boolean = false): String =
    cells.map { c =>
      val s = c.labels.map { case (k, v) => s"$k=$v" }.toSeq.sorted
      val withProg = if (omitProgLabel) s else s :+ s"prog=$program"
      val all = withProg :+ s"instance=$hostname"
      s"${c.name}{${all.mkString(",")}} ${valueString(c.value)}\n"
    }.mkString

  /** varz over several programs' stores, prog-labelled per line
    * (unless `-emit_prog_label=false` — varz.go:52-54 is the only
    * other format the reference's omitProgLabel reaches).
    */
  def varzMulti(byProg: Seq[(String, Seq[Cell])], hostname: String,
      omitProgLabel: Boolean = false): String =
    byProg.map { case (p, cs) =>
      varz(cs, p, hostname, omitProgLabel) }.mkString

  /** graphite (graphite.go:55-92): `prefix prog.name.labels value ts`. */
  def graphite(cells: Seq[Cell], program: String,
      prefix: String = ""): String =
    cells.filter(_.kind != "text").map { c =>
      val path = formatLabels(c.name, c.labels, ".", ".", "_")
      s"$prefix$program.$path ${valueString(c.value)} ${
        c.tsSec.getOrElse(0L)}\n"
    }.mkString

  /** statsd (statsd.go:27-41): `prefix prog.name.labels:value|type`. */
  def statsd(cells: Seq[Cell], program: String,
      prefix: String = ""): String =
    cells.filter(_.kind != "text").map { c =>
      val t = c.kind match {
        case "counter" => "c"
        case "timer" => "ms"
        case _ => "g"
      }
      val path = formatLabels(c.name, c.labels, ".", ".", "_")
      s"$prefix$program.$path:${valueString(c.value)}|$t"
    }.mkString("\n")

  /** collectd (collectd.go:18,33-50):
    * PUTVAL "host/prefix mtail-prog/kind-name" interval=n ts:value
    */
  def collectd(cells: Seq[Cell], program: String, hostname: String,
      prefix: String = "", intervalSecs: Long = 60): String =
    cells.filter(_.kind != "text").map { c =>
      val kindType = if (c.kind == "timer") "gauge" else c.kind
      val path = formatLabels(c.name, c.labels, "-", "-", "_")
      "PUTVAL \"" + hostname + "/" + prefix + "mtail-" + program + "/" +
        kindType + "-" + path + "\" interval=" + intervalSecs + " " +
        c.tsSec.getOrElse(0L) + ":" + valueString(c.value) + "\n"
    }.mkString
}
