package graft.mtail

/** Normalized metric-cell model used for golden-file comparison, porting
  * the parsing rules of `internal/mtail/golden/reader.go:20-156`.
  */
object Snapshot {

  sealed trait Value
  final case class VInt(v: Long) extends Value
  final case class VFloat(v: Double) extends Value
  final case class VStr(v: String) extends Value

  /** tsSec None ⇔ Go's zero time.Time{} (datum never stamped);
    * buckets: histogram upper-bound → count (plus "count"), else None.
    * wasSet: whether the producing batch SET the cell (its value then
    * REPLACES the store cell on merge) or only incremented it (the
    * value ADDS) — None falls back to the kind's default
    * (counter/histogram add, gauge/timer/text replace).
    */
  /** createOnly: the cell exists only because a Dload touched it
    * (a read, or a load whose statement later aborted) — on store
    * merge it INSERTS IF ABSENT and never overwrites a live cell
    * (metric.go GetDatum creates; the datum itself was never
    * updated).
    */
  final case class Cell(kind: String, name: String,
      labels: Map[String, String], value: Value, tsSec: Option[Long],
      buckets: Option[Map[String, Long]] = None,
      wasSet: Option[Boolean] = None,
      createOnly: Boolean = false)

  private val varRe =
    """^(counter|gauge|timer|text|histogram) ([^ ]+)(?: \{([^}]+)\})?(?: (\S+))?(?: (.+))?""".r

  /** Parse a golden file into cells (reader.go semantics, including the
    * float-zero-is-string quirk and zero-init of scalar counters).
    */
  def readGolden(lines: Iterator[String]): Seq[Cell] = {
    val cells = scala.collection.mutable.LinkedHashMap[(String, String,
      Map[String, String]), Cell]()
    val seenScalarCounter = scala.collection.mutable.Set[String]()

    lines.foreach { text =>
      varRe.findFirstMatchIn(text).foreach { m =>
        val kind = m.group(1)
        val name = m.group(2)
        val labels: Map[String, String] =
          Option(m.group(3)).map { body =>
            body.split(",").map { pair =>
              val kv = pair.split("=", 2)
              kv(0) -> (if (kv.length < 2 || kv(1) == "\"\"") ""
              else kv(1))
            }.toMap
          }.getOrElse(Map.empty)

        // zero-init: a scalar counter line creates a 0 @ epoch-0 cell
        // first (reader.go:107-119); an explicit value then overwrites it
        if (kind == "counter" && labels.isEmpty &&
          !seenScalarCounter(name)) {
          seenScalarCounter += name
          cells((kind, name, Map.empty)) =
            Cell(kind, name, Map.empty, VInt(0), Some(0L))
        }

        Option(m.group(4)).foreach { vs =>
          val value: Value =
            vs.toLongOption.map(VInt.apply).getOrElse {
              vs.toDoubleOption match {
                // reader.go:76-80: float-parse failure OR parsed 0.0 →
                // treat as String
                case Some(f) if f != 0.0 => VFloat(f)
                case _ => VStr(vs)
              }
            }
          val tsSec: Option[Long] = Option(m.group(5)).flatMap { t =>
            try Some(java.time.Instant.parse(t).getEpochSecond)
            catch {
              case _: Exception => t.toLongOption.map(_ / 1000000000L)
            }
          }
          cells((kind, name, labels)) = Cell(kind, name, labels, value, tsSec)
        }
      }
    }
    cells.values.toSeq
  }

  /** Collect a PlanBuilder snapshot DataFrame into cells. */
  def collect(df: org.apache.spark.sql.DataFrame): Seq[Cell] = {
    df.collect().toSeq.map { r =>
      val kind = r.getAs[String]("kind")
      val name = r.getAs[String]("name")
      val labels = Option(r.getAs[Map[String, String]]("labels"))
        .getOrElse(Map.empty)
      val value: Value = r.getAs[String]("type") match {
        case "Int" => VInt(r.getAs[Long]("ival"))
        case "Float" => VFloat(r.getAs[Double]("fval"))
        case _ => VStr(r.getAs[String]("sval"))
      }
      val tsSec =
        if (r.isNullAt(r.fieldIndex("ts_micros"))) None
        else Some(Math.floorDiv(r.getAs[Long]("ts_micros"), 1000000L))
      val buckets =
        if (!r.schema.fieldNames.contains("buckets") ||
          r.isNullAt(r.fieldIndex("buckets"))) None
        else Some(r.getAs[Map[String, Long]]("buckets"))
      val wasSet =
        if (!r.schema.fieldNames.contains("was_set") ||
          r.isNullAt(r.fieldIndex("was_set"))) None
        else Some(r.getAs[Boolean]("was_set"))
      val createOnly = r.schema.fieldNames.contains("create_only") &&
        !r.isNullAt(r.fieldIndex("create_only")) &&
        r.getAs[Boolean]("create_only")
      Cell(kind, name, labels, value, tsSec, buckets, wasSet,
        createOnly)
    }
  }

  /** Human-readable diff; empty string means equal. */
  def diff(expected: Seq[Cell], actual: Seq[Cell]): String = {
    def key(c: Cell) = (c.name, c.labels.toSeq.sorted.mkString(","))
    val e = expected.map(c => key(c) -> c).toMap
    val a = actual.map(c => key(c) -> c).toMap
    val sb = new StringBuilder
    (e.keySet -- a.keySet).toSeq.sorted.foreach(k =>
      sb.append(s"missing: ${e(k)}\n"))
    (a.keySet -- e.keySet).toSeq.sorted.foreach(k =>
      sb.append(s"unexpected: ${a(k)}\n"))
    (e.keySet & a.keySet).toSeq.sorted.foreach { k =>
      // wasSet/createOnly are merge plumbing, not exported state —
      // golden cells never carry them
      if (e(k).copy(wasSet = None, createOnly = false) !=
        a(k).copy(wasSet = None, createOnly = false))
        sb.append(s"differs:\n  want ${e(k)}\n  got  ${a(k)}\n")
    }
    sb.toString
  }
}
