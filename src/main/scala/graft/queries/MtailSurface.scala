package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The mtail operator surface (SURVEY.md §2) re-expressed as Spark
  * DataFrame plans over the driver's `events` table, treating each row as a
  * log line: `props` plays the role of the raw text, `ts` the strptime()'d
  * event time, `event_type`/`user_id` the extracted label dimensions.
  *
  * Every query here has a DuckDB oracle in [[MtailSurface.oracle]] with
  * IDENTICAL output column names; aggregates over doubles are rounded on
  * both sides, timestamps truncated to seconds (Spark is µs-precision,
  * DuckDB ns — see graft.Tables).
  *
  * Scale notes (100 TB): every query is a single scan → partial/final hash
  * aggregate; no driver-side collects, no cross-partition state. Window
  * queries partition by a high-cardinality key (user_id) so the shuffle is
  * even; the only broadcast is an intentional 1-row TTL threshold.
  */
object MtailSurface {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** queries keyed by operator name; see SURVEY.md §2.3–§2.7. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.5 `lines_total++` — the linecount.mtail program: a bare counter.
    "mt_line_count" -> ((s, dir) =>
      events(s, dir).agg(count(lit(1)).as("lines_total"))),

    // §2.5 `c[label]++` — dimensioned counter increment.
    "mt_counter_by_labels" -> ((s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // §2.5 `c[label] += expr` — add-assign from an extracted value.
    "mt_counter_add_expr" -> ((s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(round(sum("value"), 4).as("total"))
        .orderBy("event_type")),

    // §2.5 `g[label] = expr` — gauge last-write-wins (vm.go:513-553);
    // arrival order is modeled by event_id (monotone with ingest).
    "mt_gauge_last_write" -> ((s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(round(max_by(col("value"), col("event_id")), 4).as("last_value"))
        .orderBy("event_type")),

    // §2.5 text-kind metric — last string value per dimension.
    "mt_text_last_value" -> ((s, dir) =>
      events(s, dir).groupBy("user_id")
        .agg(max_by(col("props"), col("event_id")).as("last_props"))
        .orderBy("user_id")),

    // §2.3 `/re/ { c++ }` — pattern-condition filter (vm.go:356-362).
    "mt_regex_match_filter" -> ((s, dir) =>
      events(s, dir)
        .filter(col("props").rlike("\"k\": [0-9]{2}\\}"))
        .groupBy("event_type").agg(count(lit(1)).as("matched_lines"))
        .orderBy("event_type")),

    // §2.4 capref `$1` + fused S2i (codegen.go:266-270): typed extraction.
    "mt_regex_extract_typed" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
            .cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("k_sum"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    // §2.6 strptime() + time register: round-trip through a string parse,
    // then bucket by hour of event time (vm.go:555-589).
    "mt_strptime_event_time" -> ((s, dir) =>
      events(s, dir)
        .select(to_timestamp(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("t"))
        .groupBy(date_format(col("t"), "yyyy-MM-dd HH").as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("hr")),

    // §2.5 histogram observe — buckets (min,max], first bucket with
    // v <= max wins (datum/buckets.go:42-57); +Inf auto-appended.
    "mt_histogram_buckets" -> ((s, dir) =>
      events(s, dir)
        .withColumn("le",
          when(col("value") <= 10, "10")
            .when(col("value") <= 50, "50")
            .when(col("value") <= 100, "100")
            .when(col("value") <= 200, "200")
            .otherwise("+Inf"))
        .groupBy("event_type", "le").agg(count(lit(1)).as("n"))
        .orderBy("event_type", "le")),

    // §2.3 cond/else/otherwise — static rewrite of the matched-flag
    // semantics (vm.go:897-902): first matching branch wins.
    "mt_cond_else_otherwise" -> ((s, dir) =>
      events(s, dir)
        .withColumn("branch",
          when(col("event_type") === "error", "err")
            .when(col("value") > 50, "big")
            .otherwise("other"))
        .groupBy("branch").agg(count(lit(1)).as("cnt"))
        .orderBy("branch")),

    // §2.3 `stop` — prunes later actions for matching lines
    // (plan rewrite: later actions get !cond conjoined).
    "mt_stop_semantics" -> ((s, dir) =>
      events(s, dir)
        .filter(col("event_type") =!= "error" && col("value") > 50)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // §2.5 `del m[k] after 7d` — batch equivalent of TTL expiry
    // (store.go:156-180): rows older than max(ts)-7d are gone.
    // The 1-row max is broadcast, not collected.
    "mt_del_after_ttl" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
      val mx = e.agg(max("tss").as("mx"))
      e.crossJoin(broadcast(mx))
        .filter(col("tss") >= col("mx") - expr("INTERVAL 7 DAYS"))
        .groupBy("event_type").agg(count(lit(1)).as("live"))
        .orderBy("event_type")
    }),

    // §2.5 `del m[k] after d` on a MISSING cell — runtime line-abort
    // (r19: ExpireDatum "No datum", metric.go:223-234 via
    // vm.go:796-812). Modeled: `purchase` rows create seen[user],
    // `click` rows Expire it — a click only survives (and counts)
    // when a purchase for the same user arrived STRICTLY BEFORE it in
    // arrival order. The existence fold is the same
    // count-of-creates-as-of shape the engine's $ex$ companion read
    // compiles to: a keyed window, no self-join, shuffle only on the
    // high-cardinality user key.
    "mt_expire_missing_abort" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("creates_before",
          count(when(col("event_type") === "purchase", lit(1))).over(w))
        .filter(col("event_type") === "click" &&
          col("creates_before") > 0)
        .groupBy("user_id").agg(count(lit(1)).as("expires_ok"))
        .orderBy("user_id")
    }),

    // §2.5 `limit N` eviction — keep newest 3 datums per key
    // (metric.go:184-198): top-N by arrival per dimension.
    "mt_limit_n_eviction" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(count(lit(1)).as("kept"), round(sum("value"), 4).as("val_sum"))
        .orderBy("user_id")
    }),

    // §2.5 hidden-metric cross-line state — rsyncd.mtail's begin/end
    // pairing (examples/rsyncd.mtail:28-44): each `purchase` pairs with
    // the latest preceding `signup` of the same user.
    "mt_hidden_state_pairing" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
        .withColumn("signup_ts",
          max(when(col("event_type") === "signup", col("tss"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("signup_ts").isNotNull)
        .withColumn("delay_s",
          unix_timestamp(col("tss")) - unix_timestamp(col("signup_ts")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("pairs"), sum("delay_s").as("total_delay_s"))
        .orderBy("user_id")
    }),

    // §2.6 scalar builtins tolower/subst/len over text lines.
    "mt_scalar_builtins" -> ((s, dir) =>
      Tables(s, dir, "documents").groupBy("lang")
        .agg(
          sum(length(regexp_replace(lower(col("text")), " ", "")))
            .as("chars_nospace"),
          sum(length(col("text"))).as("chars"))
        .orderBy("lang")),

    // §2.6 subst(/re/, new, s) — regex replace-all (vm.go:937-953).
    "mt_regex_subst" -> ((s, dir) =>
      Tables(s, dir, "documents").groupBy("lang")
        .agg(sum(length(regexp_replace(col("text"), "[aeiou]+", "_")))
          .as("chars_subst"))
        .orderBy("lang"))
  )

  /** DuckDB-equivalent SQL; column names MUST match the Spark side.
    * Integer sums are cast to BIGINT (DuckDB sums integers to HUGEINT).
    */
  val oracle: Map[String, String] = Map(
    "mt_line_count" ->
      "SELECT count(*) AS lines_total FROM events",
    "mt_counter_by_labels" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type ORDER BY event_type""",
    "mt_counter_add_expr" ->
      """SELECT event_type, round(sum(value), 4) AS total FROM events
         GROUP BY event_type ORDER BY event_type""",
    "mt_gauge_last_write" ->
      """SELECT event_type, round(max_by(value, event_id), 4) AS last_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "mt_text_last_value" ->
      """SELECT user_id, max_by(props, event_id) AS last_props
         FROM events GROUP BY user_id ORDER BY user_id""",
    "mt_regex_match_filter" ->
      """SELECT event_type, count(*) AS matched_lines FROM events
         WHERE regexp_matches(props, '"k": [0-9]{2}\}')
         GROUP BY event_type ORDER BY event_type""",
    "mt_regex_extract_typed" ->
      """SELECT event_type,
           CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT))
                AS BIGINT) AS k_sum,
           count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "mt_strptime_event_time" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hr, count(*) AS cnt
         FROM events GROUP BY hr ORDER BY hr""",
    "mt_histogram_buckets" ->
      """SELECT event_type,
           CASE WHEN value <= 10 THEN '10' WHEN value <= 50 THEN '50'
                WHEN value <= 100 THEN '100' WHEN value <= 200 THEN '200'
                ELSE '+Inf' END AS le,
           count(*) AS n
         FROM events GROUP BY event_type, le ORDER BY event_type, le""",
    "mt_cond_else_otherwise" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'err'
                     WHEN value > 50 THEN 'big'
                     ELSE 'other' END AS branch,
                count(*) AS cnt
         FROM events GROUP BY branch ORDER BY branch""",
    "mt_stop_semantics" ->
      """SELECT event_type, count(*) AS cnt FROM events
         WHERE event_type <> 'error' AND value > 50
         GROUP BY event_type ORDER BY event_type""",
    "mt_del_after_ttl" ->
      """SELECT event_type, count(*) AS live FROM events
         WHERE date_trunc('second', ts) >=
           (SELECT max(date_trunc('second', ts)) FROM events)
             - INTERVAL 7 DAY
         GROUP BY event_type ORDER BY event_type""",
    "mt_expire_missing_abort" ->
      """SELECT user_id, count(*) AS expires_ok
         FROM (SELECT user_id, event_type,
                 count(*) FILTER (WHERE event_type = 'purchase')
                   OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS creates_before
               FROM events) t
         WHERE event_type = 'click' AND creates_before > 0
         GROUP BY user_id ORDER BY user_id""",
    "mt_limit_n_eviction" ->
      """SELECT user_id, count(*) AS kept, round(sum(value), 4) AS val_sum
         FROM (SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY event_id DESC) AS rn
               FROM events) t
         WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""",
    "mt_hidden_state_pairing" ->
      """SELECT user_id, count(*) AS pairs,
              CAST(sum(delay_s) AS BIGINT) AS total_delay_s
         FROM (SELECT user_id, event_type,
                 date_diff('second',
                   max(CASE WHEN event_type = 'signup'
                            THEN date_trunc('second', ts) END)
                     OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW),
                   date_trunc('second', ts)) AS delay_s
               FROM events) t
         WHERE event_type = 'purchase' AND delay_s IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "mt_scalar_builtins" ->
      """SELECT lang,
           CAST(sum(length(replace(lower(text), ' ', ''))) AS BIGINT)
             AS chars_nospace,
           CAST(sum(length(text)) AS BIGINT) AS chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "mt_regex_subst" ->
      """SELECT lang,
           CAST(sum(length(regexp_replace(text, '[aeiou]+', '_', 'g')))
                AS BIGINT) AS chars_subst
         FROM documents GROUP BY lang ORDER BY lang"""
  )
}
