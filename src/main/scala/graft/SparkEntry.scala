package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (or the beyond-parity layer, §7 step 7); [[oracleSql]] carries the
  * equivalent DuckDB SQL the driver hash-compares against on the same
  * parquet tables. Column names are aliased identically on both sides —
  * the driver sorts columns by name before hashing.
  */
object SparkEntry {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    // default; read as LONG nanos and convert where a query needs time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (LONG nanoseconds, see [[table]]) → TIMESTAMP. */
  def eventTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((c / 1000L).cast("bigint"))

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): jq-extract
    * the metric from the JSON props of the event stream, then aggregate
    * per event type. One narrow jq projection + one partial-aggregated
    * shuffle — the shape that scales to 100 TB. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.select(col("event_type"), Jq.long(".k", col("props")).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- jq core: navigation (§2.2) -------------------------------------
    "jq_index" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.long(".k", col("props")).as("k"))),

    // pipe + object construction + index (§2.2, §2.3)
    "jq_pipe_construct" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.long("{id: .k} | .id", col("props")).as("id"))),

    // arithmetic on documents (§2.4)
    "jq_arith" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.long(".k * 2 + 1", col("props")).as("v"))),

    // comparison + logic predicates (§2.5)
    "jq_predicate" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.bool(".k > 20 && .k <= 80", col("props")).as("mid"))),

    // list construction + iteration + explode (§2.2, §2.3)
    "jq_explode" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      Jq.explodeDocs(ev, "[.k, .k * 10] | .[]", col("props"), "v_doc")
        .select(col("event_id"), col("v_doc").cast("bigint").as("v"))
    }),

    // builtin map over list (§2.6) — [.k] | map(.+1) | .[0]
    "jq_map_builtin" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.long("[.k] | map(. + 1) | .[0]", col("props")).as("v"))),

    // builtin in() membership (§2.6)
    "jq_in_builtin" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.bool(".k | in([5, 23, 42, 69])", col("props")).as("hit"))),

    // recurse `..` over a constructed array document (§2.2)
    "jq_recurse" -> ((s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"),
          concat(lit("["), col("event_id") % 7, lit(","), (col("event_id") % 7) * 2, lit("]")).as("doc"))
        .select(col("event_id"), explode(Jq.docs("..", col("doc"))).as("v"))),

    // string slice over a document built from the documents table (§2.2)
    "jq_slice_str" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        Jq.string(".text | .[0..16]", to_json(struct(col("text")))).as("prefix"))),

    // string split (div) + length builtin: token count (§2.4, §2.6)
    "jq_tokens" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        Jq.long(""".text / " " | length""", to_json(struct(col("text")))).as("n_tokens"))),

    // byte-length semantics of length (§2.6)
    "jq_strlen" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        Jq.long(".text | length", to_json(struct(col("text")))).as("n_bytes"))),

    // `?` error suppression: missing key yields SQL NULL (§2.7)
    "jq_opt_suppress" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Jq.long(".missing? | length", col("props")).as("v")))
  )

  /** DuckDB-equivalent SQL per query (runs on views named after the parquet
    * tables). Aliases match the Spark side exactly. */
  def oracleSql: Map[String, String] = Map(
    "jq_index" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events",
    "jq_pipe_construct" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS id FROM events",
    "jq_arith" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) * 2 + 1 AS v FROM events",
    "jq_predicate" ->
      "SELECT event_id, (CAST(json_extract(props, '$.k') AS BIGINT) > 20 AND CAST(json_extract(props, '$.k') AS BIGINT) <= 80) AS mid FROM events",
    "jq_explode" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS v FROM events UNION ALL SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) * 10 AS v FROM events",
    "jq_map_builtin" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) + 1 AS v FROM events",
    "jq_in_builtin" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) IN (5, 23, 42, 69) AS hit FROM events",
    "jq_recurse" ->
      "SELECT event_id, '[' || (event_id % 7) || ',' || ((event_id % 7) * 2) || ']' AS v FROM events UNION ALL SELECT event_id, CAST(event_id % 7 AS VARCHAR) AS v FROM events UNION ALL SELECT event_id, CAST((event_id % 7) * 2 AS VARCHAR) AS v FROM events",
    "jq_slice_str" ->
      "SELECT doc_id, substring(text, 1, 16) AS prefix FROM documents",
    "jq_tokens" ->
      "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
    "jq_strlen" ->
      "SELECT doc_id, strlen(text) AS n_bytes FROM documents",
    "jq_opt_suppress" ->
      "SELECT event_id, CAST(NULL AS BIGINT) AS v FROM events"
  )
}
