package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The JqPathCompile optimizer rule: jq index paths over typed columns
  * become native Catalyst accesses, provably value-identical to the
  * interpreter, and anything outside the proven fragment is untouched. */
class JqPathCompileSpec extends SparkTestBase {
  import spark.implicits._

  private def optimizedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("struct path compiles to GetStructField (no jq interpreter node in the plan)") {
    // range() keeps the source non-foldable — over a literal relation the
    // whole projection constant-folds and there is no plan to inspect
    val df = spark.range(3).select(col("id"),
      struct(col("id").as("a"),
        struct(concat(lit("x"), col("id")).as("c"), (col("id") + 1).cast("int").as("d")).as("b"))
        .as("s"))
    val q = df.select(
      graft.Jq.long(".a", col("s")).as("a"),
      graft.Jq.string(".b.c", col("s")).as("c"),
      graft.Jq.long(".b.d", col("s")).as("d"))
    val plan = optimizedPlan(q)
    assert(!plan.contains("jq_"), s"expected the jq nodes compiled away, got:\n$plan")
    val r = q.orderBy("a").head()
    assert(r.getLong(0) == 0L && r.getString(1) == "x0" && r.getLong(2) == 1L)
  }

  test("compiled accesses equal the interpreter on nulls, missing keys, widenings") {
    val df = spark.sql("""
      SELECT id,
             CASE WHEN id = 0 THEN named_struct('a', CAST(NULL AS BIGINT), 'm', map('k', id))
                  WHEN id = 1 THEN CAST(NULL AS struct<a:bigint,m:map<string,bigint>>)
                  ELSE named_struct('a', id * 10, 'm', map('k', id, 'z', id + 1)) END AS s
      FROM range(4)""")
    // native (rule fires: struct + map steps, exact kinds)
    val got = df.select(col("id"),
        graft.Jq.long(".a", col("s")).as("a"),
        graft.Jq.long(".m.k", col("s")).as("mk"),
        graft.Jq.long(".m.missing", col("s")).as("mm"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    // interpreter (rule can't fire: input serialized to a JSON string)
    val exp = df.select(col("id"), to_json(col("s")).as("j"))
      .select(col("id"),
        graft.Jq.long(".a", col("j")).as("a"),
        graft.Jq.long(".m.k", col("j")).as("mk"),
        graft.Jq.long(".m.missing", col("j")).as("mm"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(got == exp, s"native $got != interpreter $exp")
    assert(got.contains((1L, null, null, null)), "null struct must propagate NULL")
  }

  test("float leaves and non-path programs keep the interpreter") {
    val df = spark.range(1).select(
      struct((col("id") + lit(0.1f)).cast("float").as("f"), (col("id") + 7L).as("x")).as("s"))
    // float: shortest-decimal conversion (0.1) != IEEE widening of 0.1f
    val fq = df.select(graft.Jq.double(".f", col("s")).as("v"))
    assert(optimizedPlan(fq).contains("jq_double"), "float leaf must NOT compile to a cast")
    assert(fq.head().getDouble(0) == 0.1d) // document semantics: shortest decimal
    // arithmetic program: outside the path fragment
    val aq = df.select(graft.Jq.long(".x + 1", col("s")).as("v"))
    assert(optimizedPlan(aq).contains("jq_long"))
    assert(aq.head().getLong(0) == 8L)
    // int widening compiles and matches
    val wq = spark.range(1)
      .select(struct((col("id") + 5).cast("int").as("i"), (col("id") + 6L).as("l")).as("s"))
      .select(graft.Jq.long(".i", col("s")).as("a"),
        graft.Jq.double(".l", col("s")).as("b"))
    assert(!optimizedPlan(wq).contains("jq_"))
    assert(wq.head().getLong(0) == 5L && wq.head().getDouble(1) == 6.0d)
  }

  test("duplicate struct field names keep the interpreter (conversion is last-wins, GetStructField first)") {
    val df = spark.range(1).select(
      struct((col("id") + 1).as("k"), (col("id") + 2).as("k")).as("s"))
    val q = df.select(graft.Jq.long(".k", col("s")).as("v"))
    assert(optimizedPlan(q).contains("jq_long"),
      "ambiguous field name must NOT compile to a first-field access")
    assert(q.head().getLong(0) == 2L) // interpreter semantics: last duplicate wins
  }

  test("identity over a STRING document stays a canonicalizer (not rewritten to the raw column)") {
    val df = spark.range(1).select(
      concat(lit("""{"b": 2, "a": """), col("id").cast("string"), lit("}")).as("j"))
    val q = df.select(graft.Jq.string(".", col("j")).as("doc"))
    assert(optimizedPlan(q).contains("jq_string"),
      "jq_string('.') on a JSON text column must keep the parse+canonicalize semantics")
    assert(q.head().getString(0) == """{"a":0,"b":2}""")
  }

  test("nested-schema pruning reaches the parquet scan through a compiled path") {
    val dir = "/tmp/graft_jqpath_prune"
    Seq((1L, (10L, "wide-" * 100), 2L))
      .toDF("id", "payload", "other")
      .select(col("id"), col("payload").cast("struct<k:bigint,blob:string>").as("payload"), col("other"))
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .select(graft.Jq.long(".k", col("payload")).as("k"))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("struct<k:bigint>"),
      s"expected the scan schema pruned to the one leaf, got:\n$physical")
    assert(scan.head().getLong(0) == 10L)
  }
}
