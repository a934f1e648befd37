package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.unsafe.types.UTF8String

import graft.jq.{JqParser, JqEval, JqDocs, JqExtract}
import graft.functions._

/** Public Column/SQL surface of the jq engine.
  *
  * `Jq.query(".a.b", $"props")` compiles the program once on the driver and
  * evaluates it as a single fused Catalyst expression on executors — the
  * plan stays a narrow projection (scan→project, zero shuffles), so it
  * scales linearly with partitions.
  */
object Jq {

  private def toCol(e: Expression): Column = ColumnBridge.column(e)
  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)

  /** Full entry stream: ARRAY<STRUCT<doc STRING, errors ARRAY<STRING>>>. */
  def query(q: String, jsonCol: Column): Column =
    toCol(JqEval(JqParser.parse(q), q, toExpr(jsonCol)))

  /** Successful outputs only, canonical JSON text each: ARRAY<STRING>. */
  def docs(q: String, jsonCol: Column): Column =
    toCol(JqDocs(JqParser.parse(q), q, toExpr(jsonCol)))

  /** First successful output as a typed scalar (NULL if none / mismatch). */
  def string(q: String, jsonCol: Column): Column =
    toCol(JqExtract(JqParser.parse(q), q, "string", toExpr(jsonCol)))
  def long(q: String, jsonCol: Column): Column =
    toCol(JqExtract(JqParser.parse(q), q, "long", toExpr(jsonCol)))
  def double(q: String, jsonCol: Column): Column =
    toCol(JqExtract(JqParser.parse(q), q, "double", toExpr(jsonCol)))
  def bool(q: String, jsonCol: Column): Column =
    toCol(JqExtract(JqParser.parse(q), q, "bool", toExpr(jsonCol)))

  /** One row per successful jq output: adds `outputCol` (canonical JSON
    * text), keeps all input columns. A narrow generator — no shuffle. */
  def explodeDocs(df: DataFrame, q: String, jsonCol: Column, outputCol: String): DataFrame =
    df.withColumn(outputCol, explode(docs(q, jsonCol)))

  // ------------------------------------------------------ Variant interop

  /** Run a jq pipeline over a Spark 4 VARIANT column (SURVEY.md §1.4's
    * dynamic-value bridge): `parse_json`/`to_variant_object` sources flow
    * straight into the engine via their canonical JSON text form. */
  def queryVariant(q: String, variantCol: Column): Column =
    query(q, org.apache.spark.sql.functions.to_json(variantCol))
  def docsVariant(q: String, variantCol: Column): Column =
    docs(q, org.apache.spark.sql.functions.to_json(variantCol))
  def longVariant(q: String, variantCol: Column): Column =
    long(q, org.apache.spark.sql.functions.to_json(variantCol))

  // ------------------------------------------------------- SQL registration

  /** Register every jq/json function for SQL use:
    * `SELECT jq_long('.k * 2', props) FROM events`. The query argument must
    * be a foldable string (compiled once at plan time). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    def foldableString(e: Expression, fn: String): String = {
      require(e.foldable, s"$fn: the query argument must be a literal string")
      e.eval(null).asInstanceOf[UTF8String].toString
    }

    def jqFn(name: String)(build: (String, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { exprs =>
        require(exprs.length == 2, s"$name(query, json) takes 2 arguments")
        build(foldableString(exprs.head, name), exprs(1))
      }, "built-in")

    jqFn("jq_eval") { (q, j) => JqEval(JqParser.parse(q), q, j) }
    jqFn("jq_docs") { (q, j) => JqDocs(JqParser.parse(q), q, j) }
    for (kind <- Seq("string", "long", "double", "bool"))
      jqFn(s"jq_$kind") { (q, j) => JqExtract(JqParser.parse(q), q, kind, j) }

    for (op <- Seq("add", "sub", "mul", "div", "rem", "shl", "shr", "band", "bxor", "bbor"))
      reg.createOrReplaceTempFunction(s"json_$op", { exprs =>
        require(exprs.length == 2, s"json_$op takes 2 arguments")
        JsonBinary(op, exprs.head, exprs(1))
      }, "built-in")

    reg.createOrReplaceTempFunction("json_cmp",
      exprs => JsonCmp(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("json_eq",
      exprs => JsonEq(exprs.head, exprs(1)), "built-in")
    for (kind <- Seq("neg", "not", "truthy", "length", "keys", "chars", "canonical"))
      reg.createOrReplaceTempFunction(s"json_$kind",
        exprs => JsonUnary(kind, exprs.head), "built-in")
    reg.createOrReplaceTempFunction("json_recurse",
      exprs => JsonRecurse(exprs.head), "built-in")
  }
}
