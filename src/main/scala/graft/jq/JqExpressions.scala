package graft.jq

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.json._

/** Catalyst expressions that run a whole compiled jq pipeline as ONE
  * expression over a JSON-text column.
  *
  * Design note (SURVEY.md §3.4, §7): a jq program is a per-document pure
  * function, so the entire pipeline fuses into a single narrow projection —
  * the Spark plan stays a scan→project with no shuffle, predicate pushdown
  * and column pruning still apply to the outer query, and evaluation is
  * embarrassingly parallel across partitions at any scale. This fusion is
  * strictly cheaper than one Catalyst node per jq operator, which would
  * re-serialize the document at every boundary.
  */
object JqEval {
  /** ARRAY<STRUCT<doc: STRING, errors: ARRAY<STRING>>> — the full output
    * stream for one input document; `doc` is canonical JSON text. */
  val outputType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc", StringType, nullable = false),
      StructField("errors", ArrayType(StringType, containsNull = false), nullable = false))),
    containsNull = false)

  private[jq] def evalToEntries(compiled: Interp.Pipe, json: String): Vector[JEntry] =
    try compiled(JsonText.parse(json))
    catch {
      case e: JsonText.JsonParseException =>
        Vector(JEntry(JNull, Vector(s"invalid json: ${e.getMessage}")))
    }
}

/** `jq_eval(query, json)` → full entry stream (doc + errors per output). */
case class JqEval(ast: Ast, queryText: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val compiled = Interp.compile(ast)
  override def dataType: DataType = JqEval.outputType
  override def prettyName: String = "jq_eval"
  override protected def nullSafeEval(input: Any): Any = {
    val entries = JqEval.evalToEntries(compiled, input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(entries.map { en =>
      InternalRow(
        UTF8String.fromString(JsonText.canonical(en.doc)),
        new GenericArrayData(en.errors.map(UTF8String.fromString).toArray[Any]))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): JqEval =
    copy(child = newChild)
}

/** `jq_docs(query, json)` → ARRAY<STRING> of the successful outputs only,
  * in canonical form (errored entries dropped — the `?` discipline applied
  * at the sink). */
case class JqDocs(ast: Ast, queryText: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val compiled = Interp.compile(ast)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "jq_docs"
  override protected def nullSafeEval(input: Any): Any = {
    val entries = JqEval.evalToEntries(compiled, input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(entries.collect {
      case en if en.errors.isEmpty => UTF8String.fromString(JsonText.canonical(en.doc))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): JqDocs =
    copy(child = newChild)
}

/** Typed extraction of the FIRST successful output of a jq pipeline;
  * SQL NULL when there is no output, the output errored, or the value
  * doesn't fit the requested type. Kinds: string | long | double | bool. */
case class JqExtract(ast: Ast, queryText: String, kind: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = kind match {
    case "long"   => LongType
    case "double" => DoubleType
    case "bool"   => BooleanType
    case _        => StringType
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"jq_$kind"
  @transient private lazy val compiled = Interp.compile(ast)
  override protected def nullSafeEval(input: Any): Any = {
    val entries = JqEval.evalToEntries(compiled, input.asInstanceOf[UTF8String].toString)
    entries.find(_.errors.isEmpty) match {
      case None => null
      case Some(en) =>
        (kind, en.doc) match {
          case ("long", JLong(v))     => v
          case ("double", JLong(v))   => v.toDouble
          case ("double", JDouble(v)) => v
          case ("bool", JBool(v))     => v
          case ("string", JStr(s))    => UTF8String.fromString(s)
          case ("string", JNull)      => null
          case ("string", d)          => UTF8String.fromString(JsonText.canonical(d))
          case _                      => null
        }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): JqExtract =
    copy(child = newChild)
}

/** `jq_multi`: evaluate SEVERAL jq pipelines against one document with a
  * single parse — returns STRUCT<name: typedValue, ...>. N extractions of
  * the same column otherwise each re-parse the document; this fuses them
  * (the same way a reader fuses column decoders). Field kinds follow
  * [[JqExtract]] (string | long | double | bool). */
case class JqMulti(fields: Seq[(String, Ast, String)], queryText: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val compiled = fields.map { case (_, ast, _) => Interp.compile(ast) }
  override def dataType: DataType = StructType(fields.map { case (name, _, kind) =>
    StructField(name, kind match {
      case "long"   => LongType
      case "double" => DoubleType
      case "bool"   => BooleanType
      case _        => StringType
    }, nullable = true)
  })
  override def nullable: Boolean = true
  override def prettyName: String = "jq_multi"
  override protected def nullSafeEval(input: Any): Any = {
    val json = input.asInstanceOf[UTF8String].toString
    val doc =
      try JsonText.parse(json)
      catch { case _: JsonText.JsonParseException => null }
    val values = new Array[Any](fields.length)
    if (doc != null) {
      var i = 0
      while (i < fields.length) {
        val kind = fields(i)._3
        values(i) = compiled(i)(doc).find(_.errors.isEmpty) match {
          case None => null
          case Some(en) =>
            (kind, en.doc) match {
              case ("long", JLong(v))     => v
              case ("double", JLong(v))   => v.toDouble
              case ("double", JDouble(v)) => v
              case ("bool", JBool(v))     => v
              case ("string", JStr(s))    => UTF8String.fromString(s)
              case ("string", JNull)      => null
              case ("string", d)          => UTF8String.fromString(JsonText.canonical(d))
              case _                      => null
            }
        }
        i += 1
      }
    }
    InternalRow(values: _*)
  }
  override protected def withNewChildInternal(newChild: Expression): JqMulti =
    copy(child = newChild)
}
