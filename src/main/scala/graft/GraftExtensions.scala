package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.jq.{JqParser, JqEval, JqEvalMeta, JqDocs, JqExtract}
import graft.functions._

/** Session-extension entry point: registers every graft SQL function at
  * session build time, so a cluster can enable the engine with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and use
  * `jq_*`/`json_*` from plain SQL with no driver code.
  * (`Jq.register(spark)` remains the runtime equivalent.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // jq index paths over typed struct/map columns compile to native
    // Catalyst field accesses (nested-schema pruning + codegen); see
    // graft.plans.JqPathCompile for the equivalence argument.
    e.injectOptimizerRule(_ => graft.plans.JqPathCompile)
  }
}

object GraftExtensions {

  private def foldableString(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: the query argument must be a literal string")
    e.eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
  }

  private def foldableInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: the width argument must be a literal integer")
    e.eval(null).asInstanceOf[Number].intValue
  }

  /** name → expression builder, shared by [[GraftExtensions]] and
    * [[Jq.register]]. */
  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    val jqFns: Seq[(String, Seq[Expression] => Expression)] =
      Seq[(String, (String, Expression) => Expression)](
        "jq_eval" -> ((q, j) => JqEval(JqParser.parse(q), q, j)),
        "jq_docs" -> ((q, j) => JqDocs(JqParser.parse(q), q, j)),
        "jq_string" -> ((q, j) => JqExtract(JqParser.parse(q), q, "string", j)),
        "jq_long" -> ((q, j) => JqExtract(JqParser.parse(q), q, "long", j)),
        "jq_double" -> ((q, j) => JqExtract(JqParser.parse(q), q, "double", j)),
        "jq_bool" -> ((q, j) => JqExtract(JqParser.parse(q), q, "bool", j))
      ).map { case (name, build) =>
        name -> { (exprs: Seq[Expression]) =>
          require(exprs.length == 2, s"$name(query, json) takes 2 arguments")
          build(foldableString(exprs.head, name), exprs(1))
        }
      }

    val binFns: Seq[(String, Seq[Expression] => Expression)] =
      Seq("add", "sub", "mul", "div", "rem", "shl", "shr", "band", "bxor", "bbor").map { op =>
        s"json_$op" -> { (exprs: Seq[Expression]) =>
          require(exprs.length == 2, s"json_$op takes 2 arguments")
          JsonBinary(op, exprs.head, exprs(1)): Expression
        }
      }

    val unaryFns: Seq[(String, Seq[Expression] => Expression)] =
      Seq("neg", "not", "truthy", "length", "keys", "chars", "canonical").map { kind =>
        s"json_$kind" -> { (exprs: Seq[Expression]) =>
          require(exprs.length == 1, s"json_$kind takes 1 argument")
          JsonUnary(kind, exprs.head): Expression
        }
      }

    def arity(n: Int, name: String)(b: Seq[Expression] => Expression): Seq[Expression] => Expression =
      exprs => { require(exprs.length == n, s"$name takes $n arguments"); b(exprs) }
    jqFns ++ binFns ++ unaryFns ++ Seq[(String, Seq[Expression] => Expression)](
      "json_cmp" -> arity(2, "json_cmp")(exprs => JsonCmp(exprs.head, exprs(1))),
      "json_eq" -> arity(2, "json_eq")(exprs => JsonEq(exprs.head, exprs(1))),
      "json_recurse" -> arity(1, "json_recurse")(exprs => JsonRecurse(exprs.head)),
      "json_patch" -> arity(2, "json_patch")(exprs => JsonPatchExpr(exprs.head, exprs(1))),
      "json_to_cbor" -> arity(1, "json_to_cbor")(exprs => CborEncodeExpr(exprs.head)),
      "cbor_to_json" -> arity(1, "cbor_to_json")(exprs => CborDecodeExpr(exprs.head)),
      "json_to_msgpack" -> arity(1, "json_to_msgpack")(exprs => MsgPackEncodeExpr(exprs.head)),
      "msgpack_to_json" -> arity(1, "msgpack_to_json")(exprs => MsgPackDecodeExpr(exprs.head)),
      // text/vector kernels (round 6): the curation surface from SQL
      "word_shingles" -> arity(2, "word_shingles")(exprs =>
        WordShingles(exprs.head, foldableInt(exprs(1), "word_shingles"))),
      "char_grams" -> arity(2, "char_grams")(exprs =>
        CharGrams(exprs.head, foldableInt(exprs(1), "char_grams"))),
      "char_gram_hashes" -> arity(2, "char_gram_hashes")(exprs =>
        CharGramHashes(exprs.head, foldableInt(exprs(1), "char_gram_hashes"))),
      "simhash64" -> arity(1, "simhash64")(exprs => Simhash64(exprs.head)),
      "char_entropy" -> arity(1, "char_entropy")(exprs => CharEntropy(exprs.head)),
      "rolling_fingerprint" -> arity(1, "rolling_fingerprint")(exprs =>
        RollingFingerprint(exprs.head)),
      "vec_cosine" -> arity(2, "vec_cosine")(exprs => CosineSim(exprs.head, exprs(1))),
      "vec_dot" -> arity(2, "vec_dot")(exprs => VecDot(exprs.head, exprs(1))),
      // lineage-entry evaluation (round 10): jq with a seeded meta envelope
      "jq_eval_meta" -> arity(3, "jq_eval_meta")(exprs => {
        val q = foldableString(exprs.head, "jq_eval_meta")
        JqEvalMeta(JqParser.parse(q), q, exprs(1), exprs(2))
      }),
      // media decode from SQL (round 10): the builder runs at analysis
      // time on the driver — plan time — so it captures the SAME decoder
      // snapshot the Scala API does; SQL and Scala decodes of one payload
      // can never disagree about plugins
      "decode_media" -> arity(2, "decode_media")(exprs =>
        DecodeMediaExpr(exprs.head, exprs(1),
          graft.operators.Multimodal.MediaDecoders.snapshot(), None)),
      "dhash_bands" -> arity(1, "dhash_bands")(exprs => DhashBandsExpr(exprs.head)))
  }
}
