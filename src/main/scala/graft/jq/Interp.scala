package graft.jq

import graft.json._
import Ast._

/** One record of the execution stream: a document plus per-record errors.
  * Errors are data, not exceptions (reference: src/entry.rs:5-10,
  * src/op.rs:14-19): a failed operator stores the message, substitutes null
  * and keeps flowing; downstream operators pass errored entries through
  * untouched (reference: src/ops.rs:296).
  */
final case class JEntry(doc: JDoc, errors: Vector[String]) extends Serializable
object JEntry {
  def ok(d: JDoc): JEntry = JEntry(d, Vector.empty)
}

/** Per-document evaluator for the jq AST.
  *
  * A jq expression is set-valued: one input document produces a stream of
  * output entries. Evaluation is a pure function `(Ast, JDoc) →
  * Vector[JEntry]`, which is what makes the whole pipeline a narrow
  * per-row map under Spark — no shuffle, no state, embarrassingly parallel
  * at any scale. Semantics follow reference src/ops.rs with the intended
  * (not buggy) behavior where the reference differs from its own tests
  * (SURVEY.md §1.2, §2.7).
  */
object Interp {

  def run(query: String, doc: JDoc): Vector[JEntry] =
    eval(JqParser.parse(query), doc)

  /** Evaluate over an already-streamed entry: errored entries pass through
    * untouched (reference: src/ops.rs:296). */
  def evalE(ast: Ast, e: JEntry): Vector[JEntry] =
    if (e.errors.nonEmpty) Vector(e)
    else eval(ast, e.doc)

  private def err(msg: String, opt: Boolean): Vector[JEntry] =
    if (opt) Vector.empty else Vector(JEntry(JNull, Vector(msg)))

  def eval(ast: Ast, doc: JDoc): Vector[JEntry] = ast match {
    case Identity   => Vector(JEntry.ok(doc))
    case Recurse    => JOps.recurse(doc).map(JEntry.ok)
    case Lit(v)     => Vector(JEntry.ok(v))
    case OptMark(e) => eval(e, doc).filter(_.errors.isEmpty)

    case IndexKey(key, opt) =>
      JOps.getKey(doc, key) match {
        case Some(v) => Vector(JEntry.ok(v))
        case None    => err(s"cannot index $key into ${doc.typeName}", opt)
      }

    case IndexNum(off, opt) =>
      JOps.indexAt(doc, off) match {
        case Some(v) => Vector(JEntry.ok(v))
        case None    => err(s"cannot index $off into ${doc.typeName}", opt)
      }

    case Ident(name, opt) =>
      // bare identifier ≡ field access (reference: src/ops.rs:332-341)
      JOps.getKey(doc, name) match {
        case Some(v) => Vector(JEntry.ok(v))
        case None    => err(s"cannot index $name into ${doc.typeName}", opt)
      }

    case Slice(start, end, opt) =>
      JOps.slice(doc, start, end) match {
        case Some(v) => Vector(JEntry.ok(v))
        case None    => err(s"cannot slice ${doc.typeName}", opt)
      }

    case IterValues(opt) =>
      JOps.docValues(doc) match {
        case Some(vs) => vs.map(JEntry.ok)
        case None     => err(s"cannot iterate ${doc.typeName}", opt)
      }

    case Iterate(items, _) =>
      // round-robin: one output from each sub-pipeline per round
      // (reference: src/ops.rs:497-513), exhausted pipelines skipped
      // (intended semantics per test src/query.rs:600-607).
      val streams = items.map(it => eval(it, doc))
      val maxLen = if (streams.isEmpty) 0 else streams.map(_.length).max
      val out = Vector.newBuilder[JEntry]
      var round = 0
      while (round < maxLen) {
        streams.foreach { s => if (round < s.length) out += s(round) }
        round += 1
      }
      out.result()

    case MkList(items, _) =>
      // collect ALL outputs of every sub-expression into one array; errored
      // entries contribute their (null) doc and their errors are merged
      // (reference: src/ops.rs:556-597).
      val entries = items.flatMap(it => eval(it, doc))
      Vector(JEntry(JArr(entries.map(_.doc).toVector), entries.flatMap(_.errors).toVector))

    case MkDict(pairs, _) =>
      evalDict(pairs, doc)

    case Neg(e) => eval(e, doc).map(mapOk(_)(JOps.neg))
    case Not(e) => eval(e, doc).map(mapOk(_)(JOps.not))

    case Bin(op, l, r) =>
      // per-entry zip of both operand streams, truncated to the shorter
      // (reference: src/ops.rs:827-833); both sides always evaluated (no
      // short-circuit, reference: src/ops.rs:1371-1377).
      val ls = eval(l, doc)
      val rs = eval(r, doc)
      val n = math.min(ls.length, rs.length)
      (0 until n).map { i =>
        val le = ls(i); val re = rs(i)
        val errors = le.errors ++ re.errors
        JEntry(binValue(op, le.doc, re.doc), errors)
      }.toVector

    case Pipe(l, r) =>
      eval(l, doc).flatMap(e => evalE(r, e))

    case Call(name, args) =>
      evalCall(name, args, doc)
  }

  private def mapOk(e: JEntry)(f: JDoc => JDoc): JEntry =
    if (e.errors.nonEmpty) e else JEntry(f(e.doc), e.errors)

  private def binValue(op: BinOp, a: JDoc, b: JDoc): JDoc = {
    import BinOp._
    op match {
      case Add    => JOps.add(a, b)
      case Sub    => JOps.sub(a, b)
      case Mul    => JOps.mul(a, b)
      case Div    => JOps.div(a, b)
      case Rem    => JOps.rem(a, b)
      case Eq     => JBool(JOps.eqDoc(a, b))
      case Ne     => JBool(!JOps.eqDoc(a, b))
      // collation comparisons; incomparable (NaN) → false, and `<=` is the
      // CORRECT relation, not the reference's copy/paste `>=`
      // (reference bug at src/ops.rs:1272; SURVEY.md §2.5)
      case Lt     => JBool(JOps.cmp(a, b).exists(_ < 0))
      case Le     => JBool(JOps.cmp(a, b).exists(_ <= 0))
      case Gt     => JBool(JOps.cmp(a, b).exists(_ > 0))
      case Ge     => JBool(JOps.cmp(a, b).exists(_ >= 0))
      case Shl    => JOps.shl(a, b)
      case Shr    => JOps.shr(a, b)
      case BitAnd => JOps.bitAnd(a, b)
      case BitXor => JOps.bitXor(a, b)
      case BitOr  => JOps.bitOr(a, b)
      case And    => JBool(JOps.truthy(a) && JOps.truthy(b))
      case Or     => JBool(JOps.truthy(a) || JOps.truthy(b))
    }
  }

  /** `{...}` construction (reference: src/ops.rs:600-739): per pair, every
    * produced key becomes its own property (keys expand within one object);
    * multi-valued VALUE streams fan out as a cartesian product across
    * output objects (first pair varies slowest). Errored or non-string keys
    * skip the property but keep their errors. Shorthand pairs look the key
    * up in the input document. */
  private def evalDict(pairs: List[DictPair], doc: JDoc): Vector[JEntry] = {
    // expand: each pair → list of (keyEntry, valueChoices)
    val props: List[(JEntry, Vector[JEntry])] = pairs.flatMap { pair =>
      val keys = eval(pair.key, doc)
      pair.value match {
        case Some(vAst) =>
          val values = eval(vAst, doc)
          keys.map(k => (k, values))
        case None =>
          // dynamic shorthand: value = input doc's field named by the key
          keys.map { k =>
            val v = k.doc match {
              case JStr(s) =>
                JOps.getKey(doc, s) match {
                  case Some(value) => JEntry.ok(value)
                  case None        => JEntry(JNull, Vector(s"cannot index $s into ${doc.typeName}"))
                }
              case _ => JEntry.ok(JNull) // non-string key: skipped below anyway
            }
            (k, Vector(v))
          }
      }
    }
    if (props.isEmpty) return Vector(JEntry.ok(JObj.empty))
    if (props.exists(_._2.isEmpty)) return Vector.empty // a value pipeline produced nothing

    // cartesian product over value choices; first prop varies slowest
    def product(ps: List[(JEntry, Vector[JEntry])]): Vector[List[(JEntry, JEntry)]] =
      ps match {
        case Nil => Vector(Nil)
        case (k, vs) :: tail =>
          val tails = product(tail)
          vs.flatMap(v => tails.map(t => (k, v) :: t))
      }

    product(props).map { combo =>
      val errors = Vector.newBuilder[String]
      val kvs = List.newBuilder[(String, JDoc)]
      combo.foreach { case (ke, ve) =>
        errors ++= ke.errors
        errors ++= ve.errors
        if (ke.errors.isEmpty && ve.errors.isEmpty) {
          ke.doc match {
            case JStr(s) => kvs += ((s, ve.doc))
            case _       => () // non-string key skipped (reference: src/ops.rs:693-697)
          }
        }
      }
      JEntry(JObj.fromProps(kvs.result()), errors.result())
    }
  }

  /** Builtin dispatch (reference: src/query.rs:226-242; semantics from
    * src/ops.rs:1418-1579 and the specified-but-dead impls at
    * src/ops.rs:1583-1713 with their test vectors). */
  private def evalCall(name: String, args: List[Ast], doc: JDoc): Vector[JEntry] = {
    def inputEntries: Vector[JEntry] =
      if (args.isEmpty) Vector(JEntry.ok(doc)) else eval(args.head, doc)

    def overInput(f: JDoc => Either[String, JDoc]): Vector[JEntry] =
      inputEntries.map { e =>
        if (e.errors.nonEmpty) e
        else f(e.doc) match {
          case Right(v)  => JEntry.ok(v)
          case Left(msg) => JEntry(JNull, Vector(msg))
        }
      }

    /** first output of evaluating `ast` against `d` (builtin arg position,
      * reference: `thunk(value)?.remove(0)`). */
    def firstOut(ast: Ast, d: JDoc): Either[String, JEntry] = {
      val out = eval(ast, d)
      if (out.isEmpty) Left(s"$name: argument produced no output") else Right(out.head)
    }

    name match {
      case "length" =>
        if (args.length > 1) return Vector(JEntry(JNull, Vector("invalid number of args for length")))
        overInput { d =>
          JOps.lengthOf(d) match {
            case Some(n) => Right(JLong(n))
            case None    => Left(s"cannot find length for ${d.typeName}")
          }
        }

      case "chars" =>
        if (args.length > 1) return Vector(JEntry(JNull, Vector("invalid number of args for chars")))
        overInput { d =>
          JOps.intoIter(d) match {
            case Some(vs) => Right(JArr(vs))
            case None     => Left(s"cannot find chars for ${d.typeName}")
          }
        }

      case "keys" =>
        if (args.length > 1) return Vector(JEntry(JNull, Vector("invalid number of args for keys")))
        overInput { d =>
          JOps.keysOf(d) match {
            case Some(v) => Right(v)
            case None    => Left(s"cannot find keys for ${d.typeName}")
          }
        }

      case "has" =>
        // membership of the arg's value in the input container
        // (reference: src/ops.rs:1583-1606)
        requireOneArg(args) { argAst =>
          firstOut(argAst, doc) match {
            case Left(msg) => Vector(JEntry(JNull, Vector(msg)))
            case Right(item) =>
              doc match {
                case JArr(elems) => Vector(JEntry.ok(JBool(elems.exists(JOps.eqDoc(_, item.doc)))))
                case JObj(props) => Vector(JEntry.ok(JBool(props.exists(p => JOps.eqDoc(JStr(p._1), item.doc)))))
                case other       => Vector(JEntry(JNull, Vector(s"${other.typeName} not iterable")))
              }
          }
        }

      case "in" =>
        // membership of the input value in the arg's container
        // (reference: src/ops.rs:1608-1630)
        requireOneArg(args) { argAst =>
          firstOut(argAst, doc) match {
            case Left(msg) => Vector(JEntry(JNull, Vector(msg)))
            case Right(container) =>
              container.doc match {
                case JArr(elems) => Vector(JEntry.ok(JBool(elems.exists(JOps.eqDoc(_, doc)))))
                case JObj(props) => Vector(JEntry.ok(JBool(props.exists(p => JOps.eqDoc(JStr(p._1), doc)))))
                case other       => Vector(JEntry(JNull, Vector(s"${other.typeName} not iterable")))
              }
          }
        }

      case "map" =>
        // string/array → array of f(item); object → object of f(value)
        // (reference: src/ops.rs:1632-1656)
        requireOneArg(args) { f =>
          doc match {
            case JStr(_) | JArr(_) =>
              val items = JOps.intoIter(doc).get
              val out = Vector.newBuilder[JDoc]
              items.foreach { item =>
                firstOut(f, item) match {
                  case Left(msg)              => return Vector(JEntry(JNull, Vector(msg)))
                  case Right(e) if e.errors.nonEmpty => return Vector(JEntry(JNull, e.errors))
                  case Right(e)               => out += e.doc
                }
              }
              Vector(JEntry.ok(JArr(out.result())))
            case JObj(props) =>
              val out = Vector.newBuilder[(String, JDoc)]
              props.foreach { case (k, v) =>
                firstOut(f, v) match {
                  case Left(msg)              => return Vector(JEntry(JNull, Vector(msg)))
                  case Right(e) if e.errors.nonEmpty => return Vector(JEntry(JNull, e.errors))
                  case Right(e)               => out += ((k, e.doc))
                }
              }
              Vector(JEntry.ok(JObj.fromProps(out.result())))
            case other => Vector(JEntry(JNull, Vector(s"cannot map over ${other.typeName}")))
          }
        }

      case "any" | "all" =>
        // only a literal `true` output counts as true
        // (reference: `boolean().unwrap_or(false)`, src/ops.rs:1658-1713)
        requireOneArg(args) { f =>
          val itemsOpt: Option[Vector[JDoc]] = doc match {
            case JStr(_) | JArr(_) => JOps.intoIter(doc)
            case JObj(props)       => Some(props.map(_._2))
            case _                 => None
          }
          itemsOpt match {
            case None => Vector(JEntry(JNull, Vector(s"cannot iterate over ${doc.typeName}")))
            case Some(items) =>
              var acc = name == "all"
              items.foreach { item =>
                firstOut(f, item) match {
                  case Left(msg)              => return Vector(JEntry(JNull, Vector(msg)))
                  case Right(e) if e.errors.nonEmpty => return Vector(JEntry(JNull, e.errors))
                  case Right(e) =>
                    val b = e.doc == JBool(true)
                    if (name == "any" && b) return Vector(JEntry.ok(JBool(true)))
                    if (name == "all" && !b) return Vector(JEntry.ok(JBool(false)))
                }
              }
              Vector(JEntry.ok(JBool(acc)))
            }
        }

      case other =>
        Vector(JEntry(JNull, Vector(s"unknown builtin $other")))
    }
  }

  private def requireOneArg(args: List[Ast])(f: Ast => Vector[JEntry]): Vector[JEntry] =
    if (args.length != 1) Vector(JEntry(JNull, Vector(s"expected 1 args, got ${args.length}")))
    else f(args.head)
}
