package graft.json

/** RFC 6902 JSON Patch over RFC 6901 JSON Pointers — goal (4) on the
  * reference's README capability list (reference: README.md:5-16, with the
  * RFC texts vendored under its docs/ as declared intent; never
  * implemented there). Pure value-level kernel, usable inside Catalyst
  * expressions.
  *
  * Errors are values (`Left(message)`), matching the engine's
  * errors-as-data discipline: a failed `test`, a missing path, or a
  * malformed op never throws. */
object JsonPatch {

  /** Parse an RFC 6901 pointer into reference tokens (with `~1`→`/`,
    * `~0`→`~` unescaping). "" addresses the whole document. */
  def parsePointer(pointer: String): Either[String, List[String]] =
    if (pointer.isEmpty) Right(Nil)
    else if (!pointer.startsWith("/")) Left(s"invalid pointer $pointer")
    else Right(pointer.substring(1).split("/", -1).toList
      .map(_.replace("~1", "/").replace("~0", "~")))

  /** Apply a full patch document (array of op objects) left to right;
    * the first failing op aborts the patch (RFC 6902 §5). */
  def apply(doc: JDoc, patch: JDoc): Either[String, JDoc] = patch match {
    case JArr(ops) =>
      ops.foldLeft[Either[String, JDoc]](Right(doc)) { (acc, op) =>
        acc.flatMap(d => applyOp(d, op))
      }
    case other => Left(s"patch must be an array, got ${other.typeName}")
  }

  def applyOp(doc: JDoc, op: JDoc): Either[String, JDoc] = op match {
    case o: JObj =>
      (o.get("op"), o.get("path")) match {
        case (Some(JStr(kind)), Some(JStr(path))) =>
          parsePointer(path).flatMap { tokens =>
            kind match {
              case "add"     => require1(o, "value").flatMap(v => add(doc, tokens, v))
              case "remove"  => remove(doc, tokens).map(_._1)
              case "replace" => require1(o, "value").flatMap(v =>
                remove(doc, tokens).map(_._1).flatMap(d => add(d, tokens, v)))
              case "move" =>
                fromPointer(o).flatMap { from =>
                  if (isPrefix(from, tokens) && from != tokens)
                    Left("cannot move into own child")
                  else remove(doc, from).flatMap { case (d, v) => add(d, tokens, v) }
                }
              case "copy" =>
                fromPointer(o).flatMap(from =>
                  resolve(doc, from).flatMap(v => add(doc, tokens, v)))
              case "test" =>
                require1(o, "value").flatMap { expected =>
                  resolve(doc, tokens).flatMap { actual =>
                    // test uses FULL structural equality (RFC 6902 §4.6),
                    // not the engine's key-only object equality
                    if (strictEq(actual, expected)) Right(doc)
                    else Left(s"test failed at $path")
                  }
                }
              case other => Left(s"unknown op $other")
            }
          }
        case _ => Left("op object needs string 'op' and 'path'")
      }
    case other => Left(s"patch op must be an object, got ${other.typeName}")
  }

  private def require1(o: JObj, key: String): Either[String, JDoc] =
    o.get(key).toRight(s"missing '$key'")

  private def fromPointer(o: JObj): Either[String, List[String]] =
    o.get("from") match {
      case Some(JStr(f)) => parsePointer(f)
      case _             => Left("missing 'from'")
    }

  private def isPrefix(a: List[String], b: List[String]): Boolean =
    b.startsWith(a)

  /** RFC 6902 §4.6 equality: deep structural, order-insensitive objects,
    * numbers equal when numerically equal. */
  def strictEq(a: JDoc, b: JDoc): Boolean = (a, b) match {
    case (JLong(x), JDouble(y))   => x.toDouble == y
    case (JDouble(x), JLong(y))   => x == y.toDouble
    case (JArr(x), JArr(y))       => x.length == y.length && x.indices.forall(i => strictEq(x(i), y(i)))
    case (JObj(x), JObj(y))       =>
      x.length == y.length && x.indices.forall(i =>
        x(i)._1 == y(i)._1 && strictEq(x(i)._2, y(i)._2)) // both key-sorted
    case _                        => a == b
  }

  def resolve(doc: JDoc, tokens: List[String]): Either[String, JDoc] = tokens match {
    case Nil => Right(doc)
    case t :: rest => doc match {
      case o: JObj => o.get(t).toRight(s"missing member $t").flatMap(resolve(_, rest))
      case JArr(items) =>
        arrayIndex(t, items.length, allowEnd = false)
          .flatMap(i => resolve(items(i), rest))
      case other => Left(s"cannot traverse ${other.typeName} with $t")
    }
  }

  private def arrayIndex(tok: String, len: Int, allowEnd: Boolean): Either[String, Int] =
    if (tok == "-") { if (allowEnd) Right(len) else Left("index - past end") }
    else if (tok.nonEmpty && tok.forall(_.isDigit) && (tok == "0" || !tok.startsWith("0"))) {
      val i = try tok.toInt catch { case _: NumberFormatException => -1 }
      if (i >= 0 && (i < len || (allowEnd && i == len))) Right(i)
      else Left(s"index $tok out of bounds")
    } else Left(s"invalid array index $tok")

  def add(doc: JDoc, tokens: List[String], value: JDoc): Either[String, JDoc] = tokens match {
    case Nil => Right(value) // whole-document replace
    case t :: Nil => doc match {
      case JObj(props) => Right(JObj.fromProps(props :+ (t -> value)))
      case JArr(items) =>
        arrayIndex(t, items.length, allowEnd = true)
          .map(i => JArr((items.take(i) :+ value) ++ items.drop(i)))
      case other => Left(s"cannot add to ${other.typeName}")
    }
    case t :: rest => doc match {
      case o: JObj =>
        o.get(t).toRight(s"missing member $t")
          .flatMap(child => add(child, rest, value))
          .map(nc => JObj.fromProps(o.props :+ (t -> nc)))
      case JArr(items) =>
        arrayIndex(t, items.length, allowEnd = false)
          .flatMap(i => add(items(i), rest, value).map(nc => JArr(items.updated(i, nc))))
      case other => Left(s"cannot traverse ${other.typeName} with $t")
    }
  }

  /** Remove the value at the pointer, returning (new doc, removed value). */
  def remove(doc: JDoc, tokens: List[String]): Either[String, (JDoc, JDoc)] = tokens match {
    case Nil => Right((JNull, doc))
    case t :: Nil => doc match {
      case o: JObj =>
        o.get(t).toRight(s"missing member $t")
          .map(v => (JObj(o.props.filterNot(_._1 == t)), v))
      case JArr(items) =>
        arrayIndex(t, items.length, allowEnd = false)
          .map(i => (JArr(items.take(i) ++ items.drop(i + 1)), items(i)))
      case other => Left(s"cannot remove from ${other.typeName}")
    }
    case t :: rest => doc match {
      case o: JObj =>
        o.get(t).toRight(s"missing member $t")
          .flatMap(child => remove(child, rest))
          .map { case (nc, removed) => (JObj.fromProps(o.props :+ (t -> nc)), removed) }
      case JArr(items) =>
        arrayIndex(t, items.length, allowEnd = false)
          .flatMap(i => remove(items(i), rest)
            .map { case (nc, removed) => (JArr(items.updated(i, nc)), removed) })
      case other => Left(s"cannot traverse ${other.typeName} with $t")
    }
  }
}
