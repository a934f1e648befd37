package graft.jq

import graft.json.JDoc

/** AST of the jq-like query language — one node per operator the reference's
  * grammar accepts (reference: src/query.rs:35-78 `Thunk`,
  * src/query_nom.rs:73-104 precedence). `opt` is the `?` error-suppression
  * suffix (reference parses it everywhere but never wires it — we implement
  * the intended jq semantics: an error AT the marked operator emits nothing).
  */
sealed trait Ast extends Serializable

object Ast {
  case object Identity extends Ast
  case object Recurse extends Ast

  /** Constant literal per input document (reference: src/ops.rs:95-248). */
  final case class Lit(value: JDoc) extends Ast

  /** `.key` / `."quoted"` (reference: src/ops.rs:251-317). */
  final case class IndexKey(key: String, opt: Boolean) extends Ast
  /** `.N` positional index, negative = from end. */
  final case class IndexNum(off: Long, opt: Boolean) extends Ast
  /** bare identifier `foo` ≡ `.foo` (reference: src/ops.rs:320-368). */
  final case class Ident(name: String, opt: Boolean) extends Ast

  /** `.[a..b]` family; end == Long.MaxValue means open end
    * (reference: src/ops.rs:371-411, grammar src/query_nom.rs:387-455). */
  final case class Slice(start: Long, end: Long, opt: Boolean) extends Ast

  /** `.[]` explode (reference: src/ops.rs:414-477). */
  final case class IterValues(opt: Boolean) extends Ast

  /** `.[e1,e2,...]` round-robin multi-pipeline (reference: src/ops.rs:480-540). */
  final case class Iterate(items: List[Ast], opt: Boolean) extends Ast

  /** `[...]` collect (reference: src/ops.rs:543-597). */
  final case class MkList(items: List[Ast], opt: Boolean) extends Ast

  /** One `{...}` entry. `value=None` is the shorthand forms `{user}` /
    * `{(kexpr)}` whose value is the input doc's field named by the key
    * (reference grammar: src/query_nom.rs:509-540; intended semantics from
    * the commented tests, src/query.rs:726-734). */
  final case class DictPair(key: Ast, value: Option[Ast])
  final case class MkDict(pairs: List[DictPair], opt: Boolean) extends Ast

  final case class Neg(e: Ast) extends Ast
  final case class Not(e: Ast) extends Ast

  /** `?` error-suppression wrapper: errored outputs of `e` are dropped
    * (intended jq semantics, SURVEY.md §2.7); also carries the `?` of
    * literal `.[...]` items so conversion can fold it
    * (reference: src/query_nom.rs:697-712). */
  final case class OptMark(e: Ast) extends Ast

  sealed trait BinOp
  object BinOp {
    case object Add extends BinOp; case object Sub extends BinOp
    case object Mul extends BinOp; case object Div extends BinOp
    case object Rem extends BinOp
    case object Eq extends BinOp;  case object Ne extends BinOp
    case object Lt extends BinOp;  case object Le extends BinOp
    case object Gt extends BinOp;  case object Ge extends BinOp
    case object Shl extends BinOp; case object Shr extends BinOp
    case object BitAnd extends BinOp; case object BitXor extends BinOp
    case object BitOr extends BinOp
    case object And extends BinOp; case object Or extends BinOp
  }
  /** Binary operator: per-entry zip of the two operand streams
    * (reference: src/ops.rs:806-1415). */
  final case class Bin(op: BinOp, l: Ast, r: Ast) extends Ast

  /** `a | b` — feed each output of a into b (reference: src/query.rs:224). */
  final case class Pipe(l: Ast, r: Ast) extends Ast

  /** EXTENSION (jq `,`): the outputs of l followed by the outputs of r.
    * Reachable only through the PARENTHESIZED form `(e1, e2, ...)` — a
    * bare ',' separates call/constructor arguments in this dialect (the
    * reference uses ',' where jq uses ';'), so the operator would be
    * ambiguous anywhere else. In path mode both operands' location
    * streams concatenate, which is what makes `(.a, .b) |= f` and
    * `path(.a, .b)` work. */
  final case class Comma(l: Ast, r: Ast) extends Ast

  /** Builtin call `name(args...)`; bare `length`/`chars`/`keys` parse as
    * zero-arg calls over `.` (reference: src/query.rs:226-242 and the
    * commented tests' intent). */
  final case class Call(name: String, args: List[Ast]) extends Ast

  /** EXTENSION (jq `//`): the truthy outputs of `l`, or — when `l` yields
    * none (every output null/false/errored) — the outputs of `r`. */
  final case class Alt(l: Ast, r: Ast) extends Ast

  /** EXTENSION (jq `if c then a [elif ...] [else b] end`): one branch
    * evaluation per condition output (fan-out); a missing else emits the
    * input unchanged, like jq. Elif chains desugar to nested IfElse at
    * parse time. */
  final case class IfElse(cond: Ast, thenB: Ast, elseB: Option[Ast]) extends Ast

  /** EXTENSION (jq): `$name` variable reference — looks up the innermost
    * `as $name` binding in scope; unbound is an error entry. */
  final case class Var(name: String) extends Ast

  /** One `def` parameter: `$name` is a VALUE param (bound like an
    * `as`-variable from the call argument's outputs, cartesian fan-out);
    * a bare `name` is a FILTER param (the argument expression itself,
    * callable inside the body — jq's closure-valued parameters). */
  final case class FuncParam(name: String, filter: Boolean)

  /** EXTENSION (jq): one `def name($a, f): body;` definition. */
  final case class FuncDef(name: String, params: List[FuncParam], body: Ast)

  /** EXTENSION (jq): function definitions scoping over `body`. Defs may
    * call themselves (recursion) and any def declared earlier; user
    * definitions shadow builtins of the same name. Defs may appear at the
    * program start OR at any pipe-stage start (`.[] | def d: 3; . + d`),
    * scoping over the REST of the pipeline. */
  final case class Defs(defs: List[FuncDef], body: Ast) extends Ast

  /** EXTENSION (jq `label $name | body`): run body; a `break $name`
    * evaluated inside it stops the body's output stream — outputs
    * produced BEFORE the break are kept. Lexically scoped; an inner
    * same-name label shadows the outer. */
  final case class Label(name: String, body: Ast) extends Ast

  /** EXTENSION (jq `break $name`): abort the lexically enclosing
    * `label $name`. Unbound names are a compile-time error ENTRY. */
  final case class Break(name: String) extends Ast

  /** EXTENSION (jq `try b catch h`): b's successful outputs pass through;
    * an error output is suppressed (no handler) or replaced by the
    * handler's outputs with the error MESSAGE string as its input. Like
    * the `?` suffix, suppression is per-branch: other fan-out branches of
    * b keep emitting (jq aborts the whole try body — documented
    * deviation, pinned in conformance). */
  final case class TryCatch(body: Ast, handler: Option[Ast]) extends Ast

  /** EXTENSION (jq): `src as $name | body` — for EACH output of src, bind
    * it to $name and run body (fan-out; body sees the ORIGINAL input as
    * `.`, jq's binding semantics). */
  final case class BindAs(src: Ast, name: String, body: Ast) extends Ast

  /** EXTENSION (jq): `reduce src as $name (init; update)` — fold update
    * over src's outputs; `.` inside update is the accumulator. `foreach`
    * is the scan variant emitting every intermediate accumulator. */
  final case class Reduce(src: Ast, name: String, init: Ast, update: Ast,
                          foreach: Boolean) extends Ast

  /** EXTENSION (jq): interpolated string `"a\(e)b"`. Parts are literal
    * text (Left) or expressions (Right); expression outputs stringify with
    * `tostring` semantics and multi-output expressions fan out (cartesian,
    * first part varies slowest — same order as dict value fan-out). */
  final case class StrInterp(parts: List[Either[String, Ast]]) extends Ast

  /** EXTENSION (not in the reference grammar; jq's own `=` / `|=`,
    * natural companion to `json_patch`): set or update the value at a
    * static path. `path` must flatten to a chain of
    * IndexKey/Ident/IndexNum segments; `update=false` evaluates `value`
    * against the ROOT input (one output per value-stream entry),
    * `update=true` pipes the CURRENT value at the path through `value`
    * and stores the first output. Missing intermediate containers are
    * created; arrays pad with nulls (jq path semantics). */
  final case class Assign(path: Ast, value: Ast, update: Boolean) extends Ast
}
