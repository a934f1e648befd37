package graft.jq

import graft.json.{JsonText, JDoc, JStr, JLong, JDouble, JBool, JNull}
import Ast._

/** Recursive-descent parser for the jq-like query language.
  *
  * Grammar and precedence follow the reference's PEG
  * (reference: src/query_nom.rs:73-104): loosest→tightest
  * `|` (separator optional — juxtaposition pipes, src/query_nom.rs:125) →
  * `||` → `&&` → comparisons → `bor` → `^` → `&` → `<< >>` → `+ -` →
  * `* / %` → primary. Two grammar gaps the reference's own tests rely on are
  * closed per intended semantics: `{ident: expr}` entries and the
  * `{(kexpr)}` dynamic shorthand (reference: src/query.rs:696-734).
  */
object JqParser {
  final case class JqParseException(msg: String, offset: Int)
      extends Exception(s"$msg at offset $offset")

  def parse(program: String): Ast = new JqParser(program).parseProgram()

  /** Builtins that may be called bare (no parens), defaulting to input `.`
    * (reference: src/query.rs:226-242 dispatch + commented tests). The
    * names beyond length/chars/keys/has/in/map/any/all are EXTENSIONS —
    * jq's everyday vocabulary over the same document model (Interp).
    *
    * DELIBERATE SHADOWING: a bare identifier is field navigation in this
    * dialect, so a bare `type`/`min`/`sort`/... now means the builtin, as
    * it does in jq (the reference set this precedent with bare
    * `length`/`chars`/`keys`). Fields with those names remain reachable
    * through every dotted/quoted form — `.type`, `."type"`, `.["type"]` —
    * which are unambiguous; only the bare word changes meaning. Pinned by
    * the "builtin names shadow only the BARE word" conformance case. */
  private[jq] val bareBuiltins = Set(
    "length", "chars", "keys",
    "type", "add", "sort", "unique", "reverse", "min", "max",
    "tostring", "tonumber", "floor", "ceil", "sqrt", "abs",
    "empty", "first", "last", "to_entries", "from_entries",
    "ascii_downcase", "ascii_upcase",
    "flatten", "paths", "leaf_paths", "tojson", "fromjson", "implode", "round",
    "not", "error", "trim", "ltrim", "rtrim", "nan", "infinite",
    "isnan", "isinfinite", "tostream", "fromstream",
    "todate", "fromdate", "gmtime", "mktime",
    "explode", "transpose", "debug",
    "arrays", "objects", "booleans", "numbers", "strings", "nulls",
    "values", "iterables", "scalars", "utf8bytelength", "combinations",
    "exp", "exp2", "exp10", "log", "log2", "log10", "fabs", "trunc",
    "recurse", "toarray")
  private[jq] val allBuiltins =
    bareBuiltins ++ Set("has", "in", "map", "any", "all", "join", "del",
      "select", "test", "range", "startswith", "endswith", "ltrimstr",
      "rtrimstr", "split", "contains",
      "sort_by", "unique_by", "group_by", "min_by", "max_by", "getpath",
      "limit", "while", "until", "setpath", "delpaths", "sub", "gsub",
      "capture", "splits", "walk", "map_values", "match", "scan", "strftime",
      "inside", "indices", "index", "rindex", "with_entries", "pow", "path",
      "nth", "pick", "truncate_stream")

  /** Reserved continuation words of the `if` form and the `as` binder
    * (EXTENSIONS): they stop juxtaposition/expression scans, so branch
    * bodies and binder sources end cleanly. Like the bare builtins, only
    * the BARE words are taken — fields named then/else/end/as stay
    * reachable as `.then`, `."else"`, `.["as"]`. */
  private[jq] val reservedWords = Set("then", "elif", "else", "end", "as", "catch")
}

final class JqParser(text: String) {
  import JqParser._

  private var pos = 0
  private var opAssignSites = 0 // fresh binder names for `op=` desugaring

  private def fail(msg: String): Nothing = throw JqParseException(msg, pos)

  private def skipWs(): Unit =
    while (pos < text.length && Character.isWhitespace(text.charAt(pos))) pos += 1

  private def atEnd: Boolean = { skipWs(); pos >= text.length }

  private def peekIs(s: String): Boolean = {
    skipWs()
    text.regionMatches(pos, s, 0, s.length)
  }

  private def eat(s: String): Boolean = {
    skipWs()
    if (text.regionMatches(pos, s, 0, s.length)) { pos += s.length; true }
    else false
  }

  private def expect(s: String): Unit =
    if (!eat(s)) fail(s"expected '$s'")

  private def isIdentStart(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
  private def isIdentChar(c: Char) = isIdentStart(c) || (c >= '0' && c <= '9')

  /** `[A-Za-z_][0-9A-Za-z_]*` (reference: src/query_nom.rs:19). */
  private def tryIdentifier(): Option[String] = {
    skipWs()
    if (pos < text.length && isIdentStart(text.charAt(pos))) {
      val start = pos
      pos += 1
      while (pos < text.length && isIdentChar(text.charAt(pos))) pos += 1
      Some(text.substring(start, pos))
    } else None
  }

  /** Word-boundary peek without consuming. */
  private def peekWord(w: String): Boolean = {
    skipWs()
    text.regionMatches(pos, w, 0, w.length) &&
      (pos + w.length >= text.length || !isIdentChar(text.charAt(pos + w.length)))
  }

  /** Keyword with word boundary (so `bor`, `null`… don't eat prefixes). */
  private def eatWord(w: String): Boolean = {
    skipWs()
    if (text.regionMatches(pos, w, 0, w.length) &&
        (pos + w.length >= text.length || !isIdentChar(text.charAt(pos + w.length)))) {
      pos += w.length; true
    } else false
  }

  /** `[+-]?\d+` (reference nom_isize, src/query_nom.rs:27-29). */
  private def tryInt(): Option[Long] = {
    skipWs()
    val start = pos
    if (pos < text.length && (text.charAt(pos) == '+' || text.charAt(pos) == '-')) pos += 1
    val dstart = pos
    while (pos < text.length && text.charAt(pos).isDigit) pos += 1
    if (pos == dstart) { pos = start; None }
    else try Some(java.lang.Long.parseLong(text.substring(start, pos)))
    catch { case _: NumberFormatException => pos = start; fail("integer out of range") }
  }

  /** `[-+]?[0-9]+\.?[0-9]*([eE][-+]?[0-9]+)?` → Long first, else Double
    * (reference: src/query_nom.rs:31-34, 700-709). */
  private def tryNumber(): Option[JDoc] = {
    skipWs()
    val start = pos
    var p = pos
    if (p < text.length && (text.charAt(p) == '+' || text.charAt(p) == '-')) p += 1
    val d0 = p
    while (p < text.length && text.charAt(p).isDigit) p += 1
    if (p == d0) return None
    var isFloat = false
    if (p < text.length && text.charAt(p) == '.') {
      isFloat = true; p += 1
      while (p < text.length && text.charAt(p).isDigit) p += 1
    }
    if (p < text.length && (text.charAt(p) == 'e' || text.charAt(p) == 'E')) {
      var q = p + 1
      if (q < text.length && (text.charAt(q) == '+' || text.charAt(q) == '-')) q += 1
      if (q < text.length && text.charAt(q).isDigit) {
        while (q < text.length && text.charAt(q).isDigit) q += 1
        isFloat = true; p = q
      }
    }
    val s = text.substring(start, p)
    pos = p
    if (!isFloat) {
      // same widening ladder as JsonText.parseNum: long → exact JBigInt
      // (full i128 range, reference json.rs:469) → double
      try Some(JLong(java.lang.Long.parseLong(s)))
      catch {
        case _: NumberFormatException =>
          val digits = s.length - (if (s.charAt(0) == '+' || s.charAt(0) == '-') 1 else 0)
          val wide =
            if (digits <= graft.json.JInt.MaxDigits)
              try Some(BigInt(s)).filter(graft.json.JInt.inI128).map(graft.json.JInt.of)
              catch { case _: NumberFormatException => None }
            else None
          // integer ladder overflow saturates (JInt.satDouble policy)
          wide.orElse(Some(JDouble(
            graft.json.JInt.satDouble(java.lang.Double.parseDouble(s)))))
      }
    } else Some(JDouble(java.lang.Double.parseDouble(s)))
  }

  /** JSON string literal, reusing the document codec's escape handling. */
  private def tryJsonString(): Option[String] = {
    skipWs()
    if (pos < text.length && text.charAt(pos) == '"') {
      val remaining = text.substring(pos)
      // parse a single string value and count consumed chars
      var depthEnd = 1
      var escape = false
      var found = -1
      while (depthEnd < remaining.length && found < 0) {
        val c = remaining.charAt(depthEnd)
        if (escape) escape = false
        else if (c == '\\') escape = true
        else if (c == '"') found = depthEnd
        depthEnd += 1
      }
      if (found < 0) fail("unterminated string literal")
      val raw = remaining.substring(0, found + 1)
      // a malformed escape (e.g. `\(` — interpolation is an expression-
      // position form, not valid in key position) must surface as a QUERY
      // parse error, never the document codec's exception type
      val parsed = (try JsonText.parse(raw) catch {
        case e: JsonText.JsonParseException => fail(s"invalid string literal: ${e.getMessage}")
      }) match {
        case JStr(s) => s
        case _        => fail("invalid string literal")
      }
      pos += found + 1
      Some(parsed)
    } else None
  }

  /** String literal in expression position: plain JSON string → Lit,
    * `"a\(expr)b"` → StrInterp (EXTENSION, jq string interpolation). The
    * interpolated expression is parsed by the real parser in place, so it
    * may itself contain strings and parens. */
  private def parseStringForm(): Ast = {
    skipWs()
    expect("\"")
    val parts = List.newBuilder[Either[String, Ast]]
    var interpolated = false
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (pos >= text.length) fail("unterminated string literal")
      val c = text.charAt(pos)
      if (c == '"') { pos += 1; done = true }
      else if (c == '\\') {
        if (pos + 1 >= text.length) fail("unterminated escape")
        text.charAt(pos + 1) match {
          case '(' =>
            interpolated = true
            if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
            pos += 2
            val e = parseExpr()
            skipWs()
            if (pos >= text.length || text.charAt(pos) != ')')
              fail("expected ')' closing string interpolation")
            pos += 1
            parts += Right(e)
          case '"'  => sb.append('"'); pos += 2
          case '\\' => sb.append('\\'); pos += 2
          case '/'  => sb.append('/'); pos += 2
          case 'b'  => sb.append('\b'); pos += 2
          case 'f'  => sb.append('\f'); pos += 2
          case 'n'  => sb.append('\n'); pos += 2
          case 'r'  => sb.append('\r'); pos += 2
          case 't'  => sb.append('\t'); pos += 2
          case 'u'  =>
            if (pos + 6 > text.length) fail("bad \\u escape")
            val cp = try Integer.parseInt(text.substring(pos + 2, pos + 6), 16)
              catch { case _: NumberFormatException => fail("bad \\u escape") }
            sb.append(cp.toChar) // surrogate pairs arrive as two \u escapes
            pos += 6
          case other => fail(s"invalid escape \\$other")
        }
      } else { sb.append(c); pos += 1 }
    }
    if (!interpolated) Lit(JStr(sb.toString))
    else {
      if (sb.nonEmpty) parts += Left(sb.toString)
      StrInterp(parts.result())
    }
  }

  private def eatOpt(): Boolean = eat("?")

  // ------------------------------------------------------------- program

  /** Names defined by the program's `def` prologue: makes `name` /
    * `name(args)` parse as calls instead of field accesses for the rest
    * of this parse. */
  private val userDefNames = scala.collection.mutable.Set.empty[String]

  def parseProgram(): Ast = {
    skipWs()
    if (atEnd) return Identity // empty program ≡ identity (reference: src/query_nom.rs:630-636)
    // defs (prologue or mid-pipe) are handled by parseExpr
    val e = parseExpr()
    skipWs()
    if (!atEnd) fail(s"trailing content: '${text.substring(pos)}'")
    e
  }

  /** One `def name($a, f): body;` (the `def` word is already consumed).
    * EXTENSION (jq function defs — value params, ','-separated like every
    * call in this dialect). */
  private def parseOneDef(): FuncDef = {
    skipWs()
    val name = tryIdentifier().getOrElse(fail("expected function name after 'def'"))
    userDefNames += name // before the body parse: recursion sees itself
    val params = List.newBuilder[FuncParam]
    skipWs()
    def oneParam(): FuncParam = {
      skipWs()
      if (peekIs("$")) FuncParam(parseVarName(), filter = false)
      else FuncParam(
        tryIdentifier().getOrElse(fail("expected parameter ('$value' or bare filter name)")),
        filter = true)
    }
    if (eat("(")) {
      params += oneParam()
      while ({ skipWs(); eat(",") }) params += oneParam()
      skipWs()
      expect(")")
    }
    skipWs()
    expect(":")
    // FILTER params are callable (bare or with args) inside THIS body
    // only — scope the name registration to the body parse
    val ps = params.result()
    val filterNames = ps.filter(_.filter).map(_.name).filterNot(userDefNames)
    filterNames.foreach(userDefNames += _)
    val body = try parseExpr() finally filterNames.foreach(userDefNames -= _)
    skipWs()
    expect(";")
    FuncDef(name, ps, body)
  }

  /** Zero or more consecutive `def ...;` at an expression start. */
  private def parseDefs(): List[FuncDef] = {
    val defs = List.newBuilder[FuncDef]
    while ({ skipWs(); eatWord("def") }) defs += parseOneDef()
    defs.result()
  }

  /** attempt `p`, restoring position on failure. */
  private def attempt[A](p: () => A): Option[A] = {
    val save = pos
    try Some(p())
    catch { case _: JqParseException => pos = save; None }
  }

  // Pipe level: `a | b`, separator optional (juxtaposition pipes `.a .b`).
  // Assignment (`=` / `|=`, EXTENSION — see Ast.Assign) binds the
  // juxtaposed path segment accumulated since the last EXPLICIT pipe, so
  // `.a.b = 1` assigns into the root while `.a | .b = 1` assigns inside
  // the piped value (jq's own precedence).
  def parseExpr(): Ast = parseExpr(commaOk = false)

  /** `commaOk` admits jq's comma OPERATOR at stage level — commas bind
    * TIGHTER than pipes (jq: `a | b, c` is `a | (b, c)`), so each pipe
    * stage is a comma chain. Only parenthesized groups set it (bare ','
    * separates call args in this dialect); the flag propagates through
    * binder/def tails so `(.x as $v | $v, 1)` keeps the jq grouping. */
  private def parseExpr(commaOk: Boolean): Ast = {
    // `def ...;` at an expression start scopes over the REST of the
    // expression (jq's rule — mid-program defs, not just a prologue)
    val defs0 = parseDefs()
    if (defs0.nonEmpty) return Defs(defs0, parseExpr(commaOk))
    def stage(): Ast = {
      var e = parseStage()
      if (commaOk) {
        skipWs()
        while (eat(",")) { e = Comma(e, parseStage()); skipWs() }
      }
      e
    }
    var lhs = stage()
    // `src as $x | body` (EXTENSION, jq binder): body is the REST of the
    // pipeline, so chained binders nest right-associatively
    skipWs()
    if (eatWord("as")) {
      val name = parseVarName()
      skipWs()
      if (!eat("|")) fail("expected '|' after as $" + name)
      return BindAs(lhs, name, parseExpr(commaOk))
    }
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("|") && !peekIs("||") && !peekIs("|=")) {
        expect("|")
        // defs after a pipe scope over the rest of the pipeline:
        // `.[] | def d: 3; . + d` (right-associative, like binders)
        val midDefs = parseDefs()
        if (midDefs.nonEmpty) return Pipe(lhs, Defs(midDefs, parseExpr(commaOk)))
        val rhs = stage()
        skipWs()
        if (eatWord("as")) {
          val name = parseVarName()
          skipWs()
          if (!eat("|")) fail("expected '|' after as $" + name)
          return Pipe(lhs, BindAs(rhs, name, parseExpr(commaOk)))
        }
        lhs = Pipe(lhs, rhs)
      } else done = true
    }
    lhs
  }

  /** `$name` after `as` / in reduce/foreach binders. */
  private def parseVarName(): String = {
    skipWs()
    if (!eat("$")) fail("expected '$variable'")
    tryIdentifier().getOrElse(fail("expected variable name after '$'"))
  }

  /** One pipe stage: a juxtaposition chain with optional `=` / `|=` /
    * `//`. Both sides of an assignment take the FULL juxtaposed chain, so
    * `.a = .b.c` assigns the value at path b.c — not `(.a = .b) | .c`.
    * `//` sits at the same level, left-associative (a simplification of
    * jq's exact `//`-vs-`=` ordering; parenthesize to override). */
  private def parseStage(): Ast = {
    var lhs = parseJuxt()
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("|=")) {
        expect("|=")
        lhs = Assign(lhs, parseJuxt(), update = true)
      } else if (peekIs("+=") || peekIs("-=") || peekIs("*=") || peekIs("//=") ||
                 peekIs("/=") || peekIs("%=")) {
        // EXTENSION (jq update-assignment): `p op= e` desugars to
        // `e as $v | p |= . op $v` — the RHS is evaluated against the
        // ROOT input (jq: {"a":1,"b":2} | .a += .b → {"a":3,...}), then
        // each denoted location updates through the bound value. The
        // binder name is compiler-reserved (fresh per site).
        val upd: Ast => Ast =
          if (eat("+=")) v => Bin(BinOp.Add, Identity, v)
          else if (eat("-=")) v => Bin(BinOp.Sub, Identity, v)
          else if (eat("*=")) v => Bin(BinOp.Mul, Identity, v)
          else if (eat("//=")) v => Alt(Identity, v)
          else if (eat("/=")) v => Bin(BinOp.Div, Identity, v)
          else { expect("%="); v => Bin(BinOp.Rem, Identity, v) }
        val vName = s"__opassign_$opAssignSites"
        opAssignSites += 1
        lhs = BindAs(parseJuxt(), vName, Assign(lhs, upd(Var(vName)), update = true))
      } else if (peekIs("//")) {
        expect("//")
        lhs = Alt(lhs, parseJuxt())
      } else if (peekIs("=") && !peekIs("==")) {
        expect("=")
        lhs = Assign(lhs, parseJuxt(), update = false)
      } else done = true
    }
    lhs
  }

  /** One primary plus any directly following dot segments — the operand
    * of a unary operator: exactly a navigation chain, never an arithmetic
    * continuation. */
  private def parsePathChain(): Ast = {
    var e = parsePrimary()
    while (peekIs(".") && !peekIs("..")) e = Pipe(e, parsePrimary())
    e
  }

  /** Juxtaposition chain: `.a .b` / `.a.b` pipe without a separator. */
  private def parseJuxt(): Ast = {
    var lhs = parseOr()
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("|") || peekIs("=") || atEnd) done = true
      else {
        attempt(() => parseOr()) match {
          case Some(rhs) => lhs = Pipe(lhs, rhs)
          case None      => done = true
        }
      }
    }
    lhs
  }

  private def parseOr(): Ast = {
    var l = parseAnd()
    while (peekIs("||") && { expect("||"); true }) l = Bin(BinOp.Or, l, parseAnd())
    l
  }

  private def parseAnd(): Ast = {
    var l = parseCmp()
    while (peekIs("&&") && { expect("&&"); true }) l = Bin(BinOp.And, l, parseCmp())
    l
  }

  private def parseCmp(): Ast = {
    var l = parseBitOr()
    var done = false
    while (!done) {
      skipWs()
      if (eat("==")) l = Bin(BinOp.Eq, l, parseBitOr())
      else if (eat("!=")) l = Bin(BinOp.Ne, l, parseBitOr())
      else if (eat("<=")) l = Bin(BinOp.Le, l, parseBitOr())
      else if (eat(">=")) l = Bin(BinOp.Ge, l, parseBitOr())
      else if (peekIs("<<") || peekIs(">>")) done = true // shifts, not comparisons
      else if (eat("<")) l = Bin(BinOp.Lt, l, parseBitOr())
      else if (eat(">")) l = Bin(BinOp.Gt, l, parseBitOr())
      else done = true
    }
    l
  }

  private def parseBitOr(): Ast = {
    var l = parseBitXor()
    while ({ skipWs(); eatWord("bor") }) l = Bin(BinOp.BitOr, l, parseBitXor())
    l
  }

  private def parseBitXor(): Ast = {
    var l = parseBitAnd()
    while (eat("^")) l = Bin(BinOp.BitXor, l, parseBitAnd())
    l
  }

  private def parseBitAnd(): Ast = {
    var l = parseShift()
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("&&")) done = true
      else if (eat("&")) l = Bin(BinOp.BitAnd, l, parseShift())
      else done = true
    }
    l
  }

  private def parseShift(): Ast = {
    var l = parseAdd()
    var done = false
    while (!done) {
      if (eat("<<")) l = Bin(BinOp.Shl, l, parseAdd())
      else if (eat(">>")) l = Bin(BinOp.Shr, l, parseAdd())
      else done = true
    }
    l
  }

  private def parseAdd(): Ast = {
    var l = parseMul()
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("+=") || peekIs("-=")) done = true // update-assignment, parseStage's
      else if (eat("+")) l = Bin(BinOp.Add, l, parseMul())
      else if (eat("-")) l = Bin(BinOp.Sub, l, parseMul())
      else done = true
    }
    l
  }

  private def parseMul(): Ast = {
    var l = parsePrimary()
    var done = false
    while (!done) {
      skipWs()
      if (peekIs("*=") || peekIs("/=") || peekIs("%=")) done = true // update-assignment
      else if (eat("*")) l = Bin(BinOp.Mul, l, parsePrimary())
      else if (peekIs("//")) done = true // `a // b` / `a //= b`, not division
      else if (eat("/")) l = Bin(BinOp.Div, l, parsePrimary())
      else if (eat("%")) l = Bin(BinOp.Rem, l, parsePrimary())
      else done = true
    }
    l
  }

  // ------------------------------------------------------------- primary

  private def parsePrimary(): Ast = {
    skipWs()
    if (pos >= text.length) fail("unexpected end of query")
    val c = text.charAt(pos)
    if (c == '.') parseDotForm()
    else if (c == '(') {
      // `(e)` — or `(e1, e2, ...)`: jq's comma operator, which this
      // dialect admits ONLY inside parens (bare ',' separates call
      // args). Commas bind tighter than pipes, jq-style: `(a | b, c)`
      // is `a | (b, c)` — parseExpr(commaOk) puts the comma chain at
      // pipe-STAGE level, not around the whole pipe chain.
      expect("(")
      val e = parseExpr(commaOk = true)
      expect(")")
      if (eatOpt()) OptMark(e) else e // `(...)?` suppresses the whole group
    }
    else if (c == '[') parseListForm()
    else if (c == '{') parseDictForm()
    else if (c == '"') {
      val lit = parseStringForm()
      val opt = eatOpt()
      if (opt) OptMark(lit) else lit
    }
    else if (c == '$') {
      expect("$")
      Var(tryIdentifier().getOrElse(fail("expected variable name after '$'")))
    }
    // unary operand binds TIGHT (one path chain): `!.a == .b` is
    // `(!.a) == .b` — the reference's PEG comment ('-' Primary |
    // '!' Primary); its nom_expr code loosely wraps the whole rest
    // (query_nom.rs:551-564), which contradicts the grammar it documents.
    // In THIS parser a multi-segment path `.a.b` spans several primaries
    // (juxtaposition), so the operand is one primary plus any directly
    // following dot segments: `-.a.b` negates the value at path a.b,
    // while `-.k + 1` is still (-.k) + 1.
    else if (c == '!') { expect("!"); Not(parsePathChain()) }
    else if (c == '-' || c == '+' || c.isDigit) {
      tryNumber() match {
        case Some(n) =>
          val opt = eatOpt()
          if (opt) OptMark(Lit(n)) else Lit(n)
        case None =>
          if (c == '-') { expect("-"); Neg(parsePathChain()) } // `-.k + 1` = (-.k) + 1
          else fail(s"unexpected character '$c'")
      }
    }
    else if (c == '@') {
      // EXTENSION (jq format strings): @csv/@tsv/@base64/... — zero-arg
      // builtins over `.`, dispatched with the '@' kept in the name
      expect("@")
      val name = tryIdentifier().getOrElse(fail("expected format name after '@'"))
      Call("@" + name, Nil)
    }
    else if (isIdentStart(c)) parseWordForm()
    else fail(s"unexpected character '$c'")
  }

  /** keywords, builtins, bare identifiers. */
  private def parseWordForm(): Ast = {
    skipWs()
    // reserved if-continuations terminate whatever scan reached them
    reservedWords.find(w => peekWord(w)).foreach(w => fail(s"unexpected '$w'"))
    if (eatWord("if")) parseIfForm()
    else if (eatWord("reduce")) parseReduceForm(foreach = false)
    else if (eatWord("foreach")) parseReduceForm(foreach = true)
    // label/break are keywords only when followed by `$` — a user def or
    // field named label/break (pinned by conformance) stays reachable
    else if (peekWord("label") && { val save = pos; eatWord("label"); val isL = peekIs("$"); if (!isL) pos = save; isL }) {
      // EXTENSION (jq label): scopes the REST of the pipeline, like
      // binders — `label $out | body`
      val name = parseVarName()
      skipWs()
      if (!eat("|")) fail("expected '|' after label $" + name)
      Label(name, parseExpr())
    }
    else if (peekWord("break") && { val save = pos; eatWord("break"); val isB = peekIs("$"); if (!isB) pos = save; isB })
      Break(parseVarName())
    else if (eatWord("try")) {
      // EXTENSION (jq try/catch): body and handler bind TIGHT (one path
      // chain, like unary operands) — `try .a.b catch null | f` pipes the
      // try's outputs; parenthesize for a wider body. jq's own grammar
      // also binds try to a term.
      val body = parsePathChain()
      skipWs()
      val handler = if (eatWord("catch")) Some(parsePathChain()) else None
      TryCatch(body, handler)
    }
    else if (eatWord("null")) { val o = eatOpt(); if (o) OptMark(Lit(JNull)) else Lit(JNull) }
    else if (eatWord("true")) { val o = eatOpt(); if (o) OptMark(Lit(JBool(true))) else Lit(JBool(true)) }
    else if (eatWord("false")) { val o = eatOpt(); if (o) OptMark(Lit(JBool(false))) else Lit(JBool(false)) }
    else {
      val name = tryIdentifier().getOrElse(fail("expected identifier"))
      skipWs()
      if (peekIs("(") && (allBuiltins.contains(name) || userDefNames(name))) {
        expect("(")
        val args = scala.collection.mutable.ListBuffer.empty[Ast]
        skipWs()
        if (!peekIs(")")) {
          args += parseExpr()
          while (eat(",")) args += parseExpr()
        }
        expect(")")
        val call = Call(name, args.toList)
        if (eatOpt()) OptMark(call) else call
      } else if (bareBuiltins.contains(name) || userDefNames(name)) {
        val call = Call(name, Nil) // bare length/chars/keys apply to `.`
        if (eatOpt()) OptMark(call) else call
      } else {
        Ident(name, eatOpt())
      }
    }
  }

  /** `reduce SRC as $x (init; update)` / `foreach SRC as $x (init;
    * update)` (EXTENSION, jq folds; the keyword was already consumed).
    * SRC is a juxtaposition chain — the reserved word `as` ends it. */
  private def parseReduceForm(foreach: Boolean): Ast = {
    val src = parseJuxt()
    skipWs()
    if (!eatWord("as")) fail("expected 'as' in reduce/foreach")
    val name = parseVarName()
    skipWs()
    expect("(")
    val init = parseExpr()
    skipWs()
    expect(";")
    val update = parseExpr()
    skipWs()
    expect(")")
    Reduce(src, name, init, update, foreach)
  }

  /** `if COND then A [elif C then B]* [else D] end` (EXTENSION; `if` was
    * already consumed). The reserved continuation words make every inner
    * parseExpr stop cleanly at its branch boundary. */
  private def parseIfForm(): Ast = {
    val cond = parseExpr()
    if (!eatWord("then")) fail("expected 'then'")
    val thenB = parseExpr()
    def parseTail(): Option[Ast] =
      if (eatWord("elif")) {
        val c = parseExpr()
        if (!eatWord("then")) fail("expected 'then'")
        val b = parseExpr()
        Some(IfElse(c, b, parseTail()))
      } else if (eatWord("else")) Some(parseExpr())
      else None
    val elseB = parseTail()
    if (!eatWord("end")) fail("expected 'end'")
    IfElse(cond, thenB, elseB)
  }

  /** Everything starting with '.': slices, `.[]`, `.[items]`, `.key`,
    * `..`, identity. */
  private def parseDotForm(): Ast = {
    expect(".")
    // `. end` is identity followed by the reserved word; `.end` (no
    // whitespace) stays field access — the documented escape form
    if (pos < text.length && Character.isWhitespace(text.charAt(pos)) &&
        reservedWords.exists(peekWord))
      return Identity
    skipWs()
    if (pos < text.length && text.charAt(pos) == '.') {
      pos += 1
      return Recurse // `..`
    }
    if (pos < text.length && text.charAt(pos) == '[') {
      pos += 1
      skipWs()
      if (pos < text.length && text.charAt(pos) == ']') {
        pos += 1
        return IterValues(eatOpt()) // `.[]`
      }
      // try the slice forms first (reference alt order, src/query_nom.rs:604-610)
      attempt(() => parseSliceBody()) match {
        case Some(s) => return s
        case None    => ()
      }
      // `.[e1, e2, ...]`
      val items = scala.collection.mutable.ListBuffer.empty[Ast]
      items += parseExpr()
      while (eat(",")) items += parseExpr()
      expect("]")
      val opt1 = eatOpt()
      val converted = items.toList.map {
        case Lit(JLong(n))          => IndexNum(n, opt1)
        case OptMark(Lit(JLong(n))) => IndexNum(n, opt = true)
        case Lit(JStr(s))           => IndexKey(s, opt1)
        case OptMark(Lit(JStr(s)))  => IndexKey(s, opt = true)
        case Ident(n, o)            => Ident(n, o || opt1)
        case IndexKey(s, o)         => IndexKey(s, o || opt1)
        case IndexNum(n, o)         => IndexNum(n, o || opt1)
        case other                  => other
      }
      val it = Iterate(converted, opt1)
      if (opt1) OptMark(it) else it
    } else {
      // `.key` | `.N` | `."quoted"` | bare `.`
      tryIdentifier() match {
        case Some(name) => return IndexKey(name, eatOpt())
        case None       => ()
      }
      skipWs()
      if (pos < text.length && text.charAt(pos).isDigit) {
        val start = pos
        while (pos < text.length && text.charAt(pos).isDigit) pos += 1
        val n = try java.lang.Long.parseLong(text.substring(start, pos))
          catch { case _: NumberFormatException => fail("integer index out of range") }
        return IndexNum(n, eatOpt())
      }
      tryJsonString() match {
        case Some(s) => IndexKey(s, eatOpt())
        case None    => Identity
      }
    }
  }

  /** After `.[`: `a..b` | `a..=b` | `a..` | `..b` | `..=b` | `..`
    * (reference: src/query_nom.rs:387-455). */
  private def parseSliceBody(): Ast = {
    val start = tryInt()
    if (!eat("..")) fail("not a slice")
    val inclusive = eat("=")
    val end = tryInt()
    if (inclusive && end.isEmpty) fail("expected end after ..=")
    expect("]")
    val opt = eatOpt()
    Slice(
      start.getOrElse(0L),
      end.map(e => if (inclusive) e + 1 else e).getOrElse(Long.MaxValue),
      opt)
  }

  private def parseListForm(): Ast = {
    expect("[")
    val items = scala.collection.mutable.ListBuffer.empty[Ast]
    skipWs()
    if (!peekIs("]")) {
      items += parseExpr()
      while (eat(",")) items += parseExpr()
    }
    expect("]")
    val opt = eatOpt()
    val ml = MkList(items.toList, opt)
    if (opt) OptMark(ml) else ml
  }

  private def parseDictForm(): Ast = {
    expect("{")
    val pairs = scala.collection.mutable.ListBuffer.empty[DictPair]
    skipWs()
    if (!peekIs("}")) {
      pairs += parseDictPair()
      while (eat(",")) pairs += parseDictPair()
    }
    expect("}")
    val opt = eatOpt()
    val md = MkDict(pairs.toList, opt)
    if (opt) OptMark(md) else md
  }

  /** `"k": v` | `(kexpr): v` | `(kexpr)` | `ident: v` | `ident`
    * (reference: src/query_nom.rs:509-540 + intended semantics from
    * src/query.rs:696-734). */
  private def parseDictPair(): DictPair = {
    skipWs()
    tryJsonString() match {
      case Some(s) =>
        expect(":")
        return DictPair(Lit(JStr(s)), Some(parseExpr()))
      case None => ()
    }
    if (peekIs("(")) {
      expect("(")
      val k = parseExpr()
      expect(")")
      if (eat(":")) DictPair(k, Some(parseExpr()))
      else DictPair(k, None) // dynamic `{(kexpr)}` shorthand
    } else {
      val name = tryIdentifier().getOrElse(fail("expected object key"))
      if (eat(":")) DictPair(Lit(JStr(name)), Some(parseExpr()))
      else DictPair(Lit(JStr(name)), None) // `{user}` shorthand
    }
  }
}
