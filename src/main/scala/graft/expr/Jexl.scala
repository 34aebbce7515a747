package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JEXL-subset → Catalyst `Column` translator.
  *
  * The reference evaluates user-written JEXL `filterExpressions` row-by-row
  * inside a Pig UDF (`core/DataPurifier.java:62-110`, used from
  * `udf/PurifyDataUDF.java:69-84`). Interpreting an expression per row is
  * wasted work at scale; here the expression is parsed ONCE on the driver
  * into a Catalyst Column tree, so it whole-stage-codegens and pushes down
  * to the parquet scan like any native predicate.
  *
  * Supported grammar (the subset Shifu filters actually use): field refs,
  * numeric/string/bool literals, `== != < <= > >=`, arithmetic `+ - * / %`,
  * `and or not` (and `&& || !`), parentheses, `null`.
  *
  * Lenient semantics (`DataPurifier.java:96-110`): a filter that fails to
  * compile is disabled — every row passes. `strict = true` throws instead
  * (the `shifu test -filter` path, `ShifuCLI.java:377-387`).
  */
object Jexl {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  /** Translate a JEXL filter expression; lenient → `lit(true)` on error. */
  def filter(expr: String, strict: Boolean = false): Column =
    try translate(expr)
    catch {
      case e: ParseError => if (strict) throw e else lit(true)
    }

  /** Translate a JEXL value expression (e.g. Shifu weight expressions,
    * `udf/NormalizeUDF.java:66-68`). Throws ParseError on bad input. */
  def translate(expr: String): Column = new Parser(expr).parseAll()

  // ---- lexer/parser ----

  private sealed trait Tok
  private case class Num(v: Double)    extends Tok
  private case class Str(v: String)    extends Tok
  private case class Ident(v: String)  extends Tok
  /** Backtick-quoted identifier (Spark's own quoting convention): always a
    * column reference, never a keyword/operator — lets names with JEXL
    * metacharacters ('-', ' ', '|', …) pass through the expression path.
    * The CLI backtick-escapes flag-sourced plain column names (--weight)
    * before freezing them into specs/eval sets, so a name like
    * 'my-weight' survives the JEXL round-trip instead of lexing as
    * `my minus weight`. */
  private case class QIdent(v: String) extends Tok
  private case class Op(v: String)     extends Tok
  private case object End              extends Tok

  private final class Parser(input: String) {
    private val toks = lex(input)
    private var pos = 0
    private def peek: Tok = if (pos < toks.length) toks(pos) else End
    private def next(): Tok = { val t = peek; pos += 1; t }
    private def expect(op: String): Unit = next() match {
      case Op(`op`) => ()
      case t        => throw ParseError(s"expected '$op', got $t")
    }

    def parseAll(): Column = {
      val c = parseOr()
      if (peek != End) throw ParseError(s"trailing tokens at $pos in: $input")
      c
    }

    private def parseOr(): Column = {
      var l = parseAnd()
      while (peek == Op("or") || peek == Op("||")) { next(); l = l || parseAnd() }
      l
    }
    private def parseAnd(): Column = {
      var l = parseNot()
      while (peek == Op("and") || peek == Op("&&")) { next(); l = l && parseNot() }
      l
    }
    private def parseNot(): Column = peek match {
      case Op("not") | Op("!") => next(); !parseNot()
      case _                   => parseCmp()
    }
    private def parseCmp(): Column = {
      val l = parseAdd()
      // JEXL equality is null-aware: `x == null` is TRUE for null x (the
      // reference's DataPurifierTest relies on "diagnosis == null"). Spark
      // `===` yields NULL there; `<=>` (eqNullSafe) matches JEXL exactly.
      peek match {
        case Op("==") => next(); l <=> parseAdd()
        case Op("!=") => next(); !(l <=> parseAdd())
        case Op("<")  => next(); l < parseAdd()
        case Op("<=") => next(); l <= parseAdd()
        case Op(">")  => next(); l > parseAdd()
        case Op(">=") => next(); l >= parseAdd()
        case Op("eq") => next(); l <=> parseAdd()
        case Op("ne") => next(); !(l <=> parseAdd())
        case Op("lt") => next(); l < parseAdd()
        case Op("le") => next(); l <= parseAdd()
        case Op("gt") => next(); l > parseAdd()
        case Op("ge") => next(); l >= parseAdd()
        case _        => l
      }
    }
    private def parseAdd(): Column = {
      var l = parseMul()
      var done = false
      while (!done) peek match {
        case Op("+") => next(); l = l + parseMul()
        case Op("-") => next(); l = l - parseMul()
        case _       => done = true
      }
      l
    }
    private def parseMul(): Column = {
      var l = parseUnary()
      var done = false
      while (!done) peek match {
        case Op("*") => next(); l = l * parseUnary()
        case Op("/") => next(); l = l / parseUnary()
        case Op("%") => next(); l = l % parseUnary()
        case _       => done = true
      }
      l
    }
    private def parseUnary(): Column = peek match {
      case Op("-") => next(); negate(parseUnary())
      case _       => parsePrimary()
    }
    private def parsePrimary(): Column = next() match {
      case Num(v)   => if (v == v.toLong.toDouble) lit(v.toLong) else lit(v)
      case Str(v)   => lit(v)
      case Op("(")  => val c = parseOr(); expect(")"); c
      case QIdent(v) => col(v)
      case Ident(v) => v.toLowerCase match {
        case "true"  => lit(true)
        case "false" => lit(false)
        case "null"  => lit(null)
        case _       => col(v)
      }
      case t => throw ParseError(s"unexpected token $t in: $input")
    }
    private def negate(c: Column): Column = lit(0) - c
  }

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val numTxt = s.substring(start, i)
        // wrap the NumberFormatException ("1.2.3") in ParseError: the
        // lenient filter path catches ONLY ParseError, and a raw NFE
        // crashed the job instead of disabling the bad filter
        out += Num(try numTxt.toDouble catch {
          case _: NumberFormatException =>
            throw ParseError(s"bad numeric literal '$numTxt' in: $s")
        })
      } else if (c == '"' || c == '\'') {
        val q = c; i += 1; val start = i
        while (i < n && s.charAt(i) != q) i += 1
        if (i >= n) throw ParseError(s"unterminated string in: $s")
        out += Str(s.substring(start, i)); i += 1
      } else if (c == '`') {
        i += 1; val start = i
        while (i < n && s.charAt(i) != '`') i += 1
        if (i >= n) throw ParseError(s"unterminated backtick name in: $s")
        out += QIdent(s.substring(start, i)); i += 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val w = s.substring(start, i)
        w match {
          case "and" | "or" | "not" | "eq" | "ne" | "lt" | "le" | "gt" | "ge" =>
            out += Op(w)
          case _ => out += Ident(w)
        }
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        two match {
          case "==" | "!=" | "<=" | ">=" | "&&" | "||" =>
            out += Op(two); i += 2
          case _ =>
            c match {
              case '<' | '>' | '+' | '-' | '*' | '/' | '%' | '(' | ')' | '!' =>
                out += Op(c.toString); i += 1
              case _ => throw ParseError(s"bad char '$c' in: $s")
            }
        }
      }
    }
    out.result()
  }
}
