package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz for the JEXL-subset translator (`expr/Jexl.scala`) — the
  * one hand-written parser in the hot ingestion path. The fuzz gate only
  * exercises it through fixed filterExpressions; this spec generates
  * random expressions over the reference grammar subset
  * (`DataPurifier.java:62-110` semantics: field refs, arithmetic,
  * comparisons, and/or/not, lenient failure) and compares the translated
  * Catalyst column's per-row verdict against an INDEPENDENT interpreter
  * implementing the documented contract:
  *
  *  - `==`/`!=` are null-safe (JEXL `x == null` is TRUE for null x);
  *  - ordering comparisons with a NULL operand are UNKNOWN;
  *  - and/or/not follow Kleene three-valued logic;
  *  - doubles compare with Spark's total-order NaN (NaN == NaN, NaN
  *    larger than everything) and 0.0 == -0.0;
  *  - arithmetic is IEEE on doubles, exact on small integer literals.
  *
  * Every seed prints on failure, so a red run is replayable verbatim.
  */
class JexlPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- expression AST: render to JEXL text + evaluate independently ----

  private sealed trait V
  private case object VNull extends V
  private final case class VNum(d: Double) extends V
  private final case class VStr(s: String) extends V

  private sealed trait Ex { def render: String }
  // numeric-valued
  private case class NLit(v: Double, int: Boolean) extends Ex {
    def render: String = if (int) v.toLong.toString else v.toString
  }
  private case class NCol(name: String) extends Ex { def render: String = name }
  private case class Arith(op: String, l: Ex, r: Ex) extends Ex {
    def render: String = s"(${l.render} $op ${r.render})"
  }
  private case class Neg(e: Ex) extends Ex {
    def render: String = s"(-${e.render})"
  }
  // string-valued
  private case class SLit(v: String) extends Ex {
    def render: String = "\"" + v + "\""
  }
  private case class SCol(name: String) extends Ex { def render: String = name }
  private case object NullLit extends Ex { def render: String = "null" }
  // boolean-valued
  private case class Cmp(op: String, l: Ex, r: Ex) extends Ex {
    def render: String = s"(${l.render} $op ${r.render})"
  }
  private case class BLit(v: Boolean) extends Ex { def render: String = v.toString }
  private case class Logic(op: String, l: Ex, r: Ex) extends Ex {
    def render: String = s"(${l.render} $op ${r.render})"
  }
  private case class Not(e: Ex) extends Ex {
    def render: String = s"(not ${e.render})"
  }

  /** Spark's numeric comparison total-order bits the contract pins:
    * NaN == NaN, NaN above everything, 0.0 == -0.0. */
  private def numCmp(l: Double, r: Double): Int =
    if (l.isNaN && r.isNaN) 0
    else if (l.isNaN) 1
    else if (r.isNaN) -1
    else if (l == r) 0 // covers 0.0 == -0.0
    else if (l < r) -1
    else 1

  private def evalNum(e: Ex, row: Map[String, V]): Option[Double] = e match {
    case NLit(v, _) => Some(v)
    case NCol(n) => row(n) match {
      case VNum(d) => Some(d); case VNull => None
      case other => sys.error(s"numeric col $n held $other")
    }
    case Neg(x) => evalNum(x, row).map(0.0 - _)
    case Arith(op, l, r) =>
      for (a <- evalNum(l, row); b <- evalNum(r, row)) yield op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
      }
    case other => sys.error(s"not numeric: $other")
  }

  private def evalVal(e: Ex, row: Map[String, V]): V = e match {
    case NullLit => VNull
    case SLit(v) => VStr(v)
    case SCol(n) => row(n)
    case n => evalNum(n, row).map(VNum.apply).getOrElse(VNull)
  }

  private def evalBool(e: Ex, row: Map[String, V]): Option[Boolean] = e match {
    case BLit(v) => Some(v)
    case Not(x) => evalBool(x, row).map(!_)
    case Logic("and", l, r) =>
      (evalBool(l, row), evalBool(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Logic("or", l, r) =>
      (evalBool(l, row), evalBool(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case Cmp(op, l, r) =>
      val (a, b) = (evalVal(l, row), evalVal(r, row))
      op match {
        // null-safe equality: total, never UNKNOWN
        case "==" | "eq" => Some(eqSafe(a, b))
        case "!=" | "ne" => Some(!eqSafe(a, b))
        case _ =>
          (a, b) match {
            case (VNull, _) | (_, VNull) => None
            case _ =>
              val c = (a, b) match {
                case (VNum(x), VNum(y)) => numCmp(x, y)
                case (VStr(x), VStr(y)) => Integer.signum(x.compareTo(y))
                case _ => sys.error(s"mixed cmp $a $b")
              }
              Some(op match {
                case "<" | "lt" => c < 0
                case "<=" | "le" => c <= 0
                case ">" | "gt" => c > 0
                case ">=" | "ge" => c >= 0
              })
          }
      }
    case other => sys.error(s"not boolean: $other")
  }

  private def eqSafe(a: V, b: V): Boolean = (a, b) match {
    case (VNull, VNull) => true
    case (VNull, _) | (_, VNull) => false
    case (VNum(x), VNum(y)) => numCmp(x, y) == 0
    case (VStr(x), VStr(y)) => x == y
    case _ => sys.error(s"mixed eq $a $b")
  }

  // ---- seeded generator (type-directed, ANSI-safe) ----
  // ANSI traps deliberately kept OUT of the generated domain: / and %
  // take only NONZERO integer-literal denominators (ANSI throws on
  // divide-by-zero, even for doubles), literals stay small and nesting
  // shallow so long arithmetic can't overflow.

  private final class Gen(seed: Long) {
    private val rnd = new scala.util.Random(seed)
    private val strPool = Vector("a", "bee", "Cee", "", "zz", "a b")

    private def numAtom(): Ex = rnd.nextInt(6) match {
      case 0 => NCol("a")
      case 1 => NCol("b")
      case 2 => NLit(rnd.between(-20, 21).toDouble, int = true)
      case 3 => NLit(math.rint(rnd.between(-2000, 2001) / 100.0 * 100) / 100.0,
        int = false)
      case 4 => NLit(rnd.between(0, 10).toDouble, int = true)
      case _ => NCol("a")
    }

    def num(depth: Int): Ex =
      if (depth <= 0) numAtom()
      else rnd.nextInt(8) match {
        case 0 | 1 => Arith(Seq("+", "-", "*")(rnd.nextInt(3)),
          num(depth - 1), num(depth - 1))
        case 2 =>
          val d = rnd.between(1, 9)
          Arith(if (rnd.nextBoolean()) "/" else "%", num(depth - 1),
            NLit((if (rnd.nextBoolean()) d else -d).toDouble, int = true))
        case 3 => Neg(num(depth - 1))
        case _ => numAtom()
      }

    def cmp(depth: Int): Ex = {
      val ordOps = Seq("<", "<=", ">", ">=", "lt", "le", "gt", "ge")
      val eqOps = Seq("==", "!=", "eq", "ne")
      rnd.nextInt(10) match {
        case 0 => // string comparison (same-type)
          val l = if (rnd.nextBoolean()) SCol("s") else SCol("t")
          val r = rnd.nextInt(3) match {
            case 0 => SLit(strPool(rnd.nextInt(strPool.size)))
            case 1 => if (rnd.nextBoolean()) SCol("s") else SCol("t")
            case _ => SLit(strPool(rnd.nextInt(strPool.size)))
          }
          Cmp((eqOps ++ ordOps)(rnd.nextInt(12)), l, r)
        case 1 => // x == null (the reference's own idiom)
          Cmp(eqOps(rnd.nextInt(4)),
            if (rnd.nextBoolean()) NCol("a") else SCol("s"), NullLit)
        case _ =>
          Cmp((eqOps ++ ordOps)(rnd.nextInt(12)), num(depth), num(depth))
      }
    }

    def bool(depth: Int): Ex =
      if (depth <= 0) cmp(1)
      else rnd.nextInt(8) match {
        case 0 | 1 => Logic("and", bool(depth - 1), bool(depth - 1))
        case 2 | 3 => Logic("or", bool(depth - 1), bool(depth - 1))
        case 4 => Not(bool(depth - 1))
        case 5 => BLit(rnd.nextBoolean())
        case _ => cmp(depth - 1)
      }

    def mutate(s: String): String = rnd.nextInt(5) match {
      case 0 => s + " @"
      case 1 => s.replaceFirst("\\(", "") + "(" // unbalance
      case 2 => s + " 1.2.3"
      case 3 => "#" + s
      case _ => s + " and"
    }
  }

  // ---- adversarial row table ----

  private val doubles = Vector[java.lang.Double](
    null, 0.0, -0.0, 1.0, -1.0, 19.0, -20.0, 0.5, -3.25,
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
    1e300, -1e300, 1e-300, 7.0, 2.0, -7.5, 13.0, 4.0)
  private val strings = Vector[String](
    null, "", "a", "bee", "Cee", "zz", "a b", "0", "Bee")

  private lazy val rowsLocal: Seq[(Long, Map[String, V])] = {
    val rnd = new scala.util.Random(1234L)
    (0L until 64L).map { id =>
      def d() = doubles(rnd.nextInt(doubles.size))
      def s() = strings(rnd.nextInt(strings.size))
      val (a, b, sv, tv) = (d(), d(), s(), s())
      (id, Map[String, V](
        "a" -> Option(a).map(x => VNum(x.doubleValue)).getOrElse(VNull),
        "b" -> Option(b).map(x => VNum(x.doubleValue)).getOrElse(VNull),
        "s" -> Option(sv).map(VStr.apply).getOrElse(VNull),
        "t" -> Option(tv).map(VStr.apply).getOrElse(VNull)))
    }
  }

  private lazy val df = {
    val rnd = new scala.util.Random(1234L) // same stream as rowsLocal
    val s0 = spark
    import s0.implicits._
    (0L until 64L).map { id =>
      def d() = doubles(rnd.nextInt(doubles.size))
      def s() = strings(rnd.nextInt(strings.size))
      (id, Option(d()).map(_.doubleValue), Option(d()).map(_.doubleValue),
        Option(s()), Option(s()))
    }.toDF("id", "a", "b", "s", "t").cache()
  }

  test("500 random grammar-subset expressions: Spark verdict == " +
    "independent three-valued interpreter on all 64 adversarial rows") {
    val seeds = Seq(7L, 42L, 20260816L)
    var checked = 0
    seeds.foreach { seed =>
      val g = new Gen(seed)
      val exprs = Vector.fill(167)(g.bool(3))
      // evaluate in batches: all predicates as select columns, ONE job
      // per batch — verdicts arrive as true/false/null, strictly
      // stronger than a filter row-set compare
      exprs.grouped(32).foreach { batch =>
        val cols = col("id") +: batch.zipWithIndex.map { case (e, i) =>
          graft.expr.Jexl.translate(e.render).as(s"e$i")
        }
        val got = df.select(cols: _*).collect()
          .map(r => r.getLong(0) -> r).toMap
        rowsLocal.foreach { case (id, rowV) =>
          val r = got(id)
          batch.zipWithIndex.foreach { case (e, i) =>
            val want = evalBool(e, rowV)
            val have = if (r.isNullAt(i + 1)) None else Some(r.getBoolean(i + 1))
            assert(have === want,
              s"seed=$seed row=$id expr=${e.render}\nrow=$rowV")
            checked += 1
          }
        }
      }
    }
    assert(checked === 500 * 64 + 64) // 501 exprs x 64 rows (rounding)
  }

  test("lenient mode: mutated/garbled expressions disable the filter " +
    "(all rows pass) and strict mode throws ParseError") {
    val g = new Gen(99L)
    val n = df.count()
    (1 to 60).foreach { _ =>
      val bad = g.mutate(g.bool(2).render)
      // not every mutation is invalid (e.g. trailing-and on a string
      // that already ends in an operand can still parse) — only assert
      // the CONTRACT: strict-throws iff lenient-disabled, and lenient
      // never crashes the job
      val strictThrew =
        try { graft.expr.Jexl.translate(bad); false }
        catch { case _: graft.expr.Jexl.ParseError => true }
      val kept = df.filter(graft.expr.Jexl.filter(bad)).count()
      if (strictThrew) assert(kept === n,
        s"lenient must pass ALL rows for unparseable [$bad], kept $kept")
    }
    // canonical malformed shapes stay ParseError (not NFE / SQL errors)
    Seq("1.2.3", "a >", "(a > 1", "a @ 1", "\"unterminated", "`oops",
      "a > 1 )", "== 3").foreach { bad =>
      intercept[graft.expr.Jexl.ParseError] {
        graft.expr.Jexl.translate(bad)
      }
      assert(df.filter(graft.expr.Jexl.filter(bad)).count() === n)
    }
  }
}
