package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Jexl

class JexlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions.col

  private def rows = {
    import spark.implicits._
    Seq((1, 10.0, "R"), (2, 50.0, "N"), (3, 30.0, "R"), (4, 5.0, "A"))
      .toDF("id", "qty", "flag")
  }

  test("comparison + boolean operators") {
    val got = rows.filter(Jexl.filter("qty > 20 and flag == 'R'"))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got === Set(3))
  }

  test("jexl keyword operators (eq/and/or/not)") {
    val got = rows.filter(Jexl.filter("flag eq 'R' or qty le 5"))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got === Set(1, 3, 4))
  }

  test("arithmetic expression as value") {
    val got = rows.select(Jexl.translate("qty * 2 + 1").as("v"))
      .collect().map(_.getDouble(0)).toSet
    assert(got === Set(21.0, 101.0, 61.0, 11.0))
  }

  test("unary minus and parentheses") {
    val got = rows.filter(Jexl.filter("-(qty - 20) > 0"))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got === Set(1, 4))
  }

  test("backtick-quoted identifier is a single column ref, never " +
    "arithmetic or a keyword") {
    val hostile = rows.withColumn("my-weight", col("qty") * 2)
      .withColumn("true", col("qty") + 1)
    // unquoted 'my-weight' would lex as `my - weight` (two unknown cols)
    val got = hostile.select(Jexl.translate("`my-weight` + 1").as("v"))
      .collect().map(_.getDouble(0)).toSet
    assert(got === Set(21.0, 101.0, 61.0, 11.0))
    // a backticked keyword is still a column lookup
    val kw = hostile.select(Jexl.translate("`true`").as("v"))
      .collect().map(_.getDouble(0)).toSet
    assert(kw === Set(11.0, 51.0, 31.0, 6.0))
    // unterminated quote fails loudly
    intercept[Jexl.ParseError](Jexl.translate("`my-weight + 1"))
  }

  test("null equality follows JEXL semantics (DataPurifierTest patterns)") {
    import spark.implicits._
    val d = Seq((1, Some("M")), (2, Some("B")), (3, None))
      .toDF("id", "diagnosis")
    // "diagnosis == null" must keep ONLY the null row
    assert(d.filter(Jexl.filter("diagnosis == null"))
      .select("id").collect().map(_.getInt(0)).toSet === Set(3))
    // "diagnosis != null" keeps the non-null rows
    assert(d.filter(Jexl.filter("diagnosis != null"))
      .select("id").collect().map(_.getInt(0)).toSet === Set(1, 2))
    // constant expressions
    assert(d.filter(Jexl.filter("1 == 2")).count() === 0)
  }

  test("lenient mode keeps all rows on a broken expression (DataPurifier semantics)") {
    assert(rows.filter(Jexl.filter("qty >>>> garbage((")).count() === 4)
  }

  test("lenient mode also survives a malformed NUMERIC literal: the " +
    "lexer's NumberFormatException wraps into ParseError so the broken " +
    "filter is disabled instead of crashing the job") {
    assert(rows.filter(Jexl.filter("qty == 1.2.3")).count() === 4)
    intercept[Jexl.ParseError] {
      rows.filter(Jexl.filter("qty == 1.2.3", strict = true)).count()
    }
  }

  test("strict mode throws on a broken expression") {
    intercept[Jexl.ParseError] {
      rows.filter(Jexl.filter("qty >>>> garbage((", strict = true)).count()
    }
  }
}
