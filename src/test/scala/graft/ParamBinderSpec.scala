package graft

import graft.params.ParamBinder
import graft.params.ParamBinder._
import org.scalatest.funsuite.AnyFunSuite

class ParamBinderSpec extends AnyFunSuite {

  val sql = "SELECT * FROM t WHERE a > {p_lim:Decimal(38,6)} AND b = {p_name:String} AND c = {p_cnt:UInt32}"

  test("placeholders are extracted in order with parsed types") {
    val phs = ParamBinder.placeholders(sql)
    assert(phs.map(_._1) == Seq("p_lim", "p_name", "p_cnt"))
    assert(phs.map(_._2) == Seq(PDecimal, PString, PUInt32))
  }

  test("inline binding renders per reference type rules: Decimal/UInt32 raw, String quoted") {
    val bound = ParamBinder.bindInline(sql,
      Map("p_lim" -> "12.5", "p_name" -> "it's", "p_cnt" -> 7))
    assert(bound ==
      "SELECT * FROM t WHERE a > 12.5 AND b = 'it''s' AND c = 7")
  }

  test("named binding rewrites to :name markers with typed args") {
    val (text, args) = ParamBinder.bindNamed(sql,
      Map("p_lim" -> "12.5", "p_name" -> "x", "p_cnt" -> 7))
    assert(text ==
      "SELECT * FROM t WHERE a > :p_lim AND b = :p_name AND c = :p_cnt")
    assert(args("p_lim") == new java.math.BigDecimal("12.5"))
    assert(args("p_name") == "x")
    assert(args("p_cnt") == 7L)
  }

  test("missing param and unknown type fail loudly") {
    intercept[MissingParam](ParamBinder.bindInline(sql, Map("p_lim" -> 1)))
    intercept[UnknownParamType](
      ParamBinder.bindInline("x = {a:Float64}", Map("a" -> 1)))
  }

  test("UInt32 range is enforced") {
    intercept[IllegalArgumentException](
      ParamBinder.bindInline("c = {n:UInt32}", Map("n" -> -1L)))
    intercept[IllegalArgumentException](
      ParamBinder.bindInline("c = {n:UInt32}", Map("n" -> 4294967296L)))
    assert(ParamBinder.bindInline("c = {n:UInt32}",
      Map("n" -> 4294967295L)) == "c = 4294967295")
  }

  test("repeated placeholder binds every occurrence") {
    val s = "{a:UInt32} + {a:UInt32}"
    assert(ParamBinder.bindInline(s, Map("a" -> 2)) == "2 + 2")
    val (t, args) = ParamBinder.bindNamed(s, Map("a" -> 2))
    assert(t == ":a + :a" && args == Map("a" -> 2L))
  }
}
