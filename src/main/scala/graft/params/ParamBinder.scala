package graft.params

import java.math.{BigDecimal => JBigDecimal}

/** The reference's `{name:Type}` parameter-placeholder grammar.
  *
  * Stored calc queries contain placeholders like `{p_date:Decimal(38,6)}`,
  * `{mode:String}`, `{cnt:UInt32}` (see
  * `resources/v_cache_for_calc_6184_4626.txt:99-157`); the reference binds
  * them by ordered string replacement with type-directed rendering —
  * Decimal/UInt32 raw, String single-quoted
  * (`clickhouse/jdbsChSession.scala:716-731`, ordering by `ord` from
  * `calc/ViewQueryMeta.scala:3-7`).
  *
  * We keep the same grammar and closed 3-member type set, but translate to
  * Spark parameterized SQL: `bindNamed` rewrites `{name:Type}` → `:name`
  * and produces the typed args map for `spark.sql(text, args)` — values
  * never enter the SQL text, so injection through values is impossible.
  * `bindInline` reproduces the reference's literal substitution (needed
  * when the target is an external engine that can't take bind params).
  */
object ParamBinder {

  sealed trait ChParamType { def render(v: Any): String }
  case object PDecimal extends ChParamType {
    def render(v: Any): String = new JBigDecimal(v.toString).toPlainString
  }
  case object PString extends ChParamType {
    def render(v: Any): String = "'" + v.toString.replace("'", "''") + "'"
  }
  case object PUInt32 extends ChParamType {
    def render(v: Any): String = {
      val n = java.lang.Long.parseLong(v.toString)
      require(n >= 0 && n <= 0xFFFFFFFFL, s"UInt32 out of range: $n")
      n.toString
    }
  }

  final case class UnknownParamType(name: String, tpe: String)
      extends RuntimeException(s"param $name: unknown type $tpe")
  final case class MissingParam(name: String)
      extends RuntimeException(s"no value bound for param $name")

  /** Closed type set — `clickhouse/jdbsChSession.scala:724-731`. */
  def parseType(name: String, t: String): ChParamType =
    t.trim.replaceAll("\\s", "") match {
      case "Decimal(38,6)"        => PDecimal
      case s if s.startsWith("Decimal") => PDecimal
      case "String"               => PString
      case "UInt32"               => PUInt32
      case other                  => throw UnknownParamType(name, other)
    }

  private val Placeholder = "\\{([A-Za-z_][A-Za-z0-9_]*)\\s*:\\s*([^}]+)\\}".r

  /** All `(name, type)` placeholders in order of first appearance. */
  def placeholders(sql: String): Seq[(String, ChParamType)] =
    Placeholder.findAllMatchIn(sql).map { m =>
      m.group(1) -> parseType(m.group(1), m.group(2))
    }.toSeq.distinct

  /** Reference-faithful inline substitution (ordered, type-rendered). */
  def bindInline(sql: String, values: Map[String, Any]): String =
    Placeholder.replaceAllIn(sql, m => {
      val name = m.group(1)
      val tpe  = parseType(name, m.group(2))
      val v    = values.getOrElse(name, throw MissingParam(name))
      java.util.regex.Matcher.quoteReplacement(tpe.render(v))
    })

  /** Spark-native binding: rewrite to named-parameter markers and build the
    * typed args map for `spark.sql(sqlText, args)`. */
  def bindNamed(sql: String, values: Map[String, Any])
      : (String, Map[String, Any]) = {
    val phs = placeholders(sql)
    val text = Placeholder.replaceAllIn(sql, m => ":" + m.group(1))
    val args: Map[String, Any] = phs.map { case (name, tpe) =>
      val v = values.getOrElse(name, throw MissingParam(name))
      tpe.render(v)   // same domain validation as the inline path (UInt32 range etc.)
      val typed: Any = tpe match {
        case PDecimal => new JBigDecimal(v.toString)
        case PString  => v.toString
        case PUInt32  => java.lang.Long.parseLong(v.toString)
      }
      name -> typed
    }.toMap
    (text, args)
  }
}
