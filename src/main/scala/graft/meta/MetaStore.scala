package graft.meta

import graft.calc.ViewQueryMeta
import graft.io.TableStore
import graft.params.ParamBinder
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Table-backed engine metadata — the reference stores all of this in
  * Oracle (SURVEY.md §0): query definitions in `ora_to_ch_query` (CLOB
  * SQL text + target tables) with typed params in `ora_to_ch_query_params`
  * (`ora/jdbcSession.scala:199-247`, `calc/ViewQueryMeta.scala:3-17`).
  * Here the same two relations live in any [[TableStore]] (catalog or
  * parquet), so query definitions survive restarts and ship with the
  * warehouse.
  */
final class MetaStore(store: TableStore, db: String = "orach_meta") {

  private val queryT  = s"$db.query_defs"
  private val paramT  = s"$db.query_params"

  final case class QueryDef(
      id: Long, name: String, sqlText: String, chTable: String,
      oraTable: Option[String], copyByPartsCnt: Int,
      copyByPartField: Option[String], copyToLocalCache: Boolean)

  /** (name, chType, ord) — `ViewQueryMeta.scala:3-7`. */
  final case class ParamDef(queryId: Long, name: String, chType: String, ord: Int)

  private val querySchema = StructType(Seq(
    StructField("id", LongType, false), StructField("name", StringType, false),
    StructField("sql_text", StringType, false),
    StructField("ch_table", StringType, false),
    StructField("ora_table", StringType, true),
    StructField("copy_by_parts_cnt", IntegerType, false),
    StructField("copy_by_part_field", StringType, true),
    StructField("copy_to_local_cache", BooleanType, false)))

  private val paramSchema = StructType(Seq(
    StructField("query_id", LongType, false),
    StructField("name", StringType, false),
    StructField("ch_type", StringType, false),
    StructField("ord", IntegerType, false)))

  def save(q: QueryDef, params: Seq[ParamDef]): Unit = {
    val spark = store.spark
    val qdf = spark.createDataFrame(
      java.util.List.of(Row(q.id, q.name, q.sqlText, q.chTable,
        q.oraTable.orNull, q.copyByPartsCnt, q.copyByPartField.orNull,
        q.copyToLocalCache)), querySchema)
    val pdf = spark.createDataFrame(
      java.util.Arrays.asList(params.map(p =>
        Row(p.queryId, p.name, p.chType, p.ord)): _*), paramSchema)
    store.append(queryT, qdf)
    if (params.nonEmpty) store.append(paramT, pdf)
  }

  def loadDef(id: Long): (QueryDef, Seq[ParamDef]) = {
    val q = store.read(queryT).filter(s"id = $id").head()
    val qd = QueryDef(q.getLong(0), q.getString(1), q.getString(2),
      q.getString(3), Option(q.getString(4)), q.getInt(5),
      Option(q.getString(6)), q.getBoolean(7))
    val ps =
      if (!store.exists(paramT)) Nil
      else store.read(paramT).filter(s"query_id = $id").collect().toSeq
        .map(r => ParamDef(r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
        .sortBy(_.ord)   // substitution ordered by ord (jdbcSession:208-222)
    (qd, ps)
  }

  /** Bind request values against the declared params: every declared
    * param must be supplied and must parse under its declared ch_type
    * (the reference's closed Decimal/String/UInt32 set) — fail fast like
    * the JSON-decode validation layer. */
  def toViewQueryMeta(id: Long, values: Map[String, Any]): ViewQueryMeta = {
    val (qd, ps) = loadDef(id)
    ps.foreach { p =>
      val v = values.getOrElse(p.name, throw ParamBinder.MissingParam(p.name))
      ParamBinder.parseType(p.name, p.chType).render(v)   // type check
    }
    ViewQueryMeta(qd.name, qd.sqlText, values, qd.chTable, qd.oraTable,
      qd.copyByPartsCnt, qd.copyByPartField, qd.copyToLocalCache)
  }
}
