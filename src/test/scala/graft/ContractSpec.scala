package graft

import org.apache.spark.sql.types._

/** Driver-contract guard: structural rules every query must satisfy for
  * the hash-compare gate to be meaningful (NOTES.md determinism rules).
  * Catches regressions before the driver does. */
class ContractSpec extends SparkTestBase {

  test("every oracle key has a query; names are unique and path-safe") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
    assert(qs.forall(_.matches("[A-Za-z0-9_]+")), "names must be path-safe")
    assert(qs.nonEmpty)
  }

  test("all query schemas: unique column names, no raw timestamps/arrays/structs/doubles-from-arithmetic hazards") {
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, dir).schema
      val names = schema.fields.map(_.name)
      assert(names.distinct.length == names.length,
        s"$name: duplicate column names ${names.mkString(",")}")
      schema.fields.foreach { f =>
        // hash compare needs engine-stable renderings: no raw timestamps
        // (ns/us truncation differs), no nested types (render divergence)
        assert(!f.dataType.isInstanceOf[TimestampType.type],
          s"$name.${f.name}: raw timestamp output (format it as string)")
        assert(!f.dataType.isInstanceOf[StructType] &&
               !f.dataType.isInstanceOf[MapType],
          s"$name.${f.name}: nested output type ${f.dataType}")
        if (SparkEntry.oracleSql.contains(name)) {
          assert(!f.dataType.isInstanceOf[ArrayType],
            s"$name.${f.name}: array output in an oracle-checked query")
          // round-1 lesson: the driver reads Spark parquet via
          // pyarrow→pandas (Decimal objects, '6.550000') but the oracle
          // via duckdb .df() (float64, '6.55') — a surfaced DECIMAL
          // hash-mismatches even when value-exact. Keep decimal math
          // internal; surface DOUBLE.
          assert(!f.dataType.isInstanceOf[DecimalType],
            s"$name.${f.name}: surfaced DECIMAL in an oracle-checked query" +
              " (cast to double at the output boundary)")
        }
      }
    }
  }

  test("every oracle-checked query returns rows at sf0.001 (non-vacuous checks)") {
    val dir = sf("sf0.001")
    SparkEntry.oracleSql.keys.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name returns 0 rows — vacuous oracle check")
    }
  }
}
