package graft

import graft.io.TextCorpusSources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** io/TextCorpusSources — JSONL/CSV corpus interchange: explicit-schema
  * round trips with adversarial content, corrupt-line quarantine, and
  * the multiLine CSV contract. */
class TextCorpusSourcesSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val nasty = Seq(
    (1L, "plain text"),
    (2L, "comma, semicolon; pipe|"),
    (3L, "\"quoted\" and 'single'"),
    (4L, "unicode é ß 中文"),
    (5L, null: String),
    (6L, "trailing spaces   "),
    (7L, "tab\tinside"))

  test("JSONL round-trips adversarial content including NULLs and embedded newlines") {
    val docs = (nasty :+ (8L, "line one\nline two")).toDF("doc_id", "text")
    val dir = tmpDir("jsonl-rt")
    writeJsonl(docs, dir)
    val (clean, quarantined) = quarantine(readJsonl(spark, dir, schema))
    assert(quarantined.count() == 0)
    assert(clean.orderBy("doc_id").as[(Long, Option[String])].collect().toSeq ==
      docs.orderBy("doc_id").as[(Long, Option[String])].collect().toSeq)
  }

  test("CSV round-trips quoted/escaped content; embedded newlines need multiLine") {
    val docs = nasty.toDF("doc_id", "text")
    val dir = tmpDir("csv-rt")
    writeCsv(docs, dir)
    val (clean, quarantined) = quarantine(readCsv(spark, dir, schema))
    assert(quarantined.count() == 0)
    assert(clean.orderBy("doc_id").as[(Long, Option[String])].collect().toSeq ==
      docs.orderBy("doc_id").as[(Long, Option[String])].collect().toSeq)
    // embedded newline: the quoted field spans lines — the default
    // line-splittable reader cannot reassemble it; multiLine=true can
    val nl = Seq((9L, "first\nsecond")).toDF("doc_id", "text")
    val dir2 = tmpDir("csv-nl")
    writeCsv(nl, dir2)
    val ml = readCsv(spark, dir2, schema, multiLine = true)
    val (cleanMl, qMl) = quarantine(ml)
    assert(qMl.count() == 0)
    assert(cleanMl.as[(Long, String)].collect().toSeq == Seq((9L, "first\nsecond")))
    val (cleanNoMl, _) = quarantine(readCsv(spark, dir2, schema))
    assert(cleanNoMl.as[(Long, Option[String])].collect()
      .forall(_._2 != Option("first\nsecond")),
      "default reader must not silently reassemble multi-line fields")
  }

  test("malformed JSONL lines land in quarantine, clean rows unaffected") {
    val docs = nasty.take(3).toDF("doc_id", "text")
    val dir = tmpDir("jsonl-bad")
    writeJsonl(docs, dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-junk.json"),
      "this is not json\n{\"doc_id\": 99, \"text\": \"ok\"}\n{broken\n"
        .getBytes("UTF-8"))
    val (clean, quarantined) = quarantine(readJsonl(spark, dir, schema))
    assert(quarantined.count() == 2)
    val got = clean.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == (nasty.take(3) :+ (99L, "ok")).sortBy(_._1))
  }

  test("schema carrying the corrupt column is rejected; quarantine guards") {
    intercept[IllegalArgumentException] {
      readJsonl(spark, "/tmp/x", StructType(schema.add(CorruptCol, StringType)))
    }
    intercept[IllegalArgumentException] {
      quarantine(nasty.take(1).toDF("doc_id", "text"))
    }
  }
}
