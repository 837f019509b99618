package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Text-corpus interchange formats — JSONL and CSV readers/writers with
  * the 100 TB ingestion discipline baked in:
  *
  *   - EXPLICIT schema, always. Schema inference reads the corpus once
  *     before reading it again for real — a 2× scan tax at best, and a
  *     silent type drift (today's crawl had no `score` field, so the
  *     column vanished) at worst. The reader requires a `StructType`.
  *   - PERMISSIVE corrupt-record capture. Real crawls contain truncated
  *     lines, stray log output, and invalid UTF-8; failing the job on
  *     row 10^11 of 10^12 (FAILFAST) or silently dropping rows
  *     (DROPMALFORMED) are both wrong for a pipeline that must account
  *     for every input byte. Malformed lines land in
  *     `_corrupt_record` with every data column NULL, so the caller
  *     splits the frame into (clean, quarantine) and audits the
  *     quarantine — the same fail-loud-but-continue stance as the
  *     media codecs' decode_ok flag.
  *
  * Both formats are splittable line-oriented text when uncompressed (or
  * zstd/bzip2-compressed), so reads parallelize across executors like
  * any file scan; writers emit one file per partition.
  */
object TextCorpusSources {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    schema.add(CorruptCol, StringType, nullable = true)
  }

  /** Read a JSONL (one JSON object per line) corpus with an explicit
    * schema; malformed lines surface as rows whose `_corrupt_record`
    * holds the raw line. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Write a corpus as JSONL — the interchange format crawl dumps and
    * dataset releases ship in. One file per partition. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a headered CSV corpus with an explicit schema: quoted fields
    * (embedded delimiters/newlines survive via quote+escape),
    * PERMISSIVE corrupt capture as [[readJsonl]]. `multiLine` stays
    * false by default — multi-line CSV parses whole files per task
    * (unsplittable); corpora with embedded newlines belong in JSONL. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      // Spark's CSV trims field whitespace by default — silent data
      // mutation for a corpus where trailing spaces are content
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Write a headered, quoted CSV. Embedded quotes escape by doubling
    * (RFC 4180), matching [[readCsv]]'s escape option; whitespace
    * trimming is off on both sides (see [[readCsv]]). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Split a PERMISSIVE read into (clean, quarantine): clean rows drop
    * the corrupt column; quarantine rows carry only the raw line for
    * audit.
    *
    * The input frame is PERSISTED here (caller unpersists when done —
    * the dsirWeights contract): Spark refuses queries whose referenced
    * columns reduce to only the internal corrupt-record column of a raw
    * file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    * and the quarantine side is exactly that query; caching the parsed
    * rows is the engine's own documented remedy. The pipeline reads the
    * file once either way. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptCol),
      s"frame has no $CorruptCol column — not a PERMISSIVE read")
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (df.filter(df.col(CorruptCol).isNull).drop(CorruptCol),
     df.filter(df.col(CorruptCol).isNotNull).select(df.col(CorruptCol)))
  }
}
