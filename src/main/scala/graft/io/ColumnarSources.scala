package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar interchange formats beyond the engine's native parquet —
  * ORC round-trip and schema-evolved parquet reads, with the same
  * ingestion discipline as [[TextCorpusSources]]:
  *
  *   - EXPLICIT schema on read. An ORC footer read is cheap, but
  *     pinning the schema makes type drift (a shard written with
  *     `score: float` next to one with `double`) fail loudly at plan
  *     time instead of poisoning downstream arithmetic.
  *   - Splittable + predicate-pushdown-capable. ORC stripes carry
  *     min/max statistics exactly like parquet row groups, so filters
  *     and column pruning reach the scan (`PushedFilters` in the
  *     explain) — ORC is a first-class 100 TB citizen, not a
  *     compatibility shim.
  *   - Schema evolution is an explicit opt-in. `readParquetMerged`
  *     turns on `mergeSchema` — a footer read per shard-schema, so it
  *     belongs on curated release directories (tens of schemas), not
  *     raw crawl glob reads (millions of files); absent columns
  *     surface as NULL, never as silent drops.
  */
object ColumnarSources {

  /** Write an ORC corpus — zstd-compressed by default (the modern
    * ratio/speed point; ORC's own default is zlib). One file per
    * partition, like every writer here. */
  def writeOrc(df: DataFrame, path: String,
               compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Read an ORC corpus with an explicit schema. Column pruning and
    * filter pushdown work as with parquet (stripe statistics). */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Read a parquet directory whose shards were written under EVOLVED
    * schemas (columns added over time): `mergeSchema` unions the shard
    * schemas; rows from shards lacking a column read NULL there. The
    * per-shard-schema footer merge happens once at plan time. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
