package graft

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drive the streaming surface over the real events fixture: parquet
  * `readStream` → watermarked tumbling windows → memory sink, checked
  * against the batch run of the same transform.
  * `runMain graft.StreamDemo [sfDir]` */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4, "graft-stream")
    // the streaming file source wants a DIRECTORY; the fixture is a
    // single parquet file → stage it into a temp dir
    val srcDir = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("part-0.parquet"))
    val src = srcDir.toString
    // the fixture's physical ts encoding varies across generations;
    // streaming watermarks need a real timestamp column — dispatch on the
    // read schema (CoreQueries.tsAsTimestamp)
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", CoreQueries.tsAsTimestamp(df))
    val transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => EventStream.windowedTypeCounts(withTs(df), "1 hour", "2 hours")

    val batch = transform(spark.read.parquet(src))
      .orderBy("win_start", "event_type").collect().toSeq
    val streamed = EventStream.runBatchOfStream(spark, src, "demo_win", transform)
      .orderBy("win_start", "event_type").collect().toSeq
    println(s"[stream] batch_rows=${batch.size} streamed_rows=${streamed.size} " +
      s"equal=${batch == streamed}")
    streamed.take(5).foreach(r => println(s"[stream] $r"))
    assert(batch == streamed, "batch/stream divergence")
    spark.stop()
  }
}
