package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming (SURVEY.md §2.9); this module is the
  * engine's forward-looking stream path, built the Spark-native way:
  * `readStream` → watermark → windowed aggregation → sink, plus
  * `mapGroupsWithState` sessionization for custom state. Batch and stream
  * share the same transform functions (the Dataset API is identical), so
  * every streaming transform is unit-testable against batch frames.
  */
object EventStream {

  /** Event row as read from the stream (ts in epoch-micros UTC). */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long,
                                  total_value: Double, closed: Boolean)

  /** Tumbling-window per-type aggregation with late-data watermark —
    * the canonical `readStream → withWatermark → window → agg` shape.
    * Works identically on a batch frame (tests) and a stream. */
  def windowedTypeCounts(events: DataFrame,
                         window_ : String = "5 minutes",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"),
              col("window.end").as("win_end"),
              col("event_type"), col("n"), col("total_value"))

  /** Per-user sessionization via mapGroupsWithState: a session closes
    * after `gapMs` of inactivity (processing-time timeout in streaming;
    * in batch each group arrives complete and closes immediately).
    *
    * `useTimeout = false` runs with NoTimeout: state still accumulates
    * across micro-batches but never wall-clock-closes. REQUIRED when the
    * stream is drained with `processAllAvailable()` (the q44 gate and any
    * finite-replay harness): with ProcessingTimeTimeout Spark's
    * micro-batch engine considers another batch necessary whenever
    * registered timeouts exist (`shouldRunAnotherBatch` is
    * unconditionally true for processing-time timeouts, so the clock can
    * fire them), so it keeps scheduling empty batches and
    * processAllAvailable never observes "no new data" — a livelock, not
    * a slow drain. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 useTimeout: Boolean = true): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), SessionSummary](timeoutConf) {
        case (uid, it, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, v) = state.get
            state.remove()
            SessionSummary(uid, n, v, closed = true)
          } else {
            val evs = it.toSeq
            val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
            val n = n0 + evs.size
            val v = v0 + evs.map(_.value).sum
            state.update((n, v))
            if (useTimeout) state.setTimeoutDuration(gapMs)
            SessionSummary(uid, n, v, closed = false)
          }
      }
  }

  /** Drive a parquet-backed stream of events through a transform into an
    * in-memory table, synchronously (test/local harness). `options` pass
    * through to the file source — e.g. maxFilesPerTrigger=1 forces one
    * micro-batch per file so stateful operators demonstrably carry state
    * ACROSS batches. */
  def runBatchOfStream(spark: SparkSession, sourceDir: String,
                       name: String,
                       transform: DataFrame => DataFrame,
                       mode: OutputMode = OutputMode.Complete(),
                       options: Map[String, String] = Map.empty): DataFrame = {
    spark.catalog.dropTempView(name)   // re-runs re-register the sink view
    val schema = spark.read.parquet(sourceDir).schema
    // the file-stream source requires a DIRECTORY basePath; a single
    // parquet file (pyarrow-written fixtures) streams from its parent
    // with a glob pinned to the one file
    val f = new java.io.File(sourceDir)
    val reader = spark.readStream.schema(schema).options(options)
    val stream =
      if (f.isFile)
        reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(sourceDir)
    val q = transform(stream).writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }
}
