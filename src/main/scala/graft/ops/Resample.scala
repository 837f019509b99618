package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization — gap-fill a per-(group, period)
  * observation frame onto a dense period spine with last-observation-
  * carried-forward (LOCF): the resample step between raw events and
  * anything that assumes regular sampling (trend fits, bar charts,
  * day-over-day ratios — a missing day silently skews them all).
  *
  * Input contract: at most ONE row per (group, period) — pre-aggregate
  * first (the OHLC/TWAP ops are the usual upstream). Each group fills
  * its own [min period, max period] span; `filled = 1` rows carry the
  * latest earlier observation of that group. Leading rows before a
  * group's first observation cannot exist by construction (the spine
  * starts at the group's min).
  *
  * Scale shape: bounds are one map-side-partial groupBy; the spine is
  * `sequence(min, max)` exploded per group — array length = the
  * group's span in periods (a daily grain spans thousands, not
  * billions; the period GRAIN bounds it, document the grain choice,
  * not the data size). The LOCF window partitions by group ordered by
  * period — state bounded by one group's span. One join on
  * (group, period). */
object Resample {

  def gapFillLocf(obs: DataFrame, groupCol: String, periodCol: String,
                  valueCol: String): DataFrame = {
    val o = obs.select(col(groupCol).as("__g"),
      col(periodCol).cast("long").as("__p"), col(valueCol).as("__v"))
    val bounds = o.groupBy(col("__g"))
      .agg(min(col("__p")).as("__mn"), max(col("__p")).as("__mx"))
    val spine = bounds.select(col("__g"),
      explode(sequence(col("__mn"), col("__mx"))).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(o, Seq("__g", "__p"), "left")
      .withColumn("__filled", when(col("__v").isNull, 1L).otherwise(0L))
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("__g").as(groupCol), col("__p").as(periodCol),
        col("__v").as(valueCol), col("__filled").as("filled"))
  }
}
