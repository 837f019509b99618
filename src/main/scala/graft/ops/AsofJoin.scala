package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each probe row the most recent
  * build row with the same key and build ts ≤ probe ts — the
  * feature/label-alignment primitive of training-data pipelines (join
  * each example to the feature snapshot that was live when the example
  * happened; anything newer is leakage). No reference analog; DuckDB's
  * native ASOF JOIN is the oracle (gate query q46).
  *
  * Plan shape (the 100 TB part): the naive formulation — a join on
  * key + ts inequality, then "latest per probe row" — is a
  * BroadcastNestedLoopJoin or an exploding range join followed by a
  * dedup. This instead UNIONS the tagged inputs and runs ONE window per
  * key ordered by (ts, side): `last(payload, ignoreNulls)` over the
  * unbounded-preceding frame carries the latest build payload forward
  * onto every subsequent probe row. Exactly one shuffle (the window
  * partition on the key), codegen'd window functions, cost linear in
  * |probe| + |build| — never |probe|×|build|.
  *
  * Tie semantics: build sorts BEFORE probe at equal ts (side 0 < 1), so
  * a snapshot stamped at exactly the probe's ts is visible ("≤", like
  * DuckDB `ON probe.ts >= build.ts`). Among equal-ts build rows of one
  * key the LAST in `tieCols` order wins — compared on the columns'
  * NATIVE types (numeric ids order numerically, not lexically); pass a
  * unique tiebreaker (or pre-dedup the build side) for a deterministic
  * result.
  *
  * Null ordering values: a build row with a null `buildTs` is dropped —
  * under the `<=` comparison semantics a null timestamp can never be at
  * or before anything (nulls-first ordering would otherwise carry it
  * onto every unmatched probe row). A probe row with a null `probeTs`
  * survives with a null payload for the same reason: it sorts before
  * every (non-null-ts) build row of its key.
  */
object AsofJoin {

  /** @param probe      left side; all its columns survive
    * @param build      right side; only `payloadCols` are attached
    * @param keyCols    equality keys present on both sides
    * @param probeTs    ordering column on `probe` (numeric or timestamp)
    * @param buildTs    ordering column on `build` (same type as probeTs)
    * @param payloadCols build columns to carry onto probe rows (null when
    *                    no build row is at or before the probe ts)
    * @param tieCols    deterministic order among equal-ts build rows of a
    *                    key (last one wins); empty if (key, ts) is unique
    */
  def asofBackward(probe: DataFrame, build: DataFrame,
                   keyCols: Seq[String], probeTs: String, buildTs: String,
                   payloadCols: Seq[String],
                   tieCols: Seq[String] = Nil): DataFrame = {
    val helper = Seq("__ts", "__side", "__tie")
    require((probe.columns ++ build.columns).intersect(helper).isEmpty,
      s"inputs must not carry the helper columns ${helper.mkString(", ")}")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(payloadCols.intersect(probe.columns.toSeq).isEmpty,
      "payload column names must not collide with probe columns")
    val probeCols = probe.columns.toSeq
    // probe rows keep their columns; build rows carry a null PAYLOAD
    // STRUCT. The payload travels as ONE struct so the window attaches
    // one whole build ROW — per-column last(ignoreNulls) would skip a
    // null field independently and stitch fields from different build
    // rows (a row that never existed; ASOF attaches the matched row
    // as-is, nulls included).
    val payloadStruct = struct(payloadCols.map(col): _*)
    // tiebreak travels as a struct of the NATIVE column values (struct
    // ordering is field-by-field on the native types) — a string cast
    // would order numeric ids lexicographically ("10" < "9"). The probe
    // side's tie value is irrelevant (ties only matter among build rows
    // at one (__ts, __side)), so it rides a typed null.
    val tieType = org.apache.spark.sql.types.StructType(
      tieCols.map(c => org.apache.spark.sql.types.StructField(
        c, build.schema(c).dataType)))
    val probeTie = if (tieCols.isEmpty) lit(0) else lit(null).cast(tieType)
    val buildTie = if (tieCols.isEmpty) lit(0)
                   else struct(tieCols.map(col): _*)
    val p = probe
      .withColumn("__ts", col(probeTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", probeTie)
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, build.schema(c).dataType)))))
    // SQL comparison semantics: a build row with any NULL key can never
    // match (the window's partitionBy would group null==null otherwise),
    // and neither can one with a NULL ts — nulls sort FIRST ascending,
    // so an unfiltered null-ts build row would masquerade as "before
    // everything" and carry its payload onto probe rows with no true
    // match.
    val b0 = build
      .filter((keyCols.map(col(_).isNotNull) :+ col(buildTs).isNotNull)
        .reduce(_ && _))
      .withColumn("__ts", col(buildTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", buildTie)
      .withColumn("__payload", payloadStruct)
    val bAligned = probeCols.filterNot(keyCols.contains)
      .foldLeft(b0)((df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType)))
      .select((keyCols ++ probeCols.filterNot(keyCols.contains) ++
        Seq("__payload") ++ helper).map(col): _*)
    val unioned = p
      .select((keyCols ++ probeCols.filterNot(keyCols.contains) ++
        Seq("__payload") ++ helper).map(col): _*)
      .unionByName(bAligned)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }

  /** NEAREST-in-time as-of: per probe row, the build row of the same
    * key that minimizes |buildTs − probeTs| — the sensor-alignment /
    * closest-quote join neither direction alone answers. Built from
    * TWO [[asofBackward]] passes (the forward pass runs backward over
    * NEGATED ordering columns), so it inherits the union+carry window
    * shape — per-key bounded state, no range explosion. Tie rule: an
    * equidistant earlier match beats the later one; equal-ts build
    * rows resolve by `tieCols` exactly as in the directional passes.
    *
    * Output: probe columns + payloadCols (of the winner, null when the
    * key has no build rows) + `matched_ts` (winner's buildTs) +
    * `asof_delta` (|Δ| in the ts unit, null on no match). `probeTs`
    * must be a signed numeric (epoch-µs long — the repo contract);
    * timestamps should be converted first. */
  def asofNearest(probe: DataFrame, build: DataFrame,
                  keyCols: Seq[String], probeTs: String, buildTs: String,
                  payloadCols: Seq[String],
                  tieCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("matched_ts", "asof_delta", "__bts", "__nts", "__npts")
    require((probe.columns ++ build.columns).intersect(reserved).isEmpty,
      s"inputs must not carry ${reserved.mkString(", ")}")
    val probeCols = probe.columns.toSeq
    val bWithTs = build.withColumn("__bts", col(buildTs))
    // backward: latest build at or before the probe ts
    val back = asofBackward(probe, bWithTs, keyCols, probeTs, buildTs,
        payloadCols :+ "__bts", tieCols)
      .withColumnRenamed("__bts", "__back_ts")
    val backRenamed = payloadCols.foldLeft(back)((df, c) =>
      df.withColumnRenamed(c, s"__back_$c"))
    // forward: earliest build at or after the probe ts = backward on
    // the negated time axis
    val fwd = asofBackward(
        backRenamed.withColumn("__npts", -col(probeTs)),
        bWithTs.withColumn("__nts", -col(buildTs)),
        keyCols, "__npts", "__nts", payloadCols :+ "__bts", tieCols)
      .withColumnRenamed("__bts", "__fwd_ts")
    val db = col(probeTs) - col("__back_ts")
    val df_ = col("__fwd_ts") - col(probeTs)
    val useBack = col("__fwd_ts").isNull ||
      (col("__back_ts").isNotNull && db <= df_)
    fwd.select(probeCols.map(col) ++
        payloadCols.map(c =>
          when(useBack, col(s"__back_$c")).otherwise(col(c)).as(c)) ++
        Seq(when(useBack, col("__back_ts")).otherwise(col("__fwd_ts"))
            .as("matched_ts"),
          when(useBack, db).otherwise(df_).as("asof_delta")): _*)
  }
}
