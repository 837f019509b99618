package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Operational health surface for the persisted index families
  * (exact/fuzzy dedup, decontamination, IVF/SQ8/PQ ANN): `stats` to
  * monitor and `compact` to repair — the `system.tables` probe precedent
  * of the reference (S10, `clickhouse/jdbsChSession.scala:60-91`) applied
  * to index tables. A 100 TB operator runs `stats` on a schedule and
  * `compact` when segment counts or bucket occupancy drift.
  *
  * The indices are append-only (build writes one generation; every
  * `update*` appends novel rows), so two things degrade over update
  * cycles: physical segment counts (small parquet files per append → scan
  * overhead) and, for the banded fuzzy index, cumulative bucket occupancy
  * (the build-time `maxBucketSize` cap bounds each BUILD, but appended
  * generations can push a bucket past it — every future probe then pays
  * the hot bucket). `compact` fixes both: one generation per component,
  * and the bands table re-capped to its build contract.
  */
object IndexAdmin {

  /** Component tables a prefix may own, across all index families. */
  private[llm] val ComponentSuffixes: Seq[String] =
    Seq("hashes", "sigs", "bands", "fps", "centroids", "buckets",
        "stats", "codes", "books", "meta")

  private def existing(store: graft.io.TableStore,
                       prefix: String): Seq[String] =
    ComponentSuffixes.filter(sfx => store.exists(s"$prefix.$sfx"))

  /** Index-health snapshot: one row per (component, metric) with a LONG
    * value, deterministic row set. Per component: `rows`. Family
    * extras — `bands`: `n_buckets`, `max_bucket`, `over_cap_buckets`
    * (vs the meta cap); `buckets` (IVF posting lists): `n_lists`,
    * `max_list`, `min_list`; `hashes`: `distinct_hash`; `fps`:
    * `distinct_fp`, `max_df`. ONE Spark job per component: each
    * component's metrics come out of a single multi-aggregate over its
    * (occupancy) frame — a scheduled health probe must not pay one
    * full scan per metric. */
  def stats(store: graft.io.TableStore, prefix: String): DataFrame = {
    val spark = store.spark
    val comps = existing(store, prefix)
    require(comps.nonEmpty, s"no index tables under prefix $prefix")
    // one agg(...) head() per component; min/max over an empty frame
    // (e.g. a bands table whose every build bucket was over-cap)
    // coalesce to 0, not NULL
    def aggRow(df: DataFrame, comp: String,
               metrics: (String, org.apache.spark.sql.Column)*)
        : Seq[(String, String, Long)] = {
      val r = df.agg(
        metrics.head._2.cast("long").as("m0"),
        metrics.tail.zipWithIndex.map { case ((_, c), i) =>
          c.cast("long").as(s"m${i + 1}") }: _*).head()
      metrics.zipWithIndex.map { case ((name, _), i) =>
        (comp, name, if (r.isNullAt(i)) 0L else r.getLong(i)) }
    }
    val rows: Seq[(String, String, Long)] = comps.flatMap { comp =>
      val t = store.read(s"$prefix.$comp")
      comp match {
        case "bands" =>
          val occ = t.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("__n"))
          val cap = metaCap(store, prefix)
          aggRow(occ, comp,
            Seq("rows" -> sum(col("__n")),
                "n_buckets" -> count(lit(1)),
                "max_bucket" -> max(col("__n"))) ++
              cap.toSeq.map(c =>
                "over_cap_buckets" -> count(when(col("__n") > c, 1))): _*)
        case "buckets" if t.columns.contains("cid") =>
          val occ = t.groupBy(col("cid")).agg(count(lit(1)).as("__n"))
          aggRow(occ, comp,
            "rows" -> sum(col("__n")), "n_lists" -> count(lit(1)),
            "max_list" -> max(col("__n")), "min_list" -> min(col("__n")))
        case "hashes" =>
          aggRow(t, comp,
            "rows" -> count(lit(1)),
            "distinct_hash" -> countDistinct(col("content_hash")))
        case "fps" =>
          val occ = t.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
          aggRow(occ, comp,
            "rows" -> sum(col("__n")), "distinct_fp" -> count(lit(1)),
            "max_df" -> max(col("__n")))
        case _ =>
          aggRow(t, comp, "rows" -> count(lit(1)))
      }
    }
    val schema = StructType(Seq(
      StructField("component", StringType, nullable = false),
      StructField("metric", StringType, nullable = false),
      StructField("value", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 1),
      schema)
  }

  /** The fuzzy index's build-time bucket cap, when its meta records one. */
  private def metaCap(store: graft.io.TableStore,
                      prefix: String): Option[Int] =
    if (!store.exists(s"$prefix.meta")) None
    else {
      val m = store.read(s"$prefix.meta")
      if (m.columns.contains("max_bucket_size"))
        Some(m.select(col("max_bucket_size")).head().getInt(0))
      else None
    }

  /** MERGE two independently built ANN indices of the SAME family
    * sharing FROZEN parameters into one probeable index under
    * `outPrefix` — the multi-shard 100 TB build story: shard owners
    * build/admit locally against shared params (IVF centroids, SQ8
    * stats, PQ codebooks+meta), a merge unions only the data component.
    * Fails loud when the frozen components differ (merging across
    * different centroids/codebooks silently corrupts probe geometry),
    * when the families differ, or when the shards share ids (the
    * one-row-per-id contract every probe assumes).
    * probe(merge(A, B)) ≡ probe(an index built over A ∪ B with the same
    * frozen params) — IndexAdminSpec pins it per family.
    *
    * Scale shape: frozen components are bounded metadata (nlist
    * centroid rows, m·nlist codebook rows, one stats/meta row) so their
    * equality check is metadata-sized; the id-disjointness probe is one
    * equi-join limit(1); the data union is a file-level union with no
    * shuffle. */
  def merge(store: graft.io.TableStore, prefixA: String,
            prefixB: String, outPrefix: String): Unit = {
    import graft.llm.Similarity._
    require(outPrefix != prefixA && outPrefix != prefixB,
      s"outPrefix $outPrefix must differ from both inputs — " +
        "overwriting a table its own merge plan reads is undefined")
    val ka = detectIndexKind(store, prefixA)
    val kb = detectIndexKind(store, prefixB)
    require(ka.isDefined, s"no complete ANN index under prefix $prefixA")
    require(kb.isDefined, s"no complete ANN index under prefix $prefixB")
    require(ka == kb,
      s"index families differ: $prefixA is ${ka.get}, $prefixB is ${kb.get}")
    val (frozen, data, idCol) = ka.get match {
      case IvfIndexed => (Seq("centroids"), "buckets", "id")
      case PqIndexed  => (Seq("books", "meta"), "codes", "cand_id")
      case SqIndexed  => (Seq("stats"), "codes", "cand_id")
      case other => sys.error(s"unmergeable index kind $other")
    }
    frozen.foreach { c =>
      val a = store.read(s"$prefixA.$c")
      val b = store.read(s"$prefixB.$c")
      val diff = a.exceptAll(b).limit(1).count() +
        b.exceptAll(a).limit(1).count()
      require(diff == 0L,
        s"frozen component $c differs between $prefixA and $prefixB — " +
          "shards must build/admit against SHARED params before a merge")
    }
    val da = store.read(s"$prefixA.$data")
    val db = store.read(s"$prefixB.$data")
    val shared = da.select(col(idCol))
      .join(db.select(col(idCol)), idCol).limit(1).count()
    require(shared == 0L,
      s"shards share ids in $data — an id must live in exactly one shard")
    frozen.foreach(c =>
      store.overwrite(s"$outPrefix.$c", store.read(s"$prefixA.$c")))
    store.overwrite(s"$outPrefix.$data", da.unionByName(db))
  }

  /** Rewrite every component into `targetFiles` files (one generation —
    * the C10 OPTIMIZE FINAL analog over index tables) and re-apply the
    * fuzzy bands cap from meta: buckets that appended past
    * `max_bucket_size` are dropped WHOLE, restoring the build contract
    * (a hot bucket taxes every future probe and its candidates are
    * boilerplate-dominated anyway — same rationale as the build cap,
    * `Dedup.buildFuzzyIndex`). Probe results over in-cap buckets are
    * unchanged. Returns the stats frame AFTER compaction. */
  def compact(store: graft.io.TableStore, prefix: String,
              targetFiles: Int = 0): DataFrame = {
    val spark = store.spark
    val files = if (targetFiles > 0) targetFiles
      else spark.sparkContext.defaultParallelism
    metaCap(store, prefix).foreach { cap =>
      if (store.exists(s"$prefix.bands")) {
        val bands = store.read(s"$prefix.bands")
        val keep = bands.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= cap).select("band", "bucket")
        store.overwrite(s"$prefix.bands", bands.join(keep, Seq("band", "bucket")))
      }
    }
    existing(store, prefix).foreach(sfx =>
      store.compact(s"$prefix.$sfx", files))
    stats(store, prefix)
  }
}
