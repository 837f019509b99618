package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the "is this table fit to
  * train on / copy back" gate the reference runs by hand via its probe
  * queries (row counts, PK presence, column checks —
  * `ora_ch` readers/jdbsChSession "exists/count/PK" probes, see
  * SURVEY §2 S10) generalized into one engine operator, in the shape
  * the public Deequ/Great-Expectations family standardized: a list of
  * typed constraints evaluated against a frame, producing one report row
  * per rule `(rule, target, n_rows, n_violations, passed)`.
  *
  * Evaluation cost is the point. A naive runner issues one scan per
  * rule; at 100 TB that is N full reads. Here every ROW-LEVEL rule
  * (not-null, range, set membership, arbitrary predicate) compiles to a
  * conditional-sum column in ONE aggregate over ONE scan — adding a
  * rule adds a counter, not a pass. The two rule classes that
  * fundamentally need data movement keep it minimal and key-local:
  * uniqueness is one shuffle on its key columns (partial map-side
  * aggregation applies), and referential integrity is one left-anti
  * join per referenced table (broadcast when the reference side is a
  * dimension, which is the overwhelming case). Nothing collects to the
  * driver but the report itself (≤ one row per rule).
  */
object DataQuality {

  /** One verifiable rule. `target` is the human-readable column (or
    * column-list) label that appears in the report. */
  sealed trait Constraint { def name: String; def target: String }

  /** No nulls in `column`. */
  final case class NotNull(column: String) extends Constraint {
    val name = "not_null"; val target = column
  }

  /** `column` within [lo, hi] (inclusive). Nulls count as violations —
    * range talks about values; absence is NotNull's job only if you ask
    * for it, but a null is certainly not inside the interval. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val name = "in_range"; val target = column
  }

  /** `column` drawn from a closed vocabulary. */
  final case class InSet(column: String, values: Seq[String])
      extends Constraint {
    val name = "in_set"; val target = column
  }

  /** Arbitrary row predicate (must hold). The escape hatch for domain
    * rules ("price ≥ qty × min_unit_price"); still fused into the single
    * row-level scan. */
  final case class Satisfies(label: String, predicate: Column)
      extends Constraint {
    val name = "satisfies"; val target = label
  }

  /** `columns` form a key: a violation is EVERY row whose key value
    * occurs more than once (both copies are in doubt — the Deequ
    * uniqueness convention, not the "extras beyond the first" one,
    * which would require picking a survivor the rule has no basis to
    * pick). Null-keyed rows group by the null tuple like any value. */
  final case class Unique(columns: Seq[String]) extends Constraint {
    val name = "unique"; val target = columns.mkString(",")
  }

  /** k-anonymity floor: every `columns` (quasi-identifier) combination
    * must cover at least `k` rows — a violation is EVERY row whose
    * combination is rarer (each such row is re-identifiable; all of
    * them are in scope, the Unique convention). The release-gating
    * governance rule next to PII redaction: one shuffle on the
    * quasi-identifier key. */
  final case class MinGroupSize(columns: Seq[String], k: Long)
      extends Constraint {
    require(k >= 1, s"k must be >= 1, got $k")
    val name = "min_group_size"
    val target = s"${columns.mkString(",")}>=$k"
  }

  /** Referential integrity: every non-null `columns` tuple must appear
    * as `refColumns` in `ref`. Violations = orphan rows. Tuples with
    * any null component are skipped (SQL FK semantics: null never
    * fails an FK). */
  final case class ForeignKey(columns: Seq[String], ref: DataFrame,
                              refColumns: Seq[String]) extends Constraint {
    require(columns.nonEmpty && columns.length == refColumns.length,
      "FK column lists must be non-empty and same length")
    val name = "foreign_key"; val target = columns.mkString(",")
  }

  private val reportCols =
    Seq("rule", "target", "n_rows", "n_violations", "passed")

  /** Violation indicator (1L when the row breaks the rule) for a
    * row-level constraint. */
  private def violation(c: Constraint): Column = c match {
    case NotNull(col0) =>
      when(col(col0).isNull, 1L).otherwise(0L)
    case InRange(col0, lo, hi) =>
      when(col(col0).isNotNull &&
        col(col0).cast("double").between(lo, hi), 0L).otherwise(1L)
    case InSet(col0, vs) =>
      when(col(col0).isin(vs.map(v => v: Any): _*), 0L).otherwise(1L)
    case Satisfies(_, p) => when(p, 0L).otherwise(1L)
    case other =>
      throw new IllegalArgumentException(s"not row-level: ${other.name}")
  }

  /** Run the suite; returns the report frame
    * `(rule, target, n_rows, n_violations, passed)`, one row per
    * constraint, `passed` = 1 iff `n_violations` = 0. Deterministic:
    * all counters are exact longs. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val rowLevel = constraints.filter {
      case _: NotNull | _: InRange | _: InSet | _: Satisfies => true
      case _ => false
    }
    // --- one scan, one 1-row aggregate for every row-level rule ---
    val rowReport: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          rowLevel.zipWithIndex.map { case (c, i) =>
            sum(violation(c)).as(s"__v$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the single row into the report shape without a
        // second scan: explode a literal-indexed array over the row
        val entries = rowLevel.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("rule"), lit(c.target).as("target"),
            col("__n").as("n_rows"),
            coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
        }
        Some(one.select(explode(array(entries: _*)).as("e"))
          .select(col("e.rule"), col("e.target"), col("e.n_rows"),
            col("e.n_violations")))
      }
    // --- group-size rules (unique / k-anonymity): one shuffle each ---
    val uniqueReports = constraints.collect {
      case u: Unique =>
        groupSizeReport(df, u.columns, col("__cnt") > 1, u.name, u.target)
      case m: MinGroupSize =>
        groupSizeReport(df, m.columns, col("__cnt") < m.k, m.name, m.target)
    }
    // --- FK: one anti join per referenced table ---
    val fkReports = constraints.collect { case fk: ForeignKey =>
      val probe = df.select(fk.columns.map(col): _*)
      val nonNull = fk.columns.map(col(_).isNotNull).reduce(_ && _)
      val refKeys = fk.ref
        .select(fk.refColumns.zip(fk.columns).map { case (r, c) =>
          col(r).as(s"__r_$c") }: _*)
        .distinct()
      val cond = fk.columns.map(c => col(c) === col(s"__r_$c"))
        .reduce(_ && _)
      val orphans = probe.filter(nonNull)
        .join(refKeys, cond, "left_anti")
      // both sides of this cross join are 1-row aggregates
      orphans.agg(count(lit(1)).as("n_violations"))
        .crossJoin(probe.agg(count(lit(1)).as("__total")))
        .select(lit(fk.name).as("rule"), lit(fk.target).as("target"),
          col("__total").as("n_rows"), col("n_violations"))
    }
    val all = (rowReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_ unionByName _)
    all.withColumn("passed",
      when(col("n_violations") === 0L, 1).otherwise(0))
      .select(reportCols.map(col): _*)
  }

  /** Shared group-cardinality counter: violations = rows in groups whose
    * count satisfies `bad` (cnt > 1 for Unique, cnt < k for
    * MinGroupSize). */
  private def groupSizeReport(df: DataFrame, columns: Seq[String],
                              bad: Column, rule: String,
                              target: String): DataFrame =
    df.groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .agg(
        coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
        coalesce(sum(when(bad, col("__cnt")).otherwise(0L)), lit(0L))
          .as("n_violations"))
      .select(lit(rule).as("rule"), lit(target).as("target"),
        col("n_rows"), col("n_violations"))

  /** Convenience: rows of `df` violating any row-level rule in
    * `constraints`, tagged with the first failing rule — the quarantine
    * frame a pipeline routes to a reject sink (the mirror of
    * `check`'s counters; same single-scan shape, map-only). */
  def quarantine(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val rowLevel = constraints.filter {
      case _: NotNull | _: InRange | _: InSet | _: Satisfies => true
      case _ => false
    }
    require(rowLevel.nonEmpty, "quarantine needs row-level rules")
    val firstFail = rowLevel.foldLeft(lit(null).cast("string")) { (acc, c) =>
      coalesce(acc, when(violation(c) === 1L,
        lit(s"${c.name}(${c.target})")))
    }
    df.withColumn("__fail", firstFail).filter(col("__fail").isNotNull)
      .withColumnRenamed("__fail", "failed_rule")
  }

  /** K-ANONYMITY / L-DIVERSITY report — the re-identification screen
    * run before sharing a dataset: every quasi-identifier combination
    * (the columns an attacker could link on) must cover at least k
    * individuals (k-anonymity), and within each such group the
    * sensitive attribute must take at least l distinct values
    * (l-diversity — a k-anonymous group that is 100% one diagnosis
    * still leaks it). One row of exact counts; release gates read
    * `k_viol_rows == 0 && min_l >= l`.
    *
    * NULL semantics (documented, deliberate): a NULL in a quasi column
    * is its own linkable value (groupBy semantics — an attacker can
    * link on "field absent" too); NULL sensitive values don't count
    * toward diversity (count-distinct semantics), so an all-NULL
    * group reports l = 0.
    *
    * Output: one row (n_rows, n_groups, min_group_size, k_viol_groups,
    * k_viol_rows, min_l, l_viol_groups) — mins NULL on empty input.
    *
    * Scale shape: ONE groupBy on the quasi key (map-side partial)
    * carrying (count, approx-free exact distinct via a two-level
    * group), then a 1-row rollup. The quasi alphabet crosses the
    * shuffle, rows never do twice. */
  def privacyReport(df: DataFrame, quasiCols: Seq[String],
                    sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    // exact distinct without countDistinct's per-group expansion bomb:
    // (quasi, sensitive) pairs first — the shuffle carries the pair
    // alphabet — then counts roll up
    val pairs = df.groupBy((quasiCols.map(col) :+
        col(sensitiveCol).as("__sv")): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = pairs.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__n"),
        sum(when(col("__sv").isNotNull, 1L).otherwise(0L)).as("__l"))
    groups.agg(
      coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_groups"),
      min(col("__n")).cast("long").as("min_group_size"),
      coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("k_viol_groups"),
      coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
        lit(0L)).cast("long").as("k_viol_rows"),
      min(col("__l")).cast("long").as("min_l"),
      coalesce(sum(when(col("__l") < l, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("l_viol_groups"))
  }

  /** T-CLOSENESS report — the distributional strengthening of
    * [[privacyReport]]'s k-anonymity/l-diversity: a quasi-identifier
    * group can satisfy both and still leak ("every 35-year-old in
    * 10001 has LOW balance") if its SENSITIVE-value distribution sits
    * far from the corpus's. For an ORDINAL sensitive attribute
    * (bucketed), the distance is the exact 1-D earth-mover's distance
    * with unit ground distance, normalized by (B−1):
    *
    *   t_g = (Σ_b |cum_g(b)·N − cum_G(b)·n_g|) / (n_g·N·(B−1))
    *
    * — pure integer cross-multiplication (the per-group and global
    * CDFs never materialize as fractions), floored once per group in
    * ppm. Rows with a NULL quasi key or NULL bucket cannot ride the
    * grid join and are excluded — but never silently: `n_excluded`
    * reports exactly how many rows fell out (the brier/ECE clamp
    * lesson: a dropped row must be visible in the output).
    *
    * Output one row: (n_rows, n_excluded, n_groups, n_buckets,
    * max_t_ppm, viol_groups = groups with t_ppm > tPpm). max_t 0 when
    * B = 1.
    *
    * Scale shape: one (quasi, bucket) groupBy; the global CDF is a
    * window-free running sum over the B-row bucket alphabet; the
    * group×bucket grid is n_groups·B rows (B is a bounded alphabet by
    * contract — buckets, not raw values) with a per-group window
    * whose state is ≤ B rows; one final rollup. */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
                       bucketCol: String, tPpm: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(tPpm >= 0 && tPpm <= 1000000L,
      s"tPpm must be in [0, 1000000], got $tPpm")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val qs = quasiCols.map(col)
    val keep = qs.map(_.isNotNull).reduce(_ && _) &&
      col(bucketCol).isNotNull
    val excluded = df.agg(
      coalesce(sum(when(keep, 0L).otherwise(1L)), lit(0L)).as("__ex"))
    val cells = df.where(keep)
      .groupBy(qs :+ col(bucketCol).cast("long").as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // consumed by the global CDF, groups, and grid
    val global = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__gc"))
    val gcum = GlobalRank.globalRunningSum(global, Seq(col("__b").asc),
        "__gc", "__gcum")
      .select(col("__b"), col("__gcum"))
    // NB: Spark resolution is case-insensitive — "__N" would collide
    // with the per-group "__n", so the totals get distinct names
    val totals = global.agg(sum(col("__gc")).as("__tot"),
      count(lit(1)).as("__nb"))
    val groups = cells.groupBy(qs: _*).agg(sum(col("__c")).as("__n"))
    val grid = groups.crossJoin(broadcast(gcum))
      .join(cells, quasiCols :+ "__b", "left")
      .withColumn("__c0", coalesce(col("__c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy(col("__b"))
    val perGroup = grid
      .withColumn("__cum", sum(col("__c0")).over(w))
      .crossJoin(broadcast(totals))
      .groupBy((qs :+ col("__n") :+ col("__tot") :+ col("__nb")): _*)
      .agg(sum(abs(col("__cum").cast(d38) * col("__tot") -
        col("__gcum").cast(d38) * col("__n"))).as("__s"))
      .select(col("__n"), col("__tot"), col("__nb"),
        when(col("__nb") < 2, lit(0L)).otherwise(expr(
          """CAST((1000000 * __s)
            |div (CAST(__n AS DECIMAL(38,0)) * __tot * (__nb - 1))
            |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("__t"))
    perGroup.agg(
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_groups"),
        coalesce(max(col("__nb")), lit(0L)).cast("long").as("n_buckets"),
        coalesce(max(col("__t")), lit(0L)).cast("long").as("max_t_ppm"),
        coalesce(sum(when(col("__t") > tPpm, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("viol_groups"))
      .crossJoin(broadcast(excluded))
      .select(col("n_rows"), col("__ex").cast("long").as("n_excluded"),
        col("n_groups"), col("n_buckets"), col("max_t_ppm"),
        col("viol_groups"))
  }
}
