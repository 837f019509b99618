package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host rollups — the crawl-curation layer in
  * front of every web-corpus pipeline: the same page arrives under
  * `HTTP://Example.com:80/a?utm_source=x&b=1#top` and
  * `http://example.com/a?b=1`, and dedup/blocklists/per-host quotas
  * all need ONE canonical key per page and ONE registrable domain per
  * host. Everything here is built from codegen'd builtin column
  * functions (regexp_extract / split / filter / array_sort /
  * concat) — map-only, no shuffle, no UDF — and every rule is exact
  * string arithmetic an external engine replays, so the whole pass is
  * oracle-checkable (gate q232).
  *
  * Normalization contract (RFC 3986 §6 syntax-based normalization,
  * the subset that never changes which resource is referenced, plus
  * the standard tracking-param strip):
  *   - scheme and host lowercase; trailing dot of the host dropped;
  *   - default ports dropped (http:80, https:443), others kept;
  *   - empty path → "/";  dot-segments NOT resolved and
  *     percent-encoding NOT touched (both can change semantics on
  *     hostile inputs — documented non-goals);
  *   - query split on '&': empty pairs and tracking params dropped
  *     (name prefix `utm_`, or name ∈ {gclid, fbclid, msclkid,
  *     yclid, ref}), survivors BYTE-SORTED (param order is almost
  *     never semantic; sorting merges permutations) and rejoined;
  *     empty survivor set → no '?';
  *   - fragment dropped (never sent to the server).
  *
  * Inputs that don't parse as absolute hierarchical URLs
  * (`scheme://host...`) normalize to NULL — surface them, don't
  * guess. */
object UrlOps {

  private val urlRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Parsed components as individual columns; all NULL (except the
    * original) when the URL doesn't match the absolute form. Spark's
    * regexp_extract returns "" for a non-matching/absent group — the
    * empty string is mapped back to NULL for port/query so "no port"
    * and "no query" are facts, not sentinel strings. */
  def parseUrl(url: Column): Column = {
    def grp(i: Int) = regexp_extract(url, urlRe, i)
    val matched = url.rlike(urlRe)
    struct(
      when(matched, grp(1)).as("scheme"),
      when(matched, grp(2)).as("host"),
      when(matched && grp(3) =!= "", grp(3).cast("int")).as("port"),
      when(matched, grp(4)).as("path"),
      when(matched && grp(5) =!= "", grp(5)).as("query"))
  }

  private val trackingNames = Seq("gclid", "fbclid", "msclkid", "yclid", "ref")

  /** The canonical form per the contract above, NULL when unparseable. */
  def normalizeUrl(url: Column): Column = {
    val p = parseUrl(url)
    val scheme = lower(p.getField("scheme"))
    val host = regexp_replace(lower(p.getField("host")), "\\.$", "")
    val port = p.getField("port")
    val defaultPort =
      (scheme === "http" && port === 80) ||
        (scheme === "https" && port === 443)
    val portPart = when(port.isNull || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    val path = when(p.getField("path") === "", lit("/"))
      .otherwise(p.getField("path"))
    val kept = array_sort(filter(
      split(coalesce(p.getField("query"), lit("")), "&"),
      kv => kv =!= "" &&
        !startswith(kv, lit("utm_")) &&
        !element_at(split(kv, "=", 2), 1)
          .isin(trackingNames.map(x => x: Any): _*)))
    val queryPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(p.getField("scheme").isNotNull,
      concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Lowercased, trailing-dot-stripped host; NULL when unparseable. */
  def hostOf(url: Column): Column =
    when(parseUrl(url).getField("host").isNotNull,
      regexp_replace(lower(parseUrl(url).getField("host")), "\\.$", ""))

  /** Effective second-level registrable domain, NAIVE rule (not the
    * Public Suffix List — a deliberate, documented approximation):
    * take the last 2 labels, or the last 3 when the host ends in a
    * two-label public-ish suffix (second-level label ∈ {co, com, net,
    * org, gov, ac, edu} AND a 2-char ccTLD) — `shop.example.co.uk` →
    * `example.co.uk`, `a.b.example.com` → `example.com`. Hosts with
    * one label (localhost, intranet names) pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val second = element_at(labels, -2)
    val ccSecond = length(tld) === 2 &&
      second.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 1, host)
      .when(n >= 3 && ccSecond,
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** Canonical-URL dedup: one row per distinct normalized URL, keeping
    * the row with the smallest `idCol` (crawl-order-independent pick) —
    * exact-dedup shape, hash-partitioned on the canonical key. Rows
    * whose URL doesn't parse are DROPPED (no canonical identity to
    * dedup on); screen them beforehand via [[normalizeUrl]] IS NULL. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val norm = df.withColumn("url_norm", normalizeUrl(col(urlCol)))
      .where(col("url_norm").isNotNull)
    val winners = norm.groupBy(col("url_norm"))
      .agg(min(col(idCol)).as(idCol))
    norm.join(winners, Seq("url_norm", idCol))
  }

  /** Politeness scheduling for a crawl frontier: assign every
    * parseable URL a (wave, slot) such that at most `perHostPerWave`
    * URLs of one host land in the same wave — the standard
    * "don't hammer a host" constraint, materialized as data instead of
    * hidden in a fetcher's rate limiter so the schedule is auditable
    * and resumable. Within a host, higher `priorityCol` fetches first;
    * ties break by canonical URL ascending, then by `tieCols` — pass a
    * unique row id there whenever the frontier can hold DUPLICATE
    * canonical URLs (refetch queues), so the order is total and the
    * schedule is partition-independent and identical across re-runs.
    *
    * Output: input row + url_norm, host, wave (0-based), slot
    * (0..perHostPerWave−1). Unparseable URLs are dropped — they cannot
    * be fetched.
    *
    * Scale shape: ONE window partitioned by host (state = one host's
    * rows; hosts are the natural parallelism of a crawl). A pathological
    * mega-host serializes its own ranking — that host is equally the
    * crawl's bottleneck, so the skew mirrors the real constraint; cap
    * per-host frontier size upstream if needed. */
  def frontierSchedule(df: DataFrame, urlCol: String, priorityCol: String,
                       perHostPerWave: Int,
                       tieCols: Seq[String] = Nil): DataFrame = {
    require(perHostPerWave >= 1,
      s"perHostPerWave must be >= 1, got $perHostPerWave")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col(priorityCol).desc +: col("url_norm") +:
        tieCols.map(col): _*)
    df.withColumn("url_norm", normalizeUrl(col(urlCol)))
      .withColumn("host", hostOf(col(urlCol)))
      .where(col("url_norm").isNotNull)
      .withColumn("__r", row_number().over(w) - 1)
      .withColumn("wave", expr(s"__r div $perHostPerWave").cast("int"))
      .withColumn("slot", (col("__r") % perHostPerWave).cast("int"))
      .drop("__r")
  }

  /** Per-registrable-domain crawl stats: pages, distinct hosts,
    * distinct canonical URLs — the quota/skew view a crawl frontier
    * budgets by. One map-only normalize + one domain-keyed aggregate. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val host = hostOf(col(urlCol))
    df.select(registrableDomain(host).as("domain"), host.as("host"),
        normalizeUrl(col(urlCol)).as("url_norm"))
      .where(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_pages"),
        count_distinct(col("host")).as("n_hosts"),
        count_distinct(col("url_norm")).as("n_urls"))
  }
}
