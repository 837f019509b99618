package graft

import graft.llm.UrlOps
import org.apache.spark.sql.functions._

/** llm/UrlOps — URL canonicalization and host rollups. */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(UrlOps.normalizeUrl($"u"))
      .as[Option[String]].collect().toSeq

  test("normalizeUrl: case, ports, params, fragment, trailing dot") {
    assert(norm(
      "HTTP://Example.COM:80/a?utm_source=x&b=1#top",
      "https://example.com.:443",
      "http://h:8080/p?z=1&a=2&a=1",
      "ftp://files.example.com:21/x",
      "http://h/p?utm_a=1&ref=x&gclid=2",
      "relative/path",
      "http://h/p?a",
      "HtTpS://MiXeD.Case/P?")
      == Seq(
        Some("http://example.com/a?b=1"),
        Some("https://example.com/"),
        Some("http://h:8080/p?a=1&a=2&z=1"), // byte-sorted, dups kept
        Some("ftp://files.example.com:21/x"), // non-http default ports kept
        Some("http://h/p"),                   // all-tracking query drops '?'
        None,                                 // not absolute → NULL
        Some("http://h/p?a"),                 // valueless param kept
        Some("https://mixed.case/P")))        // path case preserved
  }

  test("registrableDomain: naive PSL rule, single labels, ccTLD") {
    val got = Seq("www.example.co.uk", "a.b.example.com", "example.com",
        "localhost", "shop.example.ac.jp", "x.y.z.co")
      .toDF("h").select(UrlOps.registrableDomain($"h"))
      .as[String].collect().toSeq
    assert(got == Seq("example.co.uk", "example.com", "example.com",
      "localhost", "example.ac.jp", "z.co"))
  }

  test("urlDedup keeps the smallest id per canonical url") {
    val df = Seq(
      (3L, "http://A.com/x?b=1&a=1"),
      (1L, "HTTP://a.COM:80/x?a=1&b=1#f"),  // same canonical as above
      (2L, "http://a.com/y"),
      (9L, "junk")
    ).toDF("id", "url")
    val got = UrlOps.urlDedup(df, "url", "id")
      .select($"id", $"url_norm").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "http://a.com/x?a=1&b=1"), (2L, "http://a.com/y")))
  }

  test("frontierSchedule: per-host wave budget, priority first, total order") {
    val df = Seq(
      (1L, "http://a.com/1", 5L), (2L, "http://a.com/2", 9L),
      (3L, "http://a.com/3", 9L), (4L, "http://a.com/4", 1L),
      (5L, "http://b.com/x", 0L), (6L, "junk", 9L)
    ).toDF("id", "url", "prio")
    val got = UrlOps.frontierSchedule(df, "url", "prio", perHostPerWave = 2,
        tieCols = Seq("id"))
      .select($"id", $"wave", $"slot").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // a.com order: prio 9 (urls /2 then /3), prio 5 (/1), prio 1 (/4)
    assert(got == Map(2L -> ((0, 0)), 3L -> ((0, 1)),
      1L -> ((1, 0)), 4L -> ((1, 1)), 5L -> ((0, 0))))
    // budget respected under repartitioning too
    val waves = UrlOps.frontierSchedule(df.repartition(5), "url", "prio", 2,
        Seq("id"))
      .groupBy($"host", $"wave").count().as[(String, Int, Long)].collect()
    assert(waves.forall(_._3 <= 2))
  }

  test("domainStats aggregates hosts and canonical urls per domain") {
    val df = Seq(
      "http://a.example.com/1", "http://b.example.com/1",
      "http://a.example.com/1?utm_x=1",   // same canonical as the first
      "https://other.org/", "nope"
    ).toDF("url")
    val got = UrlOps.domainStats(df, "url")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "example.com" -> ((3L, 2L, 2L)),
      "other.org" -> ((1L, 1L, 1L))))
  }
}
