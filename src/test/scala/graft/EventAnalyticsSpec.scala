package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._

/** ops/EventAnalytics — funnel levels and cohort retention against
  * hand-computable fixtures. */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in µs

  test("funnelLevels: full reach, partial reach, order and window rules") {
    val events = Seq(
      // user 1: view→click→purchase in order → level 3 (regression: the
      // when-chain must test the DEEPEST step first)
      (1L, 0 * M, "view"), (1L, 5 * M, "click"), (1L, 9 * M, "purchase"),
      // user 2: view→click, purchase BEFORE the click → level 2 (step
      // order matters: t3 must be >= t2)
      (2L, 0 * M, "view"), (2L, 6 * M, "purchase"), (2L, 8 * M, "click"),
      // user 3: view only → level 1
      (3L, 0 * M, "view"),
      // user 4: click/purchase but never a view → absent
      (4L, 0 * M, "click"), (4L, 1 * M, "purchase"),
      // user 5: view, click outside the window → level 1
      (5L, 0 * M, "view"), (5L, 120 * M, "click"),
      // user 6: second view starts nothing — window anchors at FIRST view;
      // click within window of first view → level 2
      (6L, 0 * M, "view"), (6L, 50 * M, "view"), (6L, 55 * M, "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelLevels(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), windowUs = 60 * M)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 5L -> 1, 6L -> 2))
    // partition independence
    val again = EventAnalytics.funnelLevels(events.repartition(7), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"), 60 * M)
      .as[(Long, Int)].collect().toMap
    assert(again == got)
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelLevels(events, "user_id", "ts", "event_type",
        Seq("view"), 60 * M)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelLevels(events, "user_id", "ts", "event_type",
        Seq("view", "view"), 60 * M)
    }
  }

  test("funnelLevels: four-step funnel reaches every intermediate level") {
    val steps = Seq("a", "b", "c", "d")
    val events = (1 to 4).flatMap { reach =>
      steps.take(reach).zipWithIndex.map { case (s, i) =>
        (reach.toLong, i * M, s) }
    }.toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelLevels(events, "user_id", "ts",
        "event_type", steps, windowUs = 60 * M)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("cohortRetention matches a driver reference and is partition-independent") {
    val D = 24L * 3600 * 1000000L
    val events = Seq(
      (1L, 0L), (1L, D + 5), (1L, 3 * D),          // cohort 0, days 0/1/3
      (2L, 0L), (2L, 0L + 7),                       // cohort 0, day 0 twice
      (3L, D), (3L, 2 * D), (3L, 2 * D + 9)         // cohort 1, days 1/2
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts", D)
      .as[(Long, Long, Long)].collect().toSet
    val want = Set(
      (0L, 0L, 2L),  // users 1,2 active day 0
      (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L))
    assert(got == want)
    val again = EventAnalytics.cohortRetention(events.repartition(5),
        "user_id", "ts", D).as[(Long, Long, Long)].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      EventAnalytics.cohortRetention(events, "user_id", "ts", 0L)
    }
  }

  test("eventTransitions: counts, per-mille floors, tie-break by id") {
    val events = Seq(
      // user 1: a→b→b (ties on ts at 2*M resolved by event_id: 11 then 12)
      (1L, 10L, 0 * M, "a"), (1L, 11L, 2 * M, "b"), (1L, 12L, 2 * M, "b"),
      // user 2: a→c
      (2L, 20L, 0 * M, "a"), (2L, 21L, 1 * M, "c"),
      // user 3: a→b
      (3L, 30L, 0 * M, "a"), (3L, 31L, 1 * M, "b"),
      // user 4: single event — no transition
      (4L, 40L, 0 * M, "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.eventTransitions(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    // a: 3 outgoing (b,b? no — a→b twice, a→c once); b: b→b once
    val want = Set(
      ("a", "b", 2L, 666L),  // floor(2000/3)
      ("a", "c", 1L, 333L),
      ("b", "b", 1L, 1000L))
    assert(got == want)
    val again = EventAnalytics.eventTransitions(events.repartition(5),
        "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("topPaths: first-k order, tie-break, topN boundary") {
    val events = Seq(
      // three users share path a>b, one user path b>a, one has 1 event
      (1L, 1L, 0 * M, "a"), (1L, 2L, 1 * M, "b"), (1L, 3L, 2 * M, "c"),
      (2L, 4L, 0 * M, "a"), (2L, 5L, 1 * M, "b"),
      // user 3: ts tie — event_id orders a before b
      (3L, 6L, 0 * M, "a"), (3L, 7L, 0 * M, "b"),
      (4L, 8L, 0 * M, "b"), (4L, 9L, 1 * M, "a"),
      (5L, 10L, 0 * M, "z")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.topPaths(events, "user_id", "ts", "event_id",
        "event_type", k = 2, topN = 2)
      .as[(String, Long)].collect().toList
    // a>b count 3 first; then the n_users=1 paths tie-broken by path
    // string: "a>b" (already taken), "b>a" < "z" → b>a second
    assert(got == List(("a>b", 3L), ("b>a", 1L)))
    val again = EventAnalytics.topPaths(events.repartition(6), "user_id",
        "ts", "event_id", "event_type", k = 2, topN = 2)
      .as[(String, Long)].collect().toList
    assert(again == got)
    intercept[IllegalArgumentException] {
      EventAnalytics.topPaths(events, "user_id", "ts", "event_id",
        "event_type", k = 0, topN = 2)
    }
  }

  test("sequenceMatchGaps: level-wise reachability beats greedy chaining") {
    val events = Seq(
      // user 1: A@0 dead-ends (no B within gap), but A@95→B@100→C@105
      // completes — the case greedy first-occurrence chaining misses
      (1L, 0 * M, "A"), (1L, 95 * M, "A"), (1L, 100 * M, "B"),
      (1L, 105 * M, "C"),
      // user 2: in order but second gap too wide → no match
      (2L, 0 * M, "A"), (2L, 5 * M, "B"), (2L, 30 * M, "C"),
      // user 3: wrong order (B before A) → no match
      (3L, 10 * M, "B"), (3L, 20 * M, "A"), (3L, 25 * M, "C"),
      // user 4: two completions; earliest final-step ts wins
      (4L, 0 * M, "A"), (4L, 4 * M, "B"), (4L, 8 * M, "C"),
      (4L, 20 * M, "A"), (4L, 24 * M, "B"), (4L, 28 * M, "C"),
      // user 5: simultaneous A and B chain (>= convention), then C
      (5L, 0 * M, "A"), (5L, 0 * M, "B"), (5L, 5 * M, "C")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.sequenceMatchGaps(events, "user_id", "ts",
        "event_type", Seq("A", "B", "C"), maxGapUs = 10 * M)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 105 * M, 4L -> 8 * M, 5L -> 5 * M))
    // partition independence
    val again = EventAnalytics.sequenceMatchGaps(events.repartition(7),
      "user_id", "ts", "event_type", Seq("A", "B", "C"), maxGapUs = 10 * M)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    // guards
    intercept[IllegalArgumentException] {
      EventAnalytics.sequenceMatchGaps(events, "user_id", "ts",
        "event_type", Seq("A"), maxGapUs = 10 * M)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.sequenceMatchGaps(events, "user_id", "ts",
        "event_type", Seq("A", "B"), maxGapUs = 0)
    }
  }

  test("sequenceMatchNoEvent: forbidden strictly between kills the pair") {
    val events = Seq(
      // user 1: clean A→B → match at B
      (1L, 0 * M, "A"), (1L, 5 * M, "B"),
      // user 2: X strictly between the only A and B → no match
      (2L, 0 * M, "A"), (2L, 3 * M, "X"), (2L, 5 * M, "B"),
      // user 3: X between A1 and B, but a LATER A2 after X rescues it
      (3L, 0 * M, "A"), (3L, 2 * M, "X"), (3L, 4 * M, "A"),
      (3L, 6 * M, "B"),
      // user 4: X before A and after B — outside, still clean
      (4L, 0 * M, "X"), (4L, 1 * M, "A"), (4L, 3 * M, "B"),
      (4L, 9 * M, "X"),
      // user 5: X exactly at the A timestamp is NOT strictly between
      (5L, 0 * M, "A"), (5L, 0 * M, "X"), (5L, 4 * M, "B"),
      // user 6: A→B outside the gap → no match
      (6L, 0 * M, "A"), (6L, 50 * M, "B")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.sequenceMatchNoEvent(events, "user_id", "ts",
        "event_type", first = "A", last = "B", forbidden = "X",
        maxGapUs = 10 * M)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5 * M, 3L -> 6 * M, 4L -> 3 * M, 5L -> 4 * M))
    // partition independence
    val again = EventAnalytics.sequenceMatchNoEvent(events.repartition(5),
      "user_id", "ts", "event_type", "A", "B", "X", maxGapUs = 10 * M)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    // guards
    intercept[IllegalArgumentException] {
      EventAnalytics.sequenceMatchNoEvent(events, "user_id", "ts",
        "event_type", "A", "B", "A", maxGapUs = 10 * M)
    }
  }

  test("ohlcBars: first/last by (ts, id), same-ts ties broken by id") {
    val ev = Seq(
      // period 0: open=5 (t=1), high=30, low=2, close=2 (t=99)
      ("g", 1L, 1L, 5L), ("g", 2L, 40L, 30L), ("g", 3L, 70L, 2L),
      ("g", 4L, 99L, 2L),
      // period 1: same-ts pair — id 6 beats id 5 for close, id 5 opens
      ("g", 5L, 150L, 11L), ("g", 6L, 150L, 13L)
    ).toDF("g", "id", "ts", "v")
    val got = EventAnalytics.ohlcBars(ev, "g", "ts", "v",
        periodUs = 100L, idCol = "id")
      .select("g", "period", "open", "high", "low", "close", "n")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 0L, 5L, 30L, 2L, 2L, 4L),
      ("g", 1L, 11L, 13L, 11L, 13L, 2L)))
    // partition independence (min_by/max_by merge map-side partials)
    val again = EventAnalytics.ohlcBars(ev.repartition(5), "g", "ts", "v",
        100L, "id")
      .select("g", "period", "open", "high", "low", "close", "n")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("timeWeightedAverage: holds levels between observations, not avg()") {
    // period 100 µs; group g: v=10 held 90 µs then v=100 held 10 µs →
    // TWAP = (10·90 + 100·10)/100 = 19, while avg() would say 55
    val ev = Seq(
      ("g", 1L, 0L, 10L), ("g", 2L, 90L, 100L),
      // next period: single observation at t=120 held to period end →
      // den only covers 120..200 (80 µs), twap = the level itself
      ("g", 3L, 120L, 7L),
      // same-ts tiebreak: id 5 follows id 4 at t=300, dt(id4)=0
      ("h", 4L, 300L, 1000L), ("h", 5L, 300L, 2L)
    ).toDF("g", "id", "ts", "v")
    val got = EventAnalytics.timeWeightedAverage(ev, "g", "ts", "v",
        periodUs = 100L, idCol = "id")
      .select("g", "period", "n", "twap", "den")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 0L, 2L, 19L, 100L),
      ("g", 1L, 1L, 7L, 80L),
      ("h", 3L, 2L, 2L, 100L)))   // zero-dt first writer contributes 0 weight
    // partition independence
    val again = EventAnalytics.timeWeightedAverage(ev.repartition(7),
        "g", "ts", "v", periodUs = 100L, idCol = "id")
      .select("g", "period", "n", "twap", "den")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      EventAnalytics.timeWeightedAverage(ev, "g", "ts", "v", 0L, "id")
    }
  }

  test("rfmSegments: quintiles by cume rule, recency inverted, segment code") {
    val day = 86400000000L
    // 5 users, one purchase each on days 1..5 with values 10,20,30,40,50
    // → every metric splits into clean quintiles
    val ev = (1 to 5).map { i =>
      (i.toLong, i.toLong, i * day, "purchase", i * 10.0)
    } :+ ((9L, 99L, 3 * day, "view", 999.0))   // non-conversions ignored
    val got = EventAnalytics.rfmSegments(
        ev.toDF("user_id", "event_id", "ts", "event_type", "value"),
        "user_id", "ts", "event_type", "purchase", "value")
      .select($"user_id", $"r_days", $"r_q", $"f_q", $"m_q", $"segment")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // user 5 purchased last (r_days 0 → r_q 5) and highest value (m_q 5);
    // frequency all tied at 1 → everyone f_q 5 (cume = 1)
    assert(got(5L) == ((5L, 0L, 5L, 5L, 5L, 555L)))
    assert(got(1L) == ((1L, 4L, 1L, 5L, 1L, 151L)))
    assert(got(3L) == ((3L, 2L, 3L, 5L, 3L, 353L)))
    assert(!got.contains(9L), "non-purchasers carry no segment")
    // determinism across partitionings
    val again = EventAnalytics.rfmSegments(
        ev.toDF("user_id", "event_id", "ts", "event_type", "value")
          .repartition(7),
        "user_id", "ts", "event_type", "purchase", "value")
      .select($"user_id", $"r_days", $"r_q", $"f_q", $"m_q", $"segment")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("attribution: next-conversion assignment, first/last/linear credit") {
    val ev = Seq(
      // user 1: v@0, c@10, v@20 → purchase@30; v@40 has no later purchase
      // within 60 µs of it... (purchase@30 is BEFORE it → unattributed)
      (1L, 1L, 0L, "view"), (1L, 2L, 10L, "click"), (1L, 3L, 20L, "view"),
      (1L, 4L, 30L, "purchase"), (1L, 5L, 40L, "view"),
      // user 2: touch exactly AT the conversion ts is NOT credited
      // (strictly-before rule); the earlier click is
      (2L, 6L, 0L, "click"), (2L, 7L, 5L, "purchase"), (2L, 8L, 5L, "view"),
      // user 2 second purchase@100: view@5 is outside 60 µs lookback,
      // click@50 inside → sole touch takes first+last+full linear
      (2L, 9L, 50L, "click"), (2L, 10L, 100L, "purchase"),
      // user 3: two touches, TWO purchases — both touches go to the
      // EARLIER purchase (next-conversion rule), second purchase empty
      (3L, 11L, 0L, "view"), (3L, 12L, 1L, "click"),
      (3L, 13L, 2L, "purchase"), (3L, 14L, 3L, "purchase"),
      // user 4: touches but no purchase at all → nothing
      (4L, 15L, 0L, "view"), (4L, 16L, 1L, "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.attribution(df, "user_id", "ts", "event_id",
          "event_type", "purchase", Seq("view", "click"), lookbackUs = 60L)
        .as[(String, Long, Long, Long, Long)].collect().toSet
    val got = run(ev)
    // u1 conv@30: {v@0, c@10, v@20} n=3, first=v@0, last=v@20
    // u2 conv@5: {c@0} sole touch = first AND last; conv@100: {c@50} sole
    // u3 conv@2: {v@0, c@1} n=2, first=v@0, last=c@1
    // unattributed (earn nothing): v@40 u1 (no later conv), v@5 u2
    // (same-ts conv not strictly after; next conv outside lookback), u4
    assert(got == Set(
      ("view", 3L, 2L, 1L, 333333L + 333333L + 500000L),
      ("click", 4L, 2L, 3L, 333333L + 1000000L + 1000000L + 500000L)))
    assert(run(ev.repartition(7)) == got)
    intercept[IllegalArgumentException] {
      EventAnalytics.attribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("purchase", "view"), 60L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.attribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view"), 0L)
    }
  }

  test("hazardByTenure: life-table counts, at-risk suffix sums, hazard rule") {
    // periodUs = 10: users span (last−first) periods
    // u1: 0..35 → tenure 3; u2: 0..12 → 1; u3: 5..17 → 1; u4: 40..41 → 0
    val ev = Seq((1L, 0L), (1L, 35L), (2L, 0L), (2L, 12L),
      (3L, 5L), (3L, 17L), (4L, 40L), (4L, 41L)).toDF("user_id", "ts")
    val got = EventAnalytics.hazardByTenure(ev, "user_id", "ts", periodUs = 10L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // tenure 0: d=1, at risk all 4 → 250000; tenure 1: d=2, at risk 3
    // → 666666; tenure 3: d=1, at risk 1 → 10⁶
    assert(got == Map(
      0L -> ((1L, 4L, 250000L)),
      1L -> ((2L, 3L, 666666L)),
      3L -> ((1L, 1L, 1000000L))))
    // at-risk counts are a suffix sum: n_t at min tenure = user count
    val again = EventAnalytics.hazardByTenure(
        ev.repartition(7), "user_id", "ts", periodUs = 10L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == got)
  }

  test("timeDecayAttribution: power-of-two decay, per-conversion normalize") {
    // user 1: touches at age 0.5d (w=10⁶) and 1.5d (w=5·10⁵) before one
    // conversion → shares 666666 + 333333; user 2: one ancient touch
    // (25 half-lives → floor weight 1) still gets the full 10⁶.
    val day = 86400000000L
    val ev = Seq(
      (1L, "view",     10L * day - day / 2,      100L),
      (1L, "click",    10L * day - 3 * day / 2,  101L),
      (1L, "purchase", 10L * day,                102L),
      (2L, "view",     40L * day - 25 * day,     200L),
      (2L, "purchase", 40L * day,                201L)
    ).toDF("u", "t", "ts", "id")
    val got = EventAnalytics.timeDecayAttribution(ev, "u", "ts", "id",
        "t", "purchase", Seq("view", "click"),
        lookbackUs = 30L * day, halfLifeUs = day)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("click") == ((1L, 333333L)))
    assert(got("view") == ((2L, 666666L + 1000000L)),
      "the lone ancient touch must take its conversion's full credit")
  }

  test("activityStreaks: islands split on gaps, longest ties to earliest") {
    // user 1: days 1,2,3 | 7 | 10,11,12 → two 3-runs, earliest start 1
    // user 2: single day; duplicates within a day collapse
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 10L),
      (1L, 11L), (1L, 12L), (2L, 5L), (2L, 5L)).toDF("u", "day")
    val got = EventAnalytics.activityStreaks(df, "u", "day")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((7L, 3L, 3L, 1L)),
      "tie between the 1-2-3 and 10-11-12 runs must pick start 1")
    assert(got(2L) == ((1L, 1L, 1L, 5L)))
    val rep = EventAnalytics.activityStreaks(df.repartition(7), "u", "day")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rep == got)
  }

  test("dwellByState: gaps attribute to the preceding state; ties break on id") {
    // user 1: A@0 → B@10 → A@25 → (end). Dwells: A 10, B 15.
    // user 2: simultaneous A@5(id=1), B@5(id=2) → A dwells 0, B last.
    val ev = Seq((1L, "A", 0L, 10L), (1L, "B", 10L, 11L),
      (1L, "A", 25L, 12L), (2L, "A", 5L, 1L), (2L, "B", 5L, 2L))
      .toDF("u", "t", "ts", "id")
    val got = EventAnalytics.dwellByState(ev, "u", "t", "ts", "id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("A" -> ((2L, 10L, 5L)), "B" -> ((1L, 15L, 15L))))
    val rep = EventAnalytics.dwellByState(ev.repartition(7),
        "u", "t", "ts", "id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == got)
  }

  test("topPaths: prefix order, short sessions, cut ties by path") {
    // u1: a,b,c,d (path a>b>c); u2: a,b,c (same); u3: b,a (short path
    // b>a); u4: a (singleton). Simultaneous events break by id.
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (1L, 40L, 4L, "d"),
      (2L, 10L, 5L, "a"), (2L, 10L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "b"), (3L, 20L, 9L, "a"),
      (4L, 10L, 10L, "a"))
      .toDF("u", "ts", "id", "t")
    val got = EventAnalytics.topPaths(ev, Seq("u"), "ts", "id", "t",
        steps = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("a", 1L), ("b>a", 1L)))
    // k cuts deterministically: ties (n=1) order by path asc
    val cut = EventAnalytics.topPaths(ev.repartition(5), Seq("u"),
        "ts", "id", "t", steps = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(cut == Seq(("a>b>c", 2L), ("a", 1L)))
  }

  test("classReport: hand confusion, vanished and invented classes") {
    // labels: a,a,a,b,b,c; preds: a,a,b,b,b,d — c never predicted,
    // d never true
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "d")).toDF("l", "p")
    val got = EventAnalytics.classReport(df, "l", "p")
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 2L, 2L,
      Some(1000000L), Some(666666L), Some(800000L))))
    assert(got("b") == (("b", 2L, 3L, 2L,
      Some(666666L), Some(1000000L), Some(800000L))))
    assert(got("c") == (("c", 1L, 0L, 0L, None, Some(0L), Some(0L))))
    assert(got("d") == (("d", 0L, 1L, 0L, Some(0L), None, Some(0L))))
    val rep = EventAnalytics.classReport(df.repartition(7), "l", "p")
      .collect().map(_.toSeq).toSet
    assert(rep == got.values.map(t => Seq[Any](t._1, t._2, t._3, t._4,
      t._5.orNull, t._6.orNull, t._7.orNull)).toSet)
  }

  test("kmSurvivalPpm: hand recurrence, monotone to zero, driver reference") {
    // tenure histogram: t=0 d=2, t=1 d=1, t=2 d=1 → n = 4, 2, 1
    // S: 10⁶·2/4 = 500000; ·1/2 = 250000; ·0/1 = 0
    val ev = Seq(
      (1L, 0L), (2L, 0L),                 // tenure 0 users
      (3L, 0L), (3L, 86400000000L),       // tenure 1
      (4L, 0L), (4L, 2 * 86400000000L))   // tenure 2
      .toDF("user_id", "ts")
    val got = EventAnalytics.kmSurvivalPpm(ev, "user_id", "ts",
        86400000000L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 2L, 4L, 500000L, 500000L),
      (1L, 1L, 2L, 500000L, 250000L),
      (2L, 1L, 1L, 1000000L, 0L)))
    // random cohort: non-increasing, ends at 0, matches a driver fold
    val rnd = new scala.util.Random(13)
    val big = (1L to 300L).flatMap { u =>
      val t = rnd.nextInt(12).toLong
      Seq((u, 0L), (u, t * 86400000000L))
    }.toDF("user_id", "ts")
    val rows = EventAnalytics.kmSurvivalPpm(big, "user_id", "ts",
        86400000000L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.sliding(2).forall(p => p(0)._5 >= p(1)._5))
    assert(rows.last._5 == 0L)
    var s = 1000000L
    rows.foreach { r =>
      s = s * (r._3 - r._2) / r._3
      assert(r._5 == s, s"recurrence mismatch at tenure ${r._1}")
    }
  }

  test("pathLengthL1: hand path, singleton, simultaneous-ts id order") {
    val pts = Seq(
      ("a", 10L, 1L, 0L, 0L), ("a", 20L, 2L, 3L, 4L), ("a", 30L, 3L, 3L, 1L),
      ("b", 10L, 4L, 5L, 5L),
      // c: two points at the SAME ts — order must fall back to id
      ("c", 10L, 5L, 0L, 0L), ("c", 10L, 6L, 2L, 0L))
      .toDF("g", "ts", "id", "x", "y")
    val got = EventAnalytics.pathLengthL1(pts, "g", "ts", "id", "x", "y")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, 2L, 10L)))
    assert(got("b") == ((1L, 0L, 0L)))
    assert(got("c") == ((2L, 1L, 2L)))
    val rep = EventAnalytics.pathLengthL1(pts.repartition(5),
        "g", "ts", "id", "x", "y")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == got)
  }

  test("maxConcurrency: sweep line, inclusive touching, earliest peak ts") {
    // [1,5],[2,3],[4,8],[8,10]: counts 1,2,1,2,1,{2,1},0 → peak 2,
    // first reached at t=2; [4,8] and [8,10] touch at 8 → concurrent
    val iv = Seq(("g", 1L, 5L), ("g", 2L, 3L), ("g", 4L, 8L),
      ("g", 8L, 10L)).toDF("g", "s", "e")
    val r = EventAnalytics.maxConcurrency(iv, "g", "s", "e")
      .as[(String, Long, Long, Long)].collect().head
    assert(r == (("g", 4L, 2L, 2L)))
    // disjoint intervals never exceed 1; zero-length interval counts
    val dis = Seq(("d", 1L, 1L), ("d", 3L, 4L)).toDF("g", "s", "e")
    val rd = EventAnalytics.maxConcurrency(dis, "g", "s", "e")
      .as[(String, Long, Long, Long)].collect().head
    assert(rd == (("d", 2L, 1L, 1L)))
    // inverted interval fails loud
    val bad = Seq(("b", 5L, 1L)).toDF("g", "s", "e")
    intercept[IllegalArgumentException](
      EventAnalytics.maxConcurrency(bad, "g", "s", "e"))
  }

  test("maxConcurrency: partition independence on random interval sets") {
    val rnd = new scala.util.Random(17)
    val iv = (1 to 400).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"g${i % 3}", s, s + rnd.nextInt(50))
    }.toDF("g", "s", "e")
    val a = EventAnalytics.maxConcurrency(iv, "g", "s", "e")
      .collect().map(_.toSeq).toSet
    val b = EventAnalytics.maxConcurrency(iv.repartition(11), "g", "s", "e")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // driver sweep reference on one group
    val one = iv.where(col("g") === "g0")
      .as[(String, Long, Long)].collect()
    val deltas = one.flatMap(x => Seq((x._2, 1), (x._3, -1)))
      .sortBy(d => (d._1, -d._2))
    val peak = deltas.scanLeft(0)((c, d) => c + d._2).max
    val got = a.find(_.head == "g0").get
    assert(got(2) == peak.toLong)
  }

  test("maxDrawdown: peak-to-trough hand case, monotone-rise zero, " +
       "non-positive-peak NULL ppm") {
    import spark.implicits._
    // g: [10,20,15,5,18] → peaks [10,20,20,20,20], worst fall 20→5
    // =15 abs, 750000 ppm; final 18
    val df = (Seq(0L -> 10L, 1L -> 20L, 2L -> 15L, 3L -> 5L, 4L -> 18L)
        .map { case (t, x) => ("g", t, x) } ++
      Seq(("up", 0L, 5L), ("up", 1L, 10L)) ++
      Seq(("neg", 0L, -5L), ("neg", 1L, -10L))).toDF("g", "t", "x")
    val got = graft.ops.EventAnalytics.maxDrawdown(df, "g", "t", "x")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 5L, 18L, 20L, 15L, Some(750000L))),
      s"got ${got("g")}")
    assert(got("up") == (("up", 2L, 10L, 10L, 0L, Some(0L))))
    // negative peaks carry the absolute fall but no relative lane
    assert(got("neg") == (("neg", 2L, -10L, -5L, 5L, None)))
    // order independence: shuffled input, same answer
    val b = graft.ops.EventAnalytics.maxDrawdown(df.repartition(7),
        "g", "t", "x")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(b == got)
  }

  test("nelsonAalenPpm: cumulative hazard is the prefix sum of the " +
       "pinned per-step hazards") {
    // the KM fixture: hazards 500000, 500000, 1000000 → Λ cumulates
    val ev = Seq(
      (1L, 0L), (2L, 0L),
      (3L, 0L), (3L, 86400000000L),
      (4L, 0L), (4L, 2 * 86400000000L))
      .toDF("user_id", "ts")
    val got = EventAnalytics.nelsonAalenPpm(ev, "user_id", "ts",
        86400000000L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 2L, 4L, 500000L, 500000L),
      (1L, 1L, 2L, 500000L, 1000000L),
      (2L, 1L, 1L, 1000000L, 2000000L)), s"got ${got.toSeq}")
  }

  test("cohortValue: curves accumulate per cohort, size stays the " +
       "denominator, late joiners form their own cohort") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L, 100L), (1L, 8 * day, 50L),    // cohort 0, ages 0 and 1
      (2L, 1 * day, 60L),                     // cohort 0, age 0
      (3L, 7 * day, 200L), (3L, 15 * day, 40L) // cohort 1, ages 0, 1
    ).toDF("u", "ts", "v")
    val got = EventAnalytics.cohortValue(ev, "u", "ts", "v",
        periodUs = day, bucketPeriods = 7L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // cohort 0 (users 1,2): age0 = 160, age1 = 50 → cum 160, 210;
    // ltv per member: 80000, 105000 milli
    assert(got((0L, 0L)) == ((0L, 0L, 2L, 160L, 160L, 80000L)),
      s"got $got")
    assert(got((0L, 1L)) == ((0L, 1L, 2L, 50L, 210L, 105000L)))
    assert(got((1L, 0L)) == ((1L, 0L, 1L, 200L, 200L, 200000L)))
    assert(got((1L, 1L)) == ((1L, 1L, 1L, 40L, 240L, 240000L)))
    // partition independence
    val b = EventAnalytics.cohortValue(ev.repartition(5), "u", "ts",
        "v", day, 7L)
      .collect().map(_.toSeq).toSet
    assert(b == got.values.map(t => Seq[Any](t._1, t._2, t._3, t._4,
      t._5, t._6)).toSet)
    // tsCol is honored, not hardcoded: same data under a column NOT
    // named "ts" must give identical curves
    val renamed = ev.withColumnRenamed("ts", "event_time_us")
    val c = EventAnalytics.cohortValue(renamed, "u", "event_time_us",
        "v", day, 7L)
      .collect().map(_.toSeq).toSet
    assert(c == b)
  }

  test("rmstMilli: KM step-function area, tau clipping, late first step") {
    // KM fixture: S = 500000 (t0), 250000 (t1), 0 (t2)
    val ev = Seq(
      (1L, 0L), (2L, 0L),
      (3L, 0L), (3L, 86400000000L),
      (4L, 0L), (4L, 2 * 86400000000L))
      .toDF("user_id", "ts")
    def rmst(tau: Long) = EventAnalytics.rmstMilli(ev, "user_id", "ts",
        86400000000L, tau)
      .as[(Long, Long, Long)].collect().head
    // τ=3: 0.5·1 + 0.25·1 + 0 = 0.75 periods
    assert(rmst(3L) == ((3L, 3L, 750L)), s"got ${rmst(3L)}")
    // τ=1 clips to the first step only
    assert(rmst(1L) == ((1L, 3L, 500L)))
    // τ past the last step adds nothing (curve at 0)
    assert(rmst(10L) == ((10L, 3L, 750L)))
    // cohort whose first deaths land at tenure 2: full survival first
    val late = Seq((1L, 0L), (1L, 2 * 86400000000L),
      (2L, 0L), (2L, 2 * 86400000000L)).toDF("user_id", "ts")
    // S(0..1) = 1, all die at t=2 → RMST(5) = 2.0 periods
    assert(EventAnalytics.rmstMilli(late, "user_id", "ts",
        86400000000L, 5L)
      .as[(Long, Long, Long)].collect().head == ((5L, 1L, 2000L)))
  }

  test("rollingActive: hand WAU, window 1 = per-period distinct, " +
       "observed-period spine only") {
    // day 0: {a,b}; day 1: {a}; day 3: {c}; window 2:
    // d0 = 2, d1 = {a,b}∪{a} = 2, d3 = {c} (day 2 absent → no row)
    val df = Seq((0L, "a"), (0L, "b"), (0L, "a"), (1L, "a"), (3L, "c"))
      .toDF("p", "id")
    val got = EventAnalytics.rollingActive(df, "p", "id", window = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 3L -> 1L), s"got $got")
    val w1 = EventAnalytics.rollingActive(df, "p", "id", window = 1)
      .as[(Long, Long)].collect().toMap
    assert(w1 == Map(0L -> 2L, 1L -> 1L, 3L -> 1L))
    // partition independence
    val b = EventAnalytics.rollingActive(df.repartition(5), "p", "id", 2)
      .as[(Long, Long)].collect().toMap
    assert(b == got)
    intercept[IllegalArgumentException](
      EventAnalytics.rollingActive(df, "p", "id", 0))
  }

  test("cIndexPpm: perfect ranking, score tie = half, inversion, NULLs") {
    // 4/4 buckets make each subject its own cell: both events (t=1,
    // t=3) outrank every later subject's score → 4/4 concordant
    val perfect = Seq((1L, 1L, 10L), (2L, 0L, 5L), (3L, 1L, 8L),
      (4L, 0L, 1L)).toDF("t", "e", "s")
    val r = EventAnalytics.cIndexPpm(perfect, "t", "e", "s",
        timeBuckets = 4, scoreBuckets = 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r == ((4L, 4L, 4L, 0L, Some(1000000L))), s"got $r")
    // identical scores: the comparable pair is a tie → exactly ½
    val tie = Seq((1L, 1L, 5L), (2L, 0L, 5L)).toDF("t", "e", "s")
    assert(EventAnalytics.cIndexPpm(tie, "t", "e", "s", 4, 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
      == ((2L, 1L, 0L, 1L, Some(500000L))))
    // inverted ranking: the event subject scored LOWER → c = 0
    val inv = Seq((1L, 1L, 1L), (2L, 0L, 10L)).toDF("t", "e", "s")
    assert(EventAnalytics.cIndexPpm(inv, "t", "e", "s", 4, 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
      == ((2L, 1L, 0L, 0L, Some(0L))))
    // one time bucket → no comparable pairs → NULL; no events → NULL
    val flat = Seq((5L, 1L, 1L), (5L, 0L, 10L)).toDF("t", "e", "s")
    assert(EventAnalytics.cIndexPpm(flat, "t", "e", "s", 4, 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head._5.isEmpty)
    val noEv = Seq((1L, 0L, 5L), (2L, 0L, 3L)).toDF("t", "e", "s")
    assert(EventAnalytics.cIndexPpm(noEv, "t", "e", "s", 4, 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head._5.isEmpty)
  }

  test("cIndexPpm: same-time-bucket pairs are not comparable (the bucketed contract)") {
    // t=10 and t=11 land in one bucket of 2 over [10, 13]; only the
    // pairs against t=13 count → comparable = 2 (both events vs the
    // late censored subject), concordant = 2
    val df = Seq((10L, 1L, 9L), (11L, 1L, 8L), (13L, 0L, 1L))
      .toDF("t", "e", "s")
    val r = EventAnalytics.cIndexPpm(df, "t", "e", "s",
        timeBuckets = 2, scoreBuckets = 4)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r == ((3L, 2L, 2L, 0L, Some(1000000L))), s"got $r")
  }
}
