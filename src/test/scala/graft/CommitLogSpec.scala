package graft

import graft.ops.CommitLog
import org.apache.spark.sql.functions._

/** ops/CommitLog — versioned-table reconstruction from an add/remove
  * action log, against hand-written histories. */
class CommitLogSpec extends SparkTestBase {
  import spark.implicits._

  // (key, version, op, payload)
  private val log = Seq(
    (1L, 1L, "add", "a1"), (1L, 5L, "add", "a2"),      // updated at v5
    (2L, 2L, "add", "b1"), (2L, 6L, "remove", ""),     // deleted at v6
    (3L, 7L, "add", "c1"),                             // born at v7
    (4L, 3L, "add", "d1"), (4L, 8L, "remove", ""),
    (4L, 9L, "add", "d2"),                             // resurrected at v9
    (5L, 4L, "remove", "")                             // removed before ever added
  ).toDF("k", "v", "op", "p")

  private def snap(v: Long) =
    CommitLog.snapshotAt(log, "k", "v", "op", v, Seq("p"))
      .as[(Long, Long, String)].collect().toSet

  test("snapshotAt replays history version by version") {
    assert(snap(0L) == Set.empty)
    assert(snap(1L) == Set((1L, 1L, "a1")))
    assert(snap(4L) == Set((1L, 1L, "a1"), (2L, 2L, "b1"), (4L, 3L, "d1")))
    // v5: key 1 updated in place
    assert(snap(5L).contains((1L, 5L, "a2")))
    // v6: key 2 gone; v8: key 4 gone; v9: key 4 back with new payload
    assert(!snap(6L).exists(_._1 == 2L))
    assert(!snap(8L).exists(_._1 == 4L))
    assert(snap(9L) == Set((1L, 5L, "a2"), (3L, 7L, "c1"), (4L, 9L, "d2")))
    // a remove with no prior add never materializes anything
    assert(!snap(9L).exists(_._1 == 5L))
  }

  test("equal-version add+remove of one key reads as deleted") {
    val tie = Seq((9L, 1L, "add", "x"), (9L, 1L, "remove", ""))
      .toDF("k", "v", "op", "p")
    assert(CommitLog.snapshotAt(tie, "k", "v", "op", 1L, Seq("p")).count() == 0)
  }

  test("versionDiff reports added/removed/changed, omits unchanged") {
    val got = CommitLog.versionDiff(log, "k", "v", "op", 4L, 9L, Seq("p"))
      .as[(Long, String)].collect().toSet
    // 1: payload a1→a2 changed; 2: removed; 3: added; 4: d1→d2 changed
    assert(got == Set((1L, "changed"), (2L, "removed"),
      (3L, "added"), (4L, "changed")))
    // identical versions diff to nothing
    assert(CommitLog.versionDiff(log, "k", "v", "op", 9L, 9L, Seq("p"))
      .count() == 0)
    intercept[IllegalArgumentException] {
      CommitLog.versionDiff(log, "k", "v", "op", 9L, 4L, Seq("p"))
    }
  }

  test("snapshot is partition-independent") {
    val a = snap(9L)
    val b = CommitLog.snapshotAt(log.repartition(7), "k", "v", "op", 9L,
      Seq("p")).as[(Long, Long, String)].collect().toSet
    assert(a == b)
  }
}
