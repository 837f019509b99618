package graft

import graft.io.ParquetTableStore
import graft.ops._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SkewAndPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic scalacheck sampling (scalatestplus isn't on the
    * offline classpath): n samples from seeded generator states. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("saltedAgg equals plain groupBy on a skewed distribution") {
    // 90% of rows share one key — the classic hot-key shape
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8, Seq(
        (sum($"v"), (c: org.apache.spark.sql.Column) => sum(c), "sum_v"),
        (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c), "cnt")))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, inner and left") {
    val big = (1 to 500).map(i => (i % 5, i.toLong)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (9, "z")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "name").collect()
        .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2)))).toSet
      val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 4, jt)
        .select("k", "v", "name").collect()
        .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(salted == plain, jt)
    }
  }

  test("topKeys surfaces the hot key first") {
    val df = ((1 to 100).map(_ => "hot") ++ Seq("cold1", "cold2")).toDF("k")
    val top = Skew.topKeys(df, Seq("k"), 1).as[(String, Long)].head()
    assert(top == ("hot", 100L))
  }

  // ------------------------------------------------------------------
  // ScalaCheck properties over the sync operators (SURVEY.md §5):
  // randomized source/target states, real engine, parquet store.
  // ------------------------------------------------------------------

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n   <- Gen.choose(0, 30)
    ids <- Gen.listOfN(n, Gen.choose(1L, 40L))
  } yield ids.distinct.map(i => (i, i * 7))

  test("property: append_notin converges target to source superset regardless of initial state") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach {
      case (init: List[(Long, Long)], extra: List[(Long, Long)]) =>
        val store = new ParquetTableStore(spark, tmpDir("prop"))
        val eng = new SyncEngine(store)
        val source = (init ++ extra).distinct.toDF("id", "v")
        if (init.nonEmpty)
          store.overwrite("db.t", init.toDF("id", "v"))
        val spec = TableSpec(SyncOp.AppendNotIn, "db", "t",
          syncByColumns = Some(Seq("id"))).validate()
        eng.appendNotIn(spec, source)
        val got = store.read("db.t").as[(Long, Long)].collect().toSet
        assert(got == (init ++ extra).distinct.toSet)
        // second run adds nothing
        val r2 = eng.appendNotIn(spec, source)
        assert(r2.rowsCopied == 0)
    }
  }

  test("property: append_bymax never duplicates and reaches max(source)") {
    samples(rowsGen, 8).filter(_.nonEmpty).foreach { rows =>
      {
        val store = new ParquetTableStore(spark, tmpDir("prop"))
        val eng = new SyncEngine(store)
        val source = rows.toDF("id", "v")
        val half = rows.sortBy(_._1).take(rows.size / 2)
        if (half.nonEmpty) store.overwrite("db.t", half.toDF("id", "v"))
        val spec = TableSpec(SyncOp.AppendByMax, "db", "t",
          syncByColumnMax = Some("id")).validate()
        eng.appendByMax(spec, source)
        val ids = store.read("db.t").select("id").as[Long].collect().toSeq
        assert(ids.distinct.size == ids.size)        // no dupes
        assert(ids.max == rows.map(_._1).max)        // watermark reached
    } }
  }

  // ------------------------------------------------------------------
  // Sequence property: arbitrary PROGRAMS of W1–W5 ops against one
  // table, checked against an executable Map model after EVERY step —
  // the reference's whole reason to exist is that these ops compose
  // over a long-lived target, so per-op properties alone under-test
  // the cross-op interactions (a bymax after an update, a notin after
  // a where-delete, ...).
  // ------------------------------------------------------------------

  private sealed trait OpG
  private case class RecreateG(rows: List[(Long, Long)]) extends OpG
  private case class AppendWhereG(rows: List[(Long, Long)], cut: Long) extends OpG
  private case class AppendByMaxG(rows: List[(Long, Long)]) extends OpG
  private case class AppendNotInG(rows: List[(Long, Long)]) extends OpG
  private case class UpdateG(upds: List[(Long, Long)]) extends OpG

  test("property: random W1-W5 op sequences keep target == model at every step (100 programs)") {
    // distinct ids per batch; duplicate TARGET ids cannot arise (see the
    // AppendWhere cut note), so a Map is a faithful model
    val rowsG: Gen[List[(Long, Long)]] = for {
      n   <- Gen.choose(0, 10)
      ids <- Gen.listOfN(n, Gen.choose(1L, 25L))
      vs  <- Gen.listOfN(n, Gen.choose(0L, 99L))
    } yield ids.distinct.zip(vs)
    val opG: Gen[OpG] = Gen.frequency(
      1 -> rowsG.map(RecreateG),
      // cut-on-id predicate: delete-then-insert covers exactly the ids
      // the source can re-insert, so target ids stay unique
      2 -> Gen.zip(rowsG, Gen.choose(1L, 25L)).map { case (r, c) => AppendWhereG(r, c) },
      2 -> rowsG.map(AppendByMaxG),
      2 -> rowsG.map(AppendNotInG),
      2 -> rowsG.map(UpdateG))
    val programG: Gen[List[OpG]] = for {
      first <- rowsG.map(RecreateG)   // update requires an existing target
      n     <- Gen.choose(2, 5)
      rest  <- Gen.listOfN(n, opG)
    } yield first :: rest

    samples(programG, 100).zipWithIndex.foreach { case (program, pi) =>
      val store = new ParquetTableStore(spark, tmpDir(s"seq$pi"))
      val eng = new SyncEngine(store)
      var model = Map.empty[Long, Long]
      program.zipWithIndex.foreach { case (op, si) =>
        op match {
          case RecreateG(rows) =>
            eng.recreate(TableSpec(SyncOp.Recreate, "db", "t").validate(),
              rows.toDF("id", "v"))
            model = rows.toMap
          case AppendWhereG(rows, cut) =>
            eng.appendWhere(TableSpec(SyncOp.AppendWhere, "db", "t",
              whereFilter = Some(s"id >= $cut")).validate(), rows.toDF("id", "v"))
            model = model.filter(_._1 < cut) ++ rows.filter(_._1 >= cut)
          case AppendByMaxG(rows) =>
            eng.appendByMax(TableSpec(SyncOp.AppendByMax, "db", "t",
              syncByColumnMax = Some("id")).validate(), rows.toDF("id", "v"))
            val wm = model.keys.maxOption
            model = model ++ rows.filter(r => wm.forall(r._1 > _))
          case AppendNotInG(rows) =>
            eng.appendNotIn(TableSpec(SyncOp.AppendNotIn, "db", "t",
              syncByColumns = Some(Seq("id"))).validate(), rows.toDF("id", "v"))
            model = model ++ rows.filterNot(r => model.contains(r._1))
          case UpdateG(upds) =>
            eng.update(TableSpec(SyncOp.Update, "db", "t",
              updateFields = Some(Seq("v"))).validate(),
              upds.toDF("id", "v"), pkColumns = Seq("id"))
            val u = upds.toMap
            model = model.map { case (id, v) => id -> u.getOrElse(id, v) }
        }
        val got = store.read("db.t").as[(Long, Long)].collect()
        assert(got.length == got.map(_._1).distinct.length,
          s"program $pi step $si ($op): duplicate target ids")
        assert(got.toMap == model,
          s"program $pi step $si ($op): target diverged from model")
      }
    }
  }

  test("property: update only mutates matched PKs and listed fields") {
    val updGen = for {
      n   <- Gen.choose(0, 10)
      ids <- Gen.listOfN(n, Gen.choose(1L, 50L))
    } yield ids.distinct
    samples(updGen, 8).foreach { updIds =>
      val store = new ParquetTableStore(spark, tmpDir("prop"))
      val eng = new SyncEngine(store)
      val target = (1L to 20L).map(i => (i, s"n$i", i * 10))
      store.overwrite("db.t", target.toDF("id", "name", "score"))
      val updates = updIds.map(i => (i, s"UPD$i", -1L)).toDF("id", "name", "score")
      val spec = TableSpec(SyncOp.Update, "db", "t",
        updateFields = Some(Seq("name"))).validate()
      eng.update(spec, updates, pkColumns = Seq("id"))
      val got = store.read("db.t").as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      (1L to 20L).foreach { i =>
        val (name, score) = got(i)
        assert(score == i * 10)                       // score never changes
        if (updIds.contains(i)) assert(name == s"UPD$i") else assert(name == s"n$i")
      }
    }
  }
}
