package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Writer

class WriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "v")

  test("casUpdate applies only matching expectations; rejects audit the rest") {
    val b = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val u = Seq(
      (1L, 10L, 111L), // expectation correct → applied
      (2L, 99L, 222L), // stale expectation → no-op, rejected
      (9L, 0L, 999L)   // absent key → no-op, rejected
    ).toDF("id", "expected", "newv")
    val merged = Writer.casUpdate(b, u, Seq("id"), "v", "expected", "newv")
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 111L, 2L -> 20L, 3L -> 30L))
    val rejects = Writer.casRejects(b, u, Seq("id"), "v", "expected")
      .select("id").as[Long].collect().toSet
    assert(rejects == Set(2L, 9L)) // stale AND absent — nothing silent
  }

  test("cas: NULL expectation is a no-op in casUpdate AND surfaces as a reject") {
    // ADVICE r9: with a plain =!= the NULL-expectation row evaluates
    // to NULL in the reject filter and vanishes from BOTH outputs —
    // the one way to silently drop an update end-to-end
    val b = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val u = Seq((1L, Option.empty[Long], 111L), (2L, Some(20L), 222L))
      .toDF("id", "expected", "newv")
    val merged = Writer.casUpdate(b, u, Seq("id"), "v", "expected", "newv")
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 10L, 2L -> 222L)) // NULL expectation: no-op
    val rejects = Writer.casRejects(b, u, Seq("id"), "v", "expected")
      .select("id").as[Long].collect().toSet
    assert(rejects == Set(1L)) // …but LOUD: it lands in the audit
  }

  test("applyCdc: latest op per key wins — U→D deletes, D→U restores") {
    val changes = Seq(
      (1L, "a2", 11.0, "U", 1L), (1L, "a", 10.0, "D", 2L), // D last → gone
      (2L, "b", 20.0, "D", 1L), (2L, "b2", 22.0, "U", 2L), // U last → kept
      (3L, "c2", 33.0, "U", 1L), (3L, "c3", 34.0, "U", 2L), // latest U
      (4L, "d", 40.0, "I", 1L)) // fresh insert
      .toDF("id", "name", "v", "op", "seq")
    val got = graft.operators.Writer
      .applyCdc(base, changes, Seq("id"), "seq")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "b2", 22.0), (3L, "c3", 34.0), (4L, "d", 40.0)))
  }

  test("applyCdc: tied sequence numbers resolve deterministically") {
    // two U changes for key 1 share seq=1 — the winner must be a pure
    // function of the data (total desc order over remaining columns:
    // name "z" > "a"), identical on every run and partitioning
    val changes = Seq(
      (1L, "a", 10.0, "U", 1L), (1L, "z", 99.0, "U", 1L))
      .toDF("id", "name", "v", "op", "seq")
    (1 to 3).foreach { _ =>
      val got = graft.operators.Writer
        .applyCdc(base.repartition(5), changes.repartition(3), Seq("id"), "seq")
        .filter(col("id") === 1L).as[(Long, String, Double)].collect().toSeq
      assert(got == Seq((1L, "z", 99.0)))
    }
  }

  test("upsert: update wins, insert appends") {
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val got = Writer.upsert(base, updates, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("delete removes exactly the keyed rows") {
    val got = Writer.delete(base, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("deleteRange is [from, until)") {
    val got = Writer.deleteRange(base, "id", 1L, 3L)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(3L))
  }

  test("eliminate nulls the property only where predicate holds") {
    val got = Writer.eliminate(base, "name", col("v") < 25.0)
      .orderBy("id").select("name").collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, None, Some("c")))
  }

  test("ttl + liveAsOf filters expired rows") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("id", "created")
    val ttl = Writer.withTtl(df, "created", expr("INTERVAL 30 DAYS"))
    val live = Writer.liveAsOf(ttl, to_timestamp(lit("2024-02-01 00:00:00")))
      .select("id").as[Long].collect()
    assert(live.toSeq == Seq(2L))
  }

  test("uniqueViolations flags duplicate keys only") {
    val dup = base.unionByName(Seq((1L, "a2", 11.0)).toDF("id", "name", "v"))
    val got = Writer.uniqueViolations(dup, Seq("id")).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)))
    assert(Writer.uniqueViolations(base, Seq("id")).isEmpty)
  }

  test("applyCdc: unorderable map column in changes still plans (hash tiebreak)") {
    val b = Seq((1L, Map("k" -> 1))).toDF("id", "props")
    val changes = Seq((1L, Map("k" -> 2), "U", 1L), (2L, Map("k" -> 3), "I", 1L))
      .toDF("id", "props", "op", "seq")
    // a map column cannot join a SortOrder — the tiebreak must hash it
    // instead of throwing AnalysisException at plan time
    val got = Writer.applyCdc(b, changes, Seq("id"), "seq")
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("insertUnique: clean batch accepted, violating batch refused whole") {
    val clean = Seq((4L, "d", 40.0)).toDF("id", "name", "v")
    assert(Writer.insertUnique(base, clean, Seq("id")).count() == 4)
    // batch-vs-base collision
    val collide = Seq((2L, "B", 99.0)).toDF("id", "name", "v")
    val e1 = intercept[IllegalStateException] {
      Writer.insertUnique(base, collide, Seq("id")).count()
    }
    assert(e1.getMessage.contains("unique"))
    // in-batch duplicate with brand-new keys must also refuse
    val inBatch = Seq((7L, "x", 1.0), (7L, "y", 2.0)).toDF("id", "name", "v")
    intercept[IllegalStateException] {
      Writer.insertUnique(base, inBatch, Seq("id")).count()
    }
  }

  test("allocateIds is dense and deterministic by order column") {
    val got = Writer.allocateIds(base, Seq("name"), start = 5L)
      .select("alloc_id", "name").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((5L, "a"), (6L, "b"), (7L, "c")))
  }

  test("allocateIdsPartitioned matches the window path with no 1-partition sort") {
    val big = spark.range(0, 10000).select(
      (col("id") * 37 % 10007).as("key"), col("id").as("payload"))
    val viaWindow = Writer.allocateIds(big, Seq("key"), start = 42L)
      .select("alloc_id", "key").as[(Long, Long)].collect().sortBy(_._1)
    val part = Writer.allocateIdsPartitioned(big, Seq("key"), start = 42L,
      numPartitions = 8)
    // the allocation ran on 8 range partitions end-to-end — proof the
    // sort was parallel, not a single-partition window
    assert(part.rdd.getNumPartitions == 8)
    val viaPart = part.select("alloc_id", "key").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(viaPart.toSeq == viaWindow.toSeq)
    // dense, starting at 42
    assert(viaPart.head._1 == 42L && viaPart.last._1 == 42L + 9999L)
  }
}
