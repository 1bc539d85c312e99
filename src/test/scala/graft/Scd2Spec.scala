package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD Type-2 build + point-in-time join ([[graft.operators.Scd2]]):
  * interval construction, open versions, same-instant tiebreaks, and
  * pre-history facts — the cases a warehouse PIT join must get right. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val changelog = Seq(
    // (user, ts, change_id, attr)
    (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
    (1L, ts("2024-01-05 00:00:00"), 11L, "silver"),
    (1L, ts("2024-01-09 00:00:00"), 12L, "gold"),
    (2L, ts("2024-01-03 00:00:00"), 20L, "bronze"),
    // user 3: two changes at the SAME instant — event_id tiebreak; the
    // earlier change must become a zero-width version matching nothing
    (3L, ts("2024-01-02 00:00:00"), 30L, "bronze"),
    (3L, ts("2024-01-02 00:00:00"), 31L, "gold")
  ).toDF("user_id", "ts", "event_id", "tier")

  test("build: per-key chained intervals, open current version") {
    val v = Scd2.build(changelog, "user_id", "ts", "event_id")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "tier", "valid_from", "valid_to")
      .collect()
    assert(v.length == 6)
    // user 1: 3 chained versions, last open
    val u1 = v.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("bronze", "silver", "gold"))
    assert(u1(0).getTimestamp(3) == u1(1).getTimestamp(2), "v1 ends where v2 starts")
    assert(u1(2).isNullAt(3), "current version is open")
    // user 3: same-instant pair → first version zero-width
    val u3 = v.filter(_.getLong(0) == 3L)
    assert(u3(0).getTimestamp(2) == u3(0).getTimestamp(3), "tied change is zero-width")
    assert(u3(1).isNullAt(3))
  }

  test("pointInTime: exact boundaries, pre-history, zero-width skipped") {
    val dim = Scd2.build(changelog, "user_id", "ts", "event_id")
      .select("user_id", "tier", "valid_from", "valid_to")
    val facts = Seq(
      (1L, ts("2023-12-25 00:00:00")), // before any version → null tier
      (1L, ts("2024-01-01 00:00:00")), // exactly at v1 start → bronze
      (1L, ts("2024-01-05 00:00:00")), // exactly at v2 start → silver, NOT bronze
      (1L, ts("2024-01-08 23:59:59")), // just before v3 → silver
      (1L, ts("2024-06-01 00:00:00")), // far future → open version gold
      (3L, ts("2024-01-02 00:00:00")), // at the tied instant → gold (winner)
      (4L, ts("2024-01-02 00:00:00"))  // unknown key → null tier
    ).toDF("user_id", "fts")
    val pit = Scd2.pointInTime(facts, dim, "user_id", facts("fts"))
      .orderBy("user_id", "fts")
      .select("user_id", "fts", "tier")
      .collect()
    assert(pit.length == facts.count(), "PIT join is cardinality-preserving")
    val tiers = pit.map(r => if (r.isNullAt(2)) null else r.getString(2)).toSeq
    assert(tiers == Seq(null, "bronze", "silver", "silver", "gold", "gold", null))
  }

  test("pointInTime matches exactly one version per in-history fact") {
    // every fact inside a key's history must match exactly once however
    // many versions exist — the left join must never duplicate facts
    val dim = Scd2.build(changelog, "user_id", "ts", "event_id")
      .select("user_id", "tier", "valid_from", "valid_to")
    val facts = spark.range(100).select(
      lit(1L).as("user_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, CAST(id * 3 AS INT), 0, 0)").as("fts"))
    val n = Scd2.pointInTime(facts, dim, "user_id", facts("fts")).count()
    assert(n == 100L)
  }
}
