package graft

import org.apache.spark.sql.functions._

import graft.operators.{MerkleDiff, Splits}

/** Merkle range digests (q146's operator): identical snapshots are
  * digest-identical, a one-row edit flips exactly its own leaf, and
  * digests are order/partitioning-insensitive. */
class MerkleDiffSpec extends SparkSuite {
  import spark.implicits._

  private val snap = (1L to 300L).map(i => (i, s"content of row $i"))
    .toDF("id", "text")
  private val leaves = 16

  test("identical snapshots: no leaf differs; digests partition-invariant") {
    val d = MerkleDiff.diffLeaves(snap, snap.repartition(7), "id", Seq("text"), leaves)
    assert(d.filter(col("differs")).count() == 0)
    val a = MerkleDiff.leafDigests(snap, "id", Seq("text"), leaves)
      .orderBy("leaf").collect().toSeq
    val b = MerkleDiff.leafDigests(snap.orderBy(rand(42)).repartition(11),
      "id", Seq("text"), leaves).orderBy("leaf").collect().toSeq
    assert(a == b)
  }

  test("a one-row edit flips exactly its own leaf; a removal flips its count") {
    val edited = snap.withColumn("text",
      when(col("id") === 123L, lit("EDITED")).otherwise(col("text")))
    val d = MerkleDiff.diffLeaves(snap, edited, "id", Seq("text"), leaves)
      .filter(col("differs")).collect()
    val expectLeaf = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("123".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(4), 16) % leaves
    }
    assert(d.length == 1 && d.head.getInt(0) == expectLeaf,
      d.map(_.toString).mkString(","))
    // count equal (edit, not removal), digest differs
    assert(d.head.getLong(1) == d.head.getLong(2))
    val removed = snap.filter(col("id") =!= 123L)
    val dr = MerkleDiff.diffLeaves(snap, removed, "id", Seq("text"), leaves)
      .filter(col("differs")).collect()
    assert(dr.length == 1 && dr.head.getLong(1) == dr.head.getLong(2) + 1)
  }

  test("null content is DISTINGUISHED from empty string (and each is stable)") {
    val withNull = snap.withColumn("text",
      when(col("id") === 7L, lit(null).cast("string")).otherwise(col("text")))
    val asEmpty = snap.withColumn("text",
      when(col("id") === 7L, lit("")).otherwise(col("text")))
    // a NULL↔'' flip is a REAL change: exactly id=7's leaf must differ
    val d = MerkleDiff.diffLeaves(withNull, asEmpty, "id", Seq("text"), leaves)
    assert(d.filter(col("differs")).count() == 1)
    // while each encoding on its own digests stably across repartitions
    val same = MerkleDiff.diffLeaves(withNull,
      withNull.orderBy(rand(7)).repartition(5), "id", Seq("text"), leaves)
    assert(same.filter(col("differs")).count() == 0)
  }
}
