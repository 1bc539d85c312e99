package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Degree-oriented triangle counting (q139's operator): known counts
  * on hand-built graphs, including the hub shape the orientation
  * exists for, and agreement with a brute-force triple join. */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def edges(es: (Long, Long)*) =
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  private def tri(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = Triangles.count(df).head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("K4 has 4 triangles; a path has 0; a triangle has 1") {
    assert(tri(edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 6L, 4L)))
    assert(tri(edges((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L)))
    assert(tri(edges((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 1L)))
  }

  test("hub-and-spoke: star has 0 triangles; star + one rim edge has 1") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(tri(edges(star: _*)) == ((20L, 19L, 0L)))
    assert(tri(edges(star :+ ((7L, 8L)): _*)) == ((20L, 20L, 1L)))
  }

  test("matches the brute-force triple join on a pseudo-random graph") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val got = tri(e)._3
    val rows = e.as[(Long, Long)].collect().toSet
    val nodes = rows.flatMap(t => Seq(t._1, t._2)).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if b > a; c <- nodes if c > b
      if rows((a, b)) && rows((b, c)) && rows((a, c))
    } yield 1).size
    assert(got == brute.toLong, s"oriented=$got brute=$brute")
  }
}
