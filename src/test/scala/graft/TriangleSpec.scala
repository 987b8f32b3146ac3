package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmOps

/** Pins the ordered-enumeration triangle census (LlmOps.triangleStats)
  * on hand-built graphs where the counts are checkable by eye — the
  * two-join u<v<w form is easy to get subtly wrong (each triangle
  * found 0 or 6 times instead of exactly once).
  */
class TriangleSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    LlmOps.triangleStats(edges.toDF("u", "v")).collect().head
  }

  test("K4 clique: 4 triangles, 12 wedges, full closure") {
    // complete graph on 4 nodes — every wedge closes
    val r = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12) // 4 nodes x C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4) // C(4,3)
    assert(r.getAs[Long]("closure_ppm") == 1000000L)
  }

  test("path graph: wedges but zero triangles") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_wedges") == 2) // centers 2 and 3
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("closure_ppm") == 0L)
  }

  test("triangle plus pendant: each triangle counted exactly once") {
    // 1-2-3 triangle with a pendant edge 3-4: wedges = 1+1+3 = 5
    val r = stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") == 1)
    assert(r.getAs[Long]("n_wedges") == 5)
    assert(r.getAs[Long]("closure_ppm") == 3000000L / 5)
  }

  test("empty graph divides by the guarded wedge count, not zero") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val r = LlmOps.triangleStats(empty).collect().head
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("closure_ppm") == 0L)
  }
}
