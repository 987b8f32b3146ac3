package graft

import org.apache.spark.sql.functions._

/** Properties of the distributed connected-components loop on shapes
  * the LSH pair data can't be relied on to produce: a long PATH (the
  * diameter worst case — label propagation needs diameter rounds, a
  * clique needs one) and multiple components with interleaved ids. */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.ops.LlmOps.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  test("path graph: every node converges to the path's smallest id") {
    // 0-1-2-...-12 as a chain: diameter 12 forces many propagation rounds
    val path = (0L until 12L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 13)
    assert(got.values.forall(_ == 0L))
  }

  test("two interleaved components + reversed edge direction") {
    // comp {1,3,5} chained high-to-low, comp {2,4} — min must win
    // regardless of edge orientation
    val got = cc(Seq((5L, 3L), (3L, 1L), (4L, 2L)))
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 2L -> 2L, 4L -> 2L))
  }

  test("on real LSH pairs, both endpoints of every pair share a cluster") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.ops.LlmOps.queries("q_minhash_dedup")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = graft.ops.LlmOps.queries("q_dedup_clusters")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => clusters(a) == clusters(b) })
    // canonical keeper: every cluster id is a member of its own cluster
    assert(clusters.values.toSet.forall(cid => clusters(cid) == cid))
  }

  /** Component-min labels via union-find — the sequential oracle. */
  private def ufOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(v => v -> find(v)).toMap
  }

  test("long path (diameter 200) far beyond the propagation cap") {
    // r3's propagation loop refused this shape (cap exhausted); the
    // large-star/small-star fallback must converge in O(log n) rounds
    val path = (0L until 200L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 201)
    assert(got.values.forall(_ == 0L))
  }

  test("scrambled-id long path: star fallback finds non-trivial minima") {
    // permute ids so the component min sits mid-path, not at an end —
    // catches any hidden assumption that labels flow from an endpoint
    val rnd = new scala.util.Random(11)
    val ids = rnd.shuffle((100L until 250L).toVector)
    val edges = ids.sliding(2).map { case Vector(a, b) => (a, b) }.toSeq
    val got = cc(edges)
    assert(got == ufOracle(edges))
  }

  test("random graphs match the union-find oracle") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(45)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(cc(edges) == ufOracle(edges))
    }
  }

  test("clique and bridge: merging two cliques through one edge") {
    val cliqueA = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val cliqueB = for (i <- 20L to 23L; j <- (i + 1) to 23L) yield (i, j)
    val got = cc(cliqueA ++ cliqueB ++ Seq((13L, 20L)))
    assert(got.values.toSet == Set(10L)) // one merged component
    assert(got.size == 8)
  }

  test("reliable-checkpoint mode (checkpoint dir set) matches local mode") {
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val path = (0L until 12L).map(i => (i, i + 1))
      val got = cc(path)
      assert(got.size == 13)
      assert(got.values.forall(_ == 0L))
      // the reliable path actually wrote checkpoint data
      val wrote = new java.io.File(ckptDir).listFiles()
      assert(wrote != null && wrote.nonEmpty,
        "checkpoint dir is empty — reliable mode was not exercised")
    } finally {
      // unset so other suites sharing the session stay on localCheckpoint
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}
