package graft

import graft.ops.{EventOps, TextOps}

/** Invariants of the round-6 behavioral-analytics wave (attribution /
  * path trigrams / chi-square) beyond the DuckDB hash gate — model
  * conservation laws plus brute-force recomputation of the chi²
  * cells. */
class R6BehaviorSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("attribution models conserve purchases and revenue") {
    val rows = EventOps.attribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byModel = rows.groupBy(_._1)
    assert(byModel.keySet === Set("first", "last"))
    // both models attribute the SAME purchase set — totals must agree
    val totals = byModel.map { case (m, rs) => m -> (rs.map(_._3).sum, rs.map(_._4).sum) }
    assert(totals("first") === totals("last"))
    // purchase can never be a touch type (excluded by construction)
    assert(!rows.exists(_._2 == "purchase"))
  }

  test("path trigram shares are a bounded partition of all trigrams") {
    val rows = EventOps.pathTrigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 20 && rows.nonEmpty)
    // sorted by count desc then path
    assert(rows.map(_._2).sameElements(rows.map(_._2).sortBy(-_)))
    // every path is t1>t2>t3 over the 5 known types
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { case (p, _, share) =>
      assert(p.split(">").length === 3 && p.split(">").forall(types))
      assert(share >= 0 && share <= 1000000L)
    }
  }

  test("chi-square cells match a brute-force BigInt recomputation") {
    val got = TextOps.chi2Independence(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val grid = Tables(spark, sfDir, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = BigInt(grid.map(_._2).sum)
    val rTot = grid.groupBy(_._1._1).map { case (l, g) => l -> BigInt(g.map(_._2).sum) }
    val cTot = grid.groupBy(_._1._2).map { case (src, g) => src -> BigInt(g.map(_._2).sum) }
    got.foreach { case (lang, (nDocs, chi2)) =>
      assert(BigInt(nDocs) === rTot(lang))
      val want = grid.filter(_._1._1 == lang).map { case ((_, src), o) =>
        val d = BigInt(o) * n - rTot(lang) * cTot(src)
        d * d * 1000000 / (rTot(lang) * cTot(src) * n)
      }.sum
      assert(BigInt(chi2) === want, s"lang $lang chi2")
    }
  }
}
