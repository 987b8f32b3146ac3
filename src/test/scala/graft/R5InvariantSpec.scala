package graft

import org.apache.spark.sql.functions._

/** Cross-operator invariants of the r5 wave — properties the DuckDB
  * hash-match can't express because they relate DIFFERENT queries (or
  * a query to arithmetic it should satisfy), pinned so refactors
  * can't silently break the relationships.
  */
class R5InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("consensus pairs are a superset of every single detector's pairs") {
    val consensus = q("q_dedup_consensus")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lex = q("q_minhash_dedup").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = q("q_simhash_dedup").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = q("q_embedding_neardup").select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lex.subsetOf(consensus) && sim.subsetOf(consensus) &&
      emb.subsetOf(consensus))
    assert(consensus == (lex ++ sim ++ emb)) // and nothing invented
  }

  test("interval union: covered time never exceeds the span") {
    q("q_interval_union").collect().foreach { r =>
      val covered = r.getAs[Long]("covered_us")
      val span = r.getAs[Long]("span_us")
      assert(r.getAs[Long]("n_islands") >= 1)
      assert(covered > 0 && covered <= span)
      assert(r.getAs[Long]("coverage_ppm") == 1000000L * covered / span)
    }
  }

  test("sort boundaries: non-decreasing cuts, loads sum to one within truncation") {
    val rows = q("q_sort_boundaries").collect()
    assert(rows.map(_.getAs[Long]("range_id")).toSeq == (0L to 7L))
    val maxes = rows.map(_.getAs[Double]("range_max"))
    val mins = rows.map(_.getAs[Double]("range_min"))
    // ranges are value-ordered: each range's max ≤ the next range's min
    maxes.zip(mins.drop(1)).foreach { case (hi, nextLo) =>
      assert(hi <= nextLo, s"overlapping ranges: $hi > $nextLo")
    }
    val ppm = rows.map(_.getAs[Long]("load_ppm")).sum
    assert(ppm <= 1000000L && ppm > 1000000L - 8) // ≤1 ulp truncation each
  }

  test("transition probabilities complete each source state") {
    val rows = q("q_event_transitions").collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("cnt")).sum == g.head.getAs[Long]("src_total"))
      val ppm = g.map(_.getAs[Long]("prob_ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - g.length)
    }
  }

  test("decimation emits exactly a min and a max per bucket, ordered") {
    val rows = q("q_downsample_minmax").collect()
    rows.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket_hr")))
      .foreach { case (_, g) =>
        assert(g.map(_.getAs[String]("kind")).sorted.toSeq == Seq("max", "min"))
        val mn = g.find(_.getAs[String]("kind") == "min").get.getAs[Double]("value")
        val mx = g.find(_.getAs[String]("kind") == "max").get.getAs[Double]("value")
        assert(mn <= mx)
      }
  }
}
