package graft

import graft.ops.RelationalOps

/** Bloom-sketch semi-join invariants (q_bloom_semi_join has no SQL
  * oracle — the candidate count is implementation-specific): no false
  * negatives (candidates ⊇ true matches) and a sane false-positive
  * rate at the configured sizing. */
class BloomJoinSpec extends SparkSpec {

  test("bloom candidates are a superset of true matches with bounded false positives") {
    val r = RelationalOps.bloomSemiJoin(spark, "/root/testdata/sf0.001").head()
    val (cand, truth) = (r.getLong(0), r.getLong(1))
    assert(truth > 0, "fixture should produce matches")
    assert(cand >= truth, s"bloom dropped true matches: $cand < $truth")
    // 65536 bits for ~<=2000 keys: FPR well under 10% of the probe side
    val probeRows = Tables(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert(cand - truth <= probeRows / 10,
      s"false positives ${cand - truth} exceed 10% of $probeRows")
  }
}
