package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the r3 pipeline operators that the
  * value-hash oracle can't express: conservation (packing loses no
  * tokens), prefix/monotonicity (budget selection is a quality-order
  * prefix), partition-shape (strata sizes, SCD2 interval disjointness)
  * — the properties that must survive refactors. */
class PipelineInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sequence packing conserves tokens and numbers packs contiguously") {
    import spark.implicits._
    val packs = q("q_sequence_pack").collect()
    val perLang = packs.groupBy(_.getString(0))
    val corpusTokens = Tables(spark, sf, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == corpusTokens(lang),
        s"$lang: packing lost tokens")
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq,
        s"$lang: pack ids not contiguous")
    }
  }

  test("token budget selects a strictly increasing prefix under budget") {
    val sel = q("q_token_budget").collect().sortBy(_.getAs[Long]("sel_rank"))
    assert(sel.nonEmpty)
    assert(sel.head.getAs[Long]("sel_rank") == 1L)
    // ranks contiguous (a prefix of the quality order) and cum strictly grows
    sel.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("sel_rank") == a.getAs[Long]("sel_rank") + 1)
        assert(b.getAs[Long]("cum_toks") > a.getAs[Long]("cum_toks"))
      case _ =>
    }
    // every selected doc STARTED inside the budget
    assert(sel.forall(r =>
      r.getAs[Long]("cum_toks") - r.getAs[Long]("toks") < 20000L))
  }

  test("stratified sample takes min(5, stratum size) per language") {
    import spark.implicits._
    val got = q("q_stratified_sample").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val sizes = Tables(spark, sf, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == sizes.keySet)
    got.foreach { case (lang, n) =>
      assert(n == math.min(5L, sizes(lang)), s"$lang: got $n")
    }
  }

  test("SCD2 intervals are disjoint, ordered, one current per user") {
    val rows = q("q_scd2_intervals").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("seg_no"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each interval ends exactly where the next begins
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $uid: gap/overlap between segments")
        case _ =>
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1,
        s"user $uid: not exactly one open interval")
      assert(sorted.last.getAs[Long]("valid_to_us") == -1L)
    }
  }

  test("anomaly flags only |z| > 3 and tf-idf ranks are per-doc top-5") {
    assert(q("q_anomaly_zscore").collect()
      .forall(r => math.abs(r.getAs[Double]("z")) > 3.0))
    val tfidf = q("q_tfidf_topterms").collect()
    tfidf.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length))
      // weights nonincreasing in rank order
      val ws = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("tfidf"))
      ws.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("normalized dedup folds every perturbed copy onto its original") {
    val groups = q("q_dedup_normalized").collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(groups.length == nDocs, "one group per original document")
    groups.foreach { r =>
      assert(r.getAs[Long]("n_members") == 2L,
        s"group ${r.getAs[Long]("keep_doc_id")} did not pair up")
      assert(r.getAs[Long]("max_member") ==
        r.getAs[Long]("keep_doc_id") + 1000000L,
        "perturbed copy landed in the wrong group")
    }
  }

  test("doc chunks tile every token with the declared stride") {
    import spark.implicits._
    val n = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    q("q_doc_chunk").collect().groupBy(_.getAs[Long]("doc_id"))
      .foreach { case (doc, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
        assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
          (0L until sorted.length), s"doc $doc: chunk ids not contiguous")
        sorted.foreach { r =>
          val start = r.getAs[Long]("start_tok")
          assert(start == r.getAs[Long]("chunk_id") * 24 + 1)
          assert(start <= n(doc), s"doc $doc: chunk starts past the end")
          assert(r.getAs[Long]("n_chunk_tokens") ==
            math.min(32L, n(doc) - start + 1))
        }
        val last = sorted.last
        assert(last.getAs[Long]("start_tok") +
          last.getAs[Long]("n_chunk_tokens") - 1 == n(doc),
          s"doc $doc: tail tokens uncovered")
      }
  }

  test("containment dominates jaccard on the identical candidate set") {
    val jac = q("q_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val con = q("q_minhash_containment").collect()
    assert(con.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == jac.keySet, "candidate pair sets must be identical")
    con.foreach { r =>
      val ca = r.getAs[Double]("contain_a")
      val cb = r.getAs[Double]("contain_b")
      val j = jac((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      assert(ca > 0.0 && ca <= 1.0 && cb > 0.0 && cb <= 1.0)
      // |A∩B|/|A| >= |A∩B|/|A∪B| always (r6 on both sides is monotone)
      assert(ca >= j && cb >= j, s"containment below jaccard: $r vs $j")
    }
  }
}
