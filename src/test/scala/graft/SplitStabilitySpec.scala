package graft

import org.apache.spark.sql.functions._

/** The property that justifies hash-based splits over RNG sampling: a
  * document's split assignment is a pure function of its id — stable
  * under corpus growth, subsetting, reordering, and re-runs. A doc
  * that is 'test' today can never leak into 'train' when the corpus
  * doubles. */
class SplitStabilitySpec extends SparkSpec {

  private def splitOf(dir: String) = {
    import spark.implicits._
    // recompute the per-doc assignment exactly as q_train_test_split does
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (expr("cast(conv(substring(sha2(cast(doc_id as string), 256), 1, 15), 16, 10) as bigint)")
          % 100L).as("hb"))
      .withColumn("split",
        when(col("hb") < 90, "train").when(col("hb") < 95, "valid").otherwise("test"))
      .select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
  }

  test("split assignment is stable across corpus scales") {
    val small = splitOf("/root/testdata/sf0.001")
    val large = splitOf("/root/testdata/sf0.01")
    // every doc id present in both corpora keeps its assignment
    val common = small.keySet intersect large.keySet
    assert(common.nonEmpty)
    assert(common.forall(id => small(id) == large(id)))
  }

  test("split fractions land near 90/5/5") {
    val s = splitOf("/root/testdata/sf0.01")
    val n = s.size.toDouble
    val frac = s.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.90) < 0.05, frac.toString)
    assert(math.abs(frac.getOrElse("valid", 0.0) - 0.05) < 0.03, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.03, frac.toString)
  }
}
