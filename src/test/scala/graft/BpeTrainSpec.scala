package graft

import org.apache.spark.sql.functions._

/** The design claim behind q_bpe_pair_counts: one distributed corpus
  * pass collapses to the word-frequency vocabulary, and the BPE merge
  * LOOP then runs on that bounded vocab driver-side (how production
  * BPE trainers split the work). This spec runs that loop and checks
  * it against the query: the first merge the loop picks must be
  * exactly the query's top pair, and every merge strictly shrinks the
  * corpus-weighted symbol count (the whole point of a merge). */
class BpeTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private type Vocab = Map[Vector[String], Long]

  private def pairCounts(v: Vocab): Map[(String, String), Long] =
    v.toSeq.flatMap { case (w, f) =>
      w.zip(w.tail).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def bestPair(pc: Map[(String, String), Long]): (String, String) =
    pc.toSeq.minBy { case ((a, b), n) => (-n, a + b) }._1

  private def mergeWord(w: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i < w.length - 1 && w(i) == p._1 && w(i + 1) == p._2) {
        out += (w(i) + w(i + 1)); i += 2
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  test("driver-side merge loop agrees with the corpus-scale pair pass") {
    import spark.implicits._
    // the one corpus-scale pass: word -> frequency
    val wf = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect()
    var vocab: Vocab = wf.map { case (w, f) =>
      w.toVector.map(_.toString) -> f
    }.toMap
    assert(vocab.size < 100, "vocab must be bounded (plateau argument)")

    // merge 1 must equal the query's top-ranked pair
    val top = SparkEntry.queries("q_bpe_pair_counts")(spark, sf)
      .limit(1).as[(String, Long)].collect().head
    val pc0 = pairCounts(vocab)
    val first = bestPair(pc0)
    assert(first._1 + first._2 == top._1,
      s"loop picked $first, query top pair is ${top._1}")
    assert(pc0(first) == top._2, "weighted count disagrees with query")

    // five merges: corpus-weighted symbol count strictly decreases
    var symbols = vocab.map { case (w, f) => w.length * f }.sum
    (1 to 5).foreach { k =>
      val p = bestPair(pairCounts(vocab))
      vocab = vocab.toSeq.map { case (w, f) => mergeWord(w, p) -> f }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val now = vocab.map { case (w, f) => w.length * f }.sum
      assert(now < symbols, s"merge $k ($p) did not shrink the corpus")
      symbols = now
    }
  }
}
