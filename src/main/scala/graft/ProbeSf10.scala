package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r9 sf10 probe (VERDICT r8 item 4): quantify how the candidate-
  * bounded dedup families scale when duplication density explodes.
  * The sf10 synthetic (scripts/make_sfN.py 100 ... documents,embeddings)
  * replicates every sf0.1 document 100× under fresh doc_ids, so every
  * LSH band bucket that held b docs at sf0.1 holds 100·b — and the
  * candidate-pair mass grows with collisions SQUARED, not corpus
  * size. The probe records, per family:
  *   - q_lsh_bucket_skew's PREDICTED pair mass (Σ C(bucket,2) from
  *     the bucket histogram — a grid-sized aggregation, cheap at any
  *     SF) and its wall time;
  *   - the ACTUAL materialized candidate-pair count where feasible
  *     (minhash band pairs, simhash band pairs) and its wall time;
  *   - the exact-dedup-first mitigation: distinct-text count and the
  *     minhash pair count over the deduplicated corpus — the
  *     pipeline-ordering lesson (q_quality_vs_dup / q_curation_
  *     pipeline) made quantitative: at 100× duplication the ONLY
  *     scalable order is exact-dedup → near-dedup, because the LSH
  *     join's cost is governed by the post-exact-dedup corpus.
  * Prints one JSON line; committed as PROBE_sf10_r9.json.
  * Usage: runMain graft.ProbeSf10 [sfDir] */
object ProbeSf10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // predictor: bucket histogram -> Sum C(b,2) per family
    val (minhashPred, tMinhashPred) = timed {
      graft.ops.LlmOps.lshBucketSkew(spark, dir)
        .agg(sum(col("n_cand_pairs"))).collect()(0).getLong(0)
    }
    // actual minhash candidate-pair frame (distinct pairs)
    val (minhashActual, tMinhashActual) = timed {
      graft.ops.LlmOps.minhashDedup(spark, dir).count()
    }
    // actual simhash byte-band candidate frame
    val (simhashActual, tSimhashActual) = timed {
      graft.ops.TextOps.simhashDedup(spark, dir).count()
    }
    // actual n-gram Jaccard band-candidate frame
    val (ngramActual, tNgramActual) = timed {
      graft.ops.TextOps.ngramJaccard(spark, dir).count()
    }
    // wedge mass Σ deg² over the candidate graph — the cost driver of
    // clustering_coeff / common_neighbors / triangle closure; at 100×
    // replication it explodes quadratically in replica-cluster size,
    // which is exactly why those ops are run AFTER exact dedup
    val (wedgeMass, tWedge) = timed {
      val pairs = graft.ops.LlmOps.minhashDedup(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      pairs.select(col("doc_a").as("n"))
        .unionAll(pairs.select(col("doc_b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
        .agg(sum(expr("cast(deg as decimal(38,0)) * deg")))
        .collect()(0).getDecimal(0).toBigInteger.toString
    }
    // mitigation: exact-dedup-first collapses the 100x replication,
    // then the LSH family runs at post-dedup (~sf0.1) cost
    val (distinctDocs, tExact) = timed {
      graft.Tables(spark, dir, "documents")
        .groupBy(sha2(col("text"), 256)).agg(count(lit(1)))
        .count()
    }
    val dedupedDir = s"$dir-deduped"
    val (_, tWrite) = timed {
      graft.Tables(spark, dir, "documents")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
        .where(col("rn") === 1).drop("rn")
        .write.mode("overwrite").parquet(s"$dedupedDir/documents.parquet")
    }
    val (minhashDeduped, tMinhashDeduped) = timed {
      graft.ops.LlmOps.minhashDedup(spark, dedupedDir).count()
    }
    val totalDocs = graft.Tables(spark, dir, "documents").count()

    println(
      s"""{"probe":"sf10","dir":"$dir","docs":$totalDocs,""" +
        s""""distinct_texts":$distinctDocs,""" +
        f""""lsh_bucket_skew_predicted_pairs":$minhashPred,"predict_sec":$tMinhashPred%.1f,""" +
        f""""minhash_candidate_pairs":$minhashActual,"minhash_sec":$tMinhashActual%.1f,""" +
        f""""simhash_candidate_pairs":$simhashActual,"simhash_sec":$tSimhashActual%.1f,""" +
        f""""ngram_candidate_pairs":$ngramActual,"ngram_sec":$tNgramActual%.1f,""" +
        f""""wedge_mass_sum_deg2":"$wedgeMass%s","wedge_probe_sec":$tWedge%.1f,""" +
        f""""exact_dedup_sec":$tExact%.1f,"dedup_write_sec":$tWrite%.1f,""" +
        f""""minhash_pairs_after_exact_dedup":$minhashDeduped,""" +
        f""""minhash_sec_after_exact_dedup":$tMinhashDeduped%.1f}""")
    spark.stop()
  }
}
