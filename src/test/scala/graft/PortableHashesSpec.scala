package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHashes

/** Codegen-path parity for PortableHashes on a real session: the
  * native expression must equal the SQL conv/substring/sha2 transform
  * it replaces, element for element, including null elements, empty
  * arrays, and the folded modulus. */
class PortableHashesSpec extends SparkSpec {

  private val ph =
    "cast(conv(substring(sha2(x, 256), 1, 15), 16, 10) as bigint)"

  test("native hashes equal the SQL form, raw and with modulus") {
    import spark.implicits._
    val df = Seq(
      Seq("alpha", "beta", "gamma delta", ""),
      Seq("é", "日本", "€uro", "line\nbreak"),
      Seq.empty[String],
      Seq("repeated", "repeated")
    ).toDF("arr")
    val got = df.select(
      PortableHashes.hashes(col("arr")).as("raw"),
      PortableHashes.hashes(col("arr"), 2147483647L).as("modded"),
      expr(s"transform(arr, x -> $ph)").as("sql_raw"),
      expr(s"transform(arr, x -> $ph % 2147483647)").as("sql_modded"))
    got.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2), "raw mismatch")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3), "modded mismatch")
    }
  }

  test("null elements pass through as nulls") {
    val df = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS arr")
    val r = df.select(PortableHashes.hashes(col("arr")).as("h"))
      .collect().head.getSeq[Any](0)
    assert(r(0) != null && r(1) == null && r(2) != null)
  }
}
