package graft

import org.apache.spark.sql.functions._
import graft.ops.MultimodalStub
import graft.ops.MultimodalStub.MediaIn

/** The multimodal decode stage's plumbing — schema, typed rows,
  * per-partition batch shape, determinism — independent of the stubbed
  * codec internals. */
class MultimodalStubSpec extends SparkSpec {

  test("binary payloads stream through the decode stage with stable schema and values") {
    import spark.implicits._
    val media = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))
      .as[(Long, Array[Byte], String)]
      .map { case (id, p, m) => MediaIn(id, p, m) }

    val out = MultimodalStub.decode(spark, media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("docId", "mime", "nBytes", "width", "height", "feature"))

    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.feature.length == 8)) // fixed-width features
    assert(rows.forall(r => r.width >= 64 && r.width < 128))
    assert(rows.forall(r => r.nBytes > 0))
    // deterministic: a second run produces identical features
    val again = MultimodalStub.decode(spark, media).collect()
    assert(rows.sortBy(_.docId).zip(again.sortBy(_.docId))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }
}
