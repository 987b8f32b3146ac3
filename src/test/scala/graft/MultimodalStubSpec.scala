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

  test("resize is 1-to-1, hits target dims, and scales features") {
    import spark.implicits._
    val media = Seq(MediaIn(1L, Array[Byte](10, 20, 30, 40), "image/x"),
      MediaIn(2L, Array[Byte](1), "image/x")).toDS()
    val decoded = MultimodalStub.decode(spark, media)
    val resized = MultimodalStub.resize(spark, decoded, 224, 224).collect()
    assert(resized.length == 2)
    assert(resized.forall(r => r.width == 224 && r.height == 224))
    assert(resized.forall(_.feature.length == 8)) // width preserved
  }

  test("frame sampling explodes rows by stride and keys frames to the source timeline") {
    import spark.implicits._
    // 64-byte payload → 4 stub frames; stride 2 → frames 0 and 2
    val media = Seq(MediaIn(7L, Array.tabulate(64)(_.toByte), "video/x")).toDS()
    val frames = MultimodalStub.frameSample(spark, media, everyN = 2).collect()
    assert(frames.map(_.frameIdx).sorted.toSeq == Seq(0, 2))
    assert(frames.forall(_.docId == 7L))
    assert(frames.forall(_.feature.length == 8))
    // stride 1 yields every frame
    val all = MultimodalStub.frameSample(spark, media, everyN = 1).collect()
    assert(all.map(_.frameIdx).sorted.toSeq == Seq(0, 1, 2, 3))
  }
}
