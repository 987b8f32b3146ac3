package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** MERGE INTO semantics pinned against the base table: deletes leave
  * the snapshot, inserts arrive under the shifted key space, updates
  * change the content hash, and untouched rows keep theirs.
  */
class MergeUpsertSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val snapshot =
    RelationalOps.mergeUpsert(spark, sf).collect()
  private lazy val base = Tables(spark, sf, "documents")
    .select(col("doc_id"),
      expr("cast(conv(substring(sha2(text, 256), 1, 15), 16, 10) as bigint)")
        .as("base_h"))
    .collect()
    .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("base_h")).toMap

  test("deleted keys (doc_id % 7 = 1) are absent from the snapshot") {
    val present = snapshot.map(_.getAs[Long]("doc_id")).toSet
    val deleted = base.keys.filter(_ % 7 == 1)
    assert(deleted.nonEmpty && deleted.forall(id => !present.contains(id)))
  }

  test("inserts land in the shifted key space, one per source row") {
    val inserts = snapshot.filter(_.getAs[String]("op") == "insert")
    assert(inserts.nonEmpty)
    assert(inserts.forall(_.getAs[Long]("doc_id") >= 10000000L))
    assert(inserts.length == base.keys.count(_ % 7 == 2))
  }

  test("updates rewrite the content hash; keeps preserve it") {
    snapshot.filter(r => base.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val same = r.getAs[Long]("content_h") == base(id)
      r.getAs[String]("op") match {
        case "update" => assert(!same, s"update $id kept its old content")
        case "keep"   => assert(same, s"keep $id changed content")
        case op       => fail(s"unexpected op $op for base key $id")
      }
    }
  }
}
