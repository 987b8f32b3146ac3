package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-harness output contract: the correctness gate sorts and
  * hashes every final projection with pandas, which cannot sort
  * array/map/struct cells (r2 lost q_approx_percentile and
  * q_scalar_map to `TypeError: unhashable type: numpy.ndarray`).
  * Every `SparkEntry.queries` result schema must therefore be
  * atomic-only. Schema inspection is lazy — no job runs — so the
  * whole surface checks in seconds.
  */
class OutputContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every SparkEntry.queries output schema is atomic-only") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"non-atomic columns in final projections:\n${offenders.mkString("\n")}")
  }
}
