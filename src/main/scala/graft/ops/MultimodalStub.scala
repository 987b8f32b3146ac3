package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Media decode plumbing for opaque binary columns (north-star
  * multimodal requirement). The Spark-side shape is real: typed rows
  * in, per-partition handle initialization, typed feature rows out —
  * only the codec call is a deterministic STUB, because no image/audio
  * library ships in this environment. A production deployment swaps
  * `decodeOne` for a JNI/ffmpeg/turbojpeg call (initialized once per
  * partition, exactly where the comment marks) without touching any
  * schema, partitioning, or caller code.
  *
  * This is the one deliberate use of the typed mapPartitions escape
  * hatch in the codebase (SURVEY's preference order (d)): decoding
  * bytes is genuinely inexpressible as a column expression.
  */
object MultimodalStub {

  /** Input: an opaque payload + its typed metadata. */
  case class MediaIn(docId: Long, payload: Array[Byte], mime: String)

  /** Output: decoded dimensions + a fixed-width feature vector —
    * the schema an embedding stage consumes. */
  case class MediaFeatures(
      docId: Long, mime: String, nBytes: Long,
      width: Int, height: Int, feature: Array[Float])

  /** STUB decoder: deterministic pseudo-decode of the byte payload.
    * Real implementation: decode image/audio, extract true dimensions
    * and a model feature vector. */
  private def decodeOne(m: MediaIn): MediaFeatures = {
    val n = m.payload.length
    val width = 64 + (if (n == 0) 0 else math.abs(m.payload(0).toInt) % 64)
    val height = 64 + (if (n < 2) 0 else math.abs(m.payload(1).toInt) % 64)
    val feature = Array.tabulate(8) { i =>
      if (n == 0) 0.0f
      else m.payload(i % n).toFloat / 128.0f
    }
    MediaFeatures(m.docId, m.mime, n.toLong, width, height, feature)
  }

  /** The decode stage: one codec handle per partition, streamed rows —
    * the batch shape a vectorized decoder needs (no per-row handle
    * setup, no driver-side collect). */
  def decode(spark: SparkSession, media: Dataset[MediaIn]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // REAL CODEC INIT GOES HERE (once per partition / task):
      //   val codec = NativeDecoder.open(...)
      // it.map(m => codec.decode(m)) ... codec.close() via
      // TaskContext.addTaskCompletionListener in a real build.
      it.map(decodeOne)
    }
  }
}
