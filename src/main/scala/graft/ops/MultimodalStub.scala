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

  /** One sampled frame of a (video-like) payload. frameIdx is the
    * source frame number, so downstream joins stay keyed to the
    * original timeline even after sampling. */
  case class Frame(docId: Long, frameIdx: Int, width: Int, height: Int,
                   feature: Array[Float])

  /** Resize stage: 1-to-1 over decoded features. STUB scales the
    * recorded dimensions and renormalizes the feature vector; a real
    * build calls the resampler here. Pure map — fuses into the decode
    * stage's partition pass, no extra shuffle, no extra pass over the
    * payload bytes. */
  def resize(spark: SparkSession, decoded: Dataset[MediaFeatures],
             targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    decoded.map { f =>
      val sx = targetW.toFloat / math.max(f.width, 1)
      val sy = targetH.toFloat / math.max(f.height, 1)
      f.copy(width = targetW, height = targetH,
        feature = f.feature.map(v => v * sx * sy))
    }
  }

  /** Frame sampling: 1-to-many row explosion (every `everyN`-th frame,
    * frame count stubbed from payload size). The plumbing that matters
    * at scale: the output is a lazily-consumed Iterator per input row —
    * a 2-hour video expands to thousands of frame rows WITHOUT ever
    * materializing them in executor memory at once, and the expansion
    * happens post-scan so the parquet reader still sees one row. */
  def frameSample(spark: SparkSession, media: Dataset[MediaIn],
                  everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyN > 0, "everyN must be positive")
    media.flatMap { m =>
      val nFrames = math.max(1, m.payload.length / 16) // STUB: container parse
      Iterator.range(0, nFrames, everyN).map { idx =>
        // STUB per-frame decode: a real build seeks + decodes frame idx
        val b = if (m.payload.isEmpty) 0 else m.payload(idx % m.payload.length).toInt
        Frame(m.docId, idx, 64 + math.abs(b) % 64, 64,
          Array.tabulate(8)(i => ((b + i) % 128) / 128.0f))
      }
    }
  }
}
