package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.RoaringBitmap

/** Deletion-vector support for [[DeltaRead]] — the reader-version-3
  * feature that lets a Delta writer delete ROWS without rewriting
  * files: an `add` action carries a descriptor pointing at a bitmap of
  * 0-based row indexes that are DELETED from that parquet file, and a
  * conformant reader must drop exactly those rows (PROTOCOL.md
  * "Deletion Vectors" / "Deletion Vector Descriptor Schema" /
  * "Deletion Vector Format"). Implemented, like the rest of the Delta
  * interop, from the published protocol alone:
  *
  *   - the bitmap is the spec's `RoaringBitmapArray` in its "portable"
  *     serialization: a 4-byte little-endian magic (1681511377), an
  *     8-byte little-endian bitmap count, then that many consecutive
  *     32-bit roaring bitmaps in the OFFICIAL RoaringFormatSpec
  *     portable format, indexed densely by the high 32 bits of the
  *     64-bit row index (low 32 bits live inside the indexed bitmap).
  *     The per-bitmap bytes go through `org.roaringbitmap` — the
  *     reference implementation of that format, already on Spark's own
  *     classpath (task-metrics dependency) — so array, bitmap AND run
  *     containers round-trip exactly;
  *   - on disk a DV file is `[1-byte format version = 1]` followed by
  *     one or more vectors, each stored as `[4-byte big-endian size]
  *     [bitmap bytes][4-byte big-endian CRC-32 of the bitmap bytes]`
  *     with the descriptor's `offset` pointing at the size word;
  *     size, checksum, magic and cardinality are all VERIFIED on load
  *     — a torn or swapped DV refuses loudly instead of resurrecting
  *     or over-deleting rows;
  *   - descriptors come in three storage flavors: `u` (file under the
  *     table root at `<prefix>/deletion_vector_<uuid>.bin`, the UUID
  *     carried as the last 20 chars of `pathOrInlineDv` in ZeroMQ's
  *     Z85 base-85 encoding), `p` (absolute path), and `i` (the bitmap
  *     bytes themselves, Z85-inlined in the action).
  *
  * Read integration (see [[DeltaRead.plan]]): files with a DV are
  * scanned WITH Spark's parquet metadata columns and filtered by the
  * codegen'd [[DvDeleted]] expression on
  * (`_metadata.file_path`, `_metadata.row_index`) — the row-position
  * mechanism Spark grows exactly for this purpose, so the scan stays
  * one whole-stage-codegen'd parquet read with every other predicate
  * still pushed down.
  *
  * 100 TB shape: what ships with the plan is the manifest-scale
  * [[DvLookup]] (one descriptor per DELETED-FROM file — paths and ~4
  * small fields, the same arithmetic as the log fold itself); bitmap
  * BYTES are loaded lazily on the executor, each task touching only
  * the vectors of files it actually scans, memoized per JVM for the
  * plan's lifetime. Like the rest of the module this targets a shared
  * POSIX filesystem (paths resolve through java.nio exactly as
  * [[DeltaRead.resolvePath]] does).
  */
object DeltaDv {

  /** `deletionVector` descriptor as carried by add/remove actions
    * (PROTOCOL.md "Deletion Vector Descriptor Schema"). `offset` is
    * absent for inline vectors; for stored ones an absent offset means
    * the vector starts right after the 1-byte file header. */
  case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                          offset: Option[Long], sizeInBytes: Int,
                          cardinality: Long) {
    /** The spec's unique identifier of a deletion vector — together
      * with `add.path` it forms the primary key of a logical file in
      * log reconciliation. */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.map("@" + _).getOrElse("")
  }

  /** Parse a descriptor out of a JSON action's `deletionVector` field
    * (absent/null → None). */
  def descriptor(v: Any): Option[DvDescriptor] = v match {
    case m: Map[_, _] =>
      val j = m.asInstanceOf[Map[String, Any]]
      Some(DvDescriptor(
        graft.util.Json.str(j, "storageType")
          .getOrElse(sys.error(s"deletionVector without storageType: $j")),
        graft.util.Json.str(j, "pathOrInlineDv")
          .getOrElse(sys.error(s"deletionVector without pathOrInlineDv: $j")),
        graft.util.Json.long(j, "offset"),
        graft.util.Json.long(j, "sizeInBytes")
          .getOrElse(sys.error(s"deletionVector without sizeInBytes: $j")).toInt,
        graft.util.Json.long(j, "cardinality")
          .getOrElse(sys.error(s"deletionVector without cardinality: $j"))))
    case null => None
    case other => sys.error(s"deletionVector is not an object: $other")
  }

  // ------------------------------------------------------------- Z85

  /** ZeroMQ Z85 alphabet (the published spec 32/Z85 — also what Delta
    * uses for UUIDs and inline vectors). */
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode, zero-padding the input to a multiple of 4 bytes (the
    * decoder recovers the true length from the descriptor's
    * sizeInBytes, as Delta's own codec does). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte]((4 - bytes.length % 4) % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.result()
  }

  /** Decode a Z85 string into exactly `outLen` bytes (refusing strings
    * that are not whole 5-char groups or carry non-alphabet chars). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 string length ${s.length} is not a multiple of 5")
    require(outLen <= s.length / 5 * 4,
      s"Z85 string of ${s.length} chars cannot hold $outLen bytes")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"character '$c' is not in the Z85 alphabet")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    java.util.Arrays.copyOf(out, outLen)
  }

  /** The 20-char Z85 form of a UUID's 16 big-endian bytes — the tail
    * of every `u`-flavor pathOrInlineDv. */
  def z85Uuid(u: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  private def uuidFromZ85(s: String): UUID = {
    val b = ByteBuffer.wrap(z85Decode(s, 16))
    new UUID(b.getLong, b.getLong)
  }

  // ------------------------------------------------------ file layout

  /** Filesystem path of a stored deletion vector. `u` splits
    * pathOrInlineDv into `<prefix><20-char Z85 uuid>` and resolves
    * `<root>/<prefix>/deletion_vector_<uuid>.bin`; `p` is an absolute
    * path (percent-decoded by the same pure decoder as add.path). */
  def dvPath(root: String, d: DvDescriptor): Path = d.storageType match {
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"u-flavor pathOrInlineDv '${d.pathOrInlineDv}' is shorter than a Z85 uuid")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val uuid = uuidFromZ85(d.pathOrInlineDv.takeRight(20))
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) Paths.get(root, name)
      else Paths.get(root, prefix, name)
    case "p" => Paths.get(DeltaRead.percentDecode(d.pathOrInlineDv))
    case other => sys.error(s"deletion vector storageType '$other' has no path")
  }

  /** Load and VERIFY one deletion vector: inline bytes are Z85-decoded
    * in place; stored ones are read at `offset` (default: right after
    * the version byte) with the size word, CRC-32 and the descriptor's
    * sizeInBytes/cardinality all checked — any mismatch refuses
    * loudly rather than mis-deleting rows. */
  def load(root: String, d: DvDescriptor): RoaringBitmapArray = {
    val data = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val p = dvPath(root, d)
        require(Files.isRegularFile(p), s"deletion vector file missing: $p")
        val all = Files.readAllBytes(p)
        require(all.nonEmpty && all(0) == 1,
          s"deletion vector file $p has format version ${if (all.isEmpty) "<empty>" else all(0)}; " +
            "this reader implements version 1")
        val off = d.offset.getOrElse(1L).toInt
        require(off + 4 <= all.length,
          s"deletion vector offset $off out of bounds in $p (${all.length} bytes)")
        val bb = ByteBuffer.wrap(all, off, all.length - off)
        val size = bb.getInt // big-endian framing per the spec
        require(size == d.sizeInBytes,
          s"deletion vector at $p@$off declares $size bytes, descriptor says " +
            s"${d.sizeInBytes} — refusing a torn or mis-addressed vector")
        require(off + 4 + size + 4 <= all.length,
          s"deletion vector at $p@$off runs past end of file")
        val out = new Array[Byte](size)
        bb.get(out)
        val crc = new CRC32
        crc.update(out)
        val want = bb.getInt
        require(crc.getValue.toInt == want,
          s"deletion vector at $p@$off fails its CRC-32 check — refusing")
        out
      case other =>
        sys.error(s"deletion vector storageType '$other' is not in the spec " +
          "(u/i/p) — refusing")
    }
    val bm = RoaringBitmapArray.deserialize(data)
    require(bm.cardinality == d.cardinality,
      s"deletion vector cardinality ${bm.cardinality} != descriptor's " +
        s"${d.cardinality} — refusing a vector/descriptor mismatch")
    bm
  }

  /** Write `vectors` into ONE on-disk DV file under
    * `<root>/<prefix>/deletion_vector_<uuid>.bin`, returning a
    * `u`-flavor descriptor per vector (offsets assigned sequentially)
    * — the building block fixture authorship and a future DV-emitting
    * writer share. */
  def writeFile(root: String, prefix: String,
                vectors: Seq[RoaringBitmapArray]): Seq[DvDescriptor] = {
    val uuid = UUID.randomUUID()
    val name = s"deletion_vector_$uuid.bin"
    val p = if (prefix.isEmpty) Paths.get(root, name)
            else Paths.get(root, prefix, name)
    Files.createDirectories(p.getParent)
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // format version
    val descs = vectors.map { v =>
      val data = v.serialize()
      val off = out.size().toLong
      val head = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(head)
      out.write(data)
      val crc = new CRC32
      crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      DvDescriptor("u", prefix + z85Uuid(uuid), Some(off), data.length,
        v.cardinality)
    }
    Files.write(p, out.toByteArray)
    descs
  }

  /** An `i`-flavor (inline) descriptor carrying `v` itself. */
  def inlineDescriptor(v: RoaringBitmapArray): DvDescriptor = {
    val data = v.serialize()
    DvDescriptor("i", z85Encode(data), None, data.length, v.cardinality)
  }
}

/** The spec's 64-bit deletion bitmap: a dense array of 32-bit roaring
  * bitmaps indexed by the high 32 bits of the row index (PROTOCOL.md
  * "Deletion Vector Format"). Mutation is append-oriented (fixture and
  * writer construction); membership is the read-path hot call. */
final class RoaringBitmapArray private (
    private val bitmaps: ArrayBuffer[RoaringBitmap]) {

  def add(v: Long): Unit = {
    require(v >= 0, s"row index $v is negative")
    val hi = (v >>> 32).toInt
    require(hi >= 0 && hi < (1 << 24),
      s"row index $v exceeds the dense-array bound") // 2^56 rows/file: absurd
    while (bitmaps.length <= hi) bitmaps += new RoaringBitmap()
    bitmaps(hi).add(v.toInt)
  }

  def contains(v: Long): Boolean = {
    if (v < 0) return false
    val hi = (v >>> 32).toInt
    hi < bitmaps.length && bitmaps(hi).contains(v.toInt)
  }

  def cardinality: Long = bitmaps.iterator.map(_.getLongCardinality).sum

  /** All members, ascending (tests / diagnostics — never the row hot
    * path). */
  def toSeq: Seq[Long] = bitmaps.iterator.zipWithIndex.flatMap {
    case (bm, hi) =>
      bm.toArray.iterator.map(lo => (hi.toLong << 32) | (lo.toLong & 0xffffffffL))
  }.toSeq

  /** Convert eligible containers to run-length form before
    * serialization (exactly what production writers do for contiguous
    * deletes — and what pins the reader against run containers). */
  def runOptimize(): Unit = bitmaps.foreach(_.runOptimize())

  /** Union `other` into this (container-level `or` — how a writer
    * GROWS a file's vector: the new DV must contain every previously
    * deleted position, PROTOCOL.md). */
  def orInPlace(other: RoaringBitmapArray): Unit = {
    while (bitmaps.length < other.bitmaps.length) bitmaps += new RoaringBitmap()
    other.bitmaps.zipWithIndex.foreach { case (bm, i) => bitmaps(i).or(bm) }
  }

  /** Portable serialization: LE magic + LE count + consecutive
    * RoaringFormatSpec-portable 32-bit bitmaps. */
  def serialize(): Array[Byte] = {
    val size = 4 + 8 + bitmaps.iterator.map(_.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RoaringBitmapArray.Magic)
    bb.putLong(bitmaps.length.toLong)
    bitmaps.foreach(_.serialize(bb))
    require(!bb.hasRemaining, "serialized size accounting is wrong")
    bb.array()
  }
}

object RoaringBitmapArray {

  /** The spec's magic number selecting the portable serialization. */
  val Magic: Int = 1681511377

  def apply(values: Long*): RoaringBitmapArray = {
    val a = new RoaringBitmapArray(ArrayBuffer.empty)
    values.foreach(a.add)
    a
  }

  def deserialize(data: Array[Byte]): RoaringBitmapArray = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining >= 12,
      s"deletion vector data of ${data.length} bytes is too short")
    val magic = bb.getInt
    require(magic == Magic,
      s"deletion vector magic $magic != $Magic — not the portable " +
        "RoaringBitmapArray serialization; refusing")
    val n = bb.getLong
    require(n >= 0 && n < (1 << 24), s"implausible bitmap count $n")
    val out = ArrayBuffer.empty[RoaringBitmap]
    var i = 0L
    while (i < n) {
      val bm = new RoaringBitmap()
      bm.deserialize(bb) // reads at position without advancing it …
      bb.position(bb.position() + bm.serializedSizeInBytes()) // … so skip
      out += bm
      i += 1
    }
    new RoaringBitmapArray(out)
  }
}

/** Serializable, manifest-scale map from canonical data-file path to
  * its deletion-vector descriptor — what [[DvDeleted]] ships with the
  * plan. Bitmap bytes are NOT here: they load lazily per JVM, keyed by
  * the descriptor's uniqueId, so an executor touches only the vectors
  * of files its tasks scan and a plan broadcast stays descriptor-sized
  * no matter how many rows are deleted. */
final class DvLookup(root: String,
                     byCanon: Map[String, DeltaDv.DvDescriptor])
    extends Serializable {

  /** Per-JVM vector cache (uniqueId → bitmap). Lives as long as the
    * plan's reference does; bounded by the descriptors' summed
    * sizeInBytes for files scanned on this executor. */
  @transient private lazy val loaded =
    new java.util.concurrent.ConcurrentHashMap[String, RoaringBitmapArray]()

  /** Per-thread (path → bitmap-or-null) memo: `_metadata.file_path`
    * is constant across each file's rows, so the hot call is one
    * UTF8String equality check — no per-row toString/map lookup. The
    * incoming UTF8String may alias a reused buffer, so the memo key is
    * a defensive clone. */
  @transient private lazy val memo =
    ThreadLocal.withInitial[Array[AnyRef]](() => new Array[AnyRef](2))

  def deleted(path: UTF8String, rowIndex: Long): Boolean = {
    val m = memo.get()
    if (m(0) == null || !m(0).asInstanceOf[UTF8String].equals(path)) {
      m(0) = path.clone()
      m(1) = resolve(path.toString).orNull
    }
    val bm = m(1).asInstanceOf[RoaringBitmapArray]
    bm != null && bm.contains(rowIndex)
  }

  /** Canonicalize the scan's file_path URI the same way
    * [[DeltaWrite.delete]] canonicalizes input_file_name (one pure
    * percent-decode of the URI form, then a filesystem normalize) and
    * look up + lazily load its vector. */
  private def resolve(raw: String): Option[RoaringBitmapArray] = {
    val canon = Paths.get(DeltaRead.percentDecode(raw.stripPrefix("file:")))
      .toAbsolutePath.normalize.toString
    byCanon.get(canon).map { d =>
      loaded.computeIfAbsent(d.uniqueId, _ => DeltaDv.load(root, d))
    }
  }
}

object DvLookup {
  /** Build a lookup from the fold's (add.path → descriptor) map,
    * canonicalizing keys exactly as the scan-side resolve does. */
  def apply(root: String,
            dvs: Map[String, DeltaDv.DvDescriptor]): DvLookup = {
    val rootAbs = Paths.get(root).toAbsolutePath.toString
    new DvLookup(rootAbs, dvs.map { case (p, d) =>
      Paths.get(DeltaRead.resolvePath(rootAbs, p))
        .toAbsolutePath.normalize.toString -> d
    })
  }
}

/** `dv_deleted(file_path, row_index)` — TRUE iff the row at
  * `row_index` of the parquet file at `file_path` is deleted by the
  * table's deletion vectors. Codegen'd (one virtual call into the
  * plan-shipped [[DvLookup]] per row), so a DV-filtered scan stays
  * inside whole-stage codegen; rows of files without a vector cost a
  * memoized null check. */
case class DvDeleted(lookup: DvLookup, filePath: Expression,
                     rowIndex: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(filePath, rowIndex)

  override def checkInputDataTypes(): TypeCheckResult =
    (filePath.dataType, rowIndex.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (p, i) => TypeCheckResult.TypeCheckFailure(
        s"dv_deleted requires (string, bigint), got " +
          s"(${p.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_deleted"

  override def eval(input: InternalRow): Any = {
    val p = filePath.eval(input)
    val i = rowIndex.eval(input)
    p != null && i != null &&
      lookup.deleted(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    val p = filePath.genCode(ctx)
    val i = rowIndex.genCode(ctx)
    ev.copy(
      code = code"""
        ${p.code}
        ${i.code}
        boolean ${ev.value} = !${p.isNull} && !${i.isNull} &&
          $ref.deleted(${p.value}, ${i.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filePath = newChildren(0), rowIndex = newChildren(1))
}
