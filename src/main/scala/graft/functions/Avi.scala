package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Real VIDEO container codec: a minimal-but-faithful RIFF/AVI muxer and
 * demuxer for uncompressed 24bpp DIB frames (public format: Microsoft
 * RIFF/AVI 1.0). With [[Bmp]] this closes the last multimodal modality —
 * frame-accurate video SAMPLE EXTRACTION is real byte-layout work, not a
 * stub: [[Avi.encode]] muxes BMP frames into `RIFF('AVI ' hdrl(avih,
 * strl(strh,strf)) movi('00db'…))`, [[Avi.extractFrame]] walks the movi
 * chunks and re-wraps frame `i`'s DIB block as a standalone BMP that
 * [[Bmp.decode]] then validates — so q-oracle hash equality proves the
 * whole mux→demux→decode chain.
 *
 * Malformed containers (bad magic, truncated chunks, non-DIB streams,
 * mismatched frame dims) return null — route, don't throw, like the other
 * codecs.
 */
object Avi {

  // RIFF(12) + LIST hdrl(12) + avih(8+56) + LIST strl(12) + strh(8+56) +
  // strf(8+40) + LIST movi header(12)
  private val HdrlBytes = 12 + 8 + 56 + 12 + 8 + 56 + 8 + 40
  private val PreMoviBytes = 12 + HdrlBytes

  @inline private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  @inline private def tag(out: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
  }

  @inline private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def hasTag(b: Array[Byte], off: Int, s: String): Boolean =
    b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  @inline private def stride(width: Int): Int = (width * 3 + 3) & ~3

  // Long-domain stride: width*3 overflows Int for header-controlled widths
  // past ~715M, so every size computation that feeds a bound check or an
  // allocation must go through this variant and null-route on overflow.
  @inline private def strideL(width: Int): Long = (width.toLong * 3 + 3) & ~3L

  /** Validate one BMP frame, return (width, height) or null. */
  private def bmpDims(f: Array[Byte]): (Int, Int) = {
    if (f == null || f.length < Bmp.HeaderBytes) return null
    if (f(0) != 'B'.toByte || f(1) != 'M'.toByte) return null
    if (rdLe32(f, 10) != Bmp.HeaderBytes || rdLe32(f, 14) != 40) return null
    val w = rdLe32(f, 18); val h = rdLe32(f, 22)
    if (w <= 0 || h <= 0) return null
    if (rdLe16(f, 26) != 1 || rdLe16(f, 28) != 24) return null
    if (rdLe32(f, 30) != 0) return null
    if (f.length != Bmp.HeaderBytes + strideL(w) * h) return null
    (w, h)
  }

  /** Mux same-dimension BMP frames into an AVI at `usecPerFrame`; null
    * when frames are empty, malformed, or dimension-mismatched. */
  def encode(usecPerFrame: Int, frames: ArrayData): Array[Byte] = {
    if (usecPerFrame <= 0 || frames == null) return null
    val nf = frames.numElements()
    if (nf == 0) return null
    val first = frames.getBinary(0)
    val dims = bmpDims(first)
    if (dims == null) return null
    val (w, h) = dims
    // size math in Long: Int overflow on a large frame count/dimension would
    // allocate a negative-size array and THROW on the executor, violating
    // the route-don't-throw contract — an unencodable total routes to null
    val frameBytesL = strideL(w) * h
    val totalL = PreMoviBytes + 12L + nf.toLong * (8L + frameBytesL)
    if (frameBytesL > Int.MaxValue || totalL > Int.MaxValue) return null
    val frameBytes = frameBytesL.toInt
    var i = 1
    while (i < nf) {
      if (bmpDims(frames.getBinary(i)) != ((w, h))) return null
      i += 1
    }
    val moviData = (nf.toLong * (8L + frameBytesL)).toInt
    val out = new Array[Byte](totalL.toInt)
    tag(out, 0, "RIFF"); le32(out, 4, out.length - 8); tag(out, 8, "AVI ")
    var o = 12
    tag(out, o, "LIST"); le32(out, o + 4, 4 + 8 + 56 + 12 + 8 + 56 + 8 + 40)
    tag(out, o + 8, "hdrl"); o += 12
    tag(out, o, "avih"); le32(out, o + 4, 56); o += 8
    le32(out, o, usecPerFrame) // dwMicroSecPerFrame
    le32(out, o + 4, 0) // dwMaxBytesPerSec
    le32(out, o + 8, 0) // dwPaddingGranularity
    le32(out, o + 12, 0) // dwFlags (no index)
    le32(out, o + 16, nf) // dwTotalFrames
    le32(out, o + 20, 0) // dwInitialFrames
    le32(out, o + 24, 1) // dwStreams
    le32(out, o + 28, 8 + frameBytes) // dwSuggestedBufferSize
    le32(out, o + 32, w); le32(out, o + 36, h)
    // 4 reserved dwords stay zero
    o += 56
    tag(out, o, "LIST"); le32(out, o + 4, 4 + 8 + 56 + 8 + 40)
    tag(out, o + 8, "strl"); o += 12
    tag(out, o, "strh"); le32(out, o + 4, 56); o += 8
    tag(out, o, "vids"); tag(out, o + 4, "DIB ")
    le32(out, o + 20, usecPerFrame) // dwScale
    le32(out, o + 24, 1000000) // dwRate → fps = rate/scale
    le32(out, o + 32, nf) // dwLength in frames
    le32(out, o + 36, 8 + frameBytes) // dwSuggestedBufferSize
    // rcFrame as 4 int16: left top right bottom
    out(o + 52) = (w & 0xff).toByte; out(o + 53) = ((w >> 8) & 0xff).toByte
    out(o + 54) = (h & 0xff).toByte; out(o + 55) = ((h >> 8) & 0xff).toByte
    o += 56
    tag(out, o, "strf"); le32(out, o + 4, 40); o += 8
    le32(out, o, 40); le32(out, o + 4, w); le32(out, o + 8, h)
    out(o + 12) = 1 // planes
    out(o + 14) = 24 // bpp
    le32(out, o + 16, 0) // BI_RGB
    le32(out, o + 20, frameBytes)
    o += 40
    tag(out, o, "LIST"); le32(out, o + 4, 4 + moviData)
    tag(out, o + 8, "movi"); o += 12
    i = 0
    while (i < nf) {
      tag(out, o, "00db"); le32(out, o + 4, frameBytes)
      System.arraycopy(frames.getBinary(i), Bmp.HeaderBytes, out, o + 8,
        frameBytes)
      o += 8 + frameBytes
      i += 1
    }
    out
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("usec_per_frame", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("movi_bytes", LongType, nullable = false)))

  /** Validate the container shape; null on malformation. Returns header
    * facts plus the movi payload size actually walked (so a truncated
    * chunk list cannot silently pass). */
  def decode(bytes: Array[Byte]): InternalRow = {
    val p = parse(bytes)
    if (p == null) return null
    val (w, h, nf, usec, moviBytes) = p
    new GenericInternalRow(Array[Any](w, h, nf.toLong, usec.toLong,
      nf.toLong * usec / 1000L, moviBytes.toLong))
  }

  /** (width, height, nFrames, usecPerFrame, moviDataBytes) or null. */
  private def parse(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    if (bytes == null || bytes.length < PreMoviBytes + 12) return null
    if (!hasTag(bytes, 0, "RIFF") || !hasTag(bytes, 8, "AVI ")) return null
    if (rdLe32(bytes, 4) != bytes.length - 8) return null
    if (!hasTag(bytes, 12, "LIST") || !hasTag(bytes, 20, "hdrl")) return null
    if (!hasTag(bytes, 24, "avih") || rdLe32(bytes, 28) != 56) return null
    val usec = rdLe32(bytes, 32)
    val nf = rdLe32(bytes, 48)
    val w = rdLe32(bytes, 64)
    val h = rdLe32(bytes, 68)
    if (usec <= 0 || nf <= 0 || w <= 0 || h <= 0) return null
    val strh = 12 + 12 + 8 + 56 + 12
    if (!hasTag(bytes, strh, "strh")) return null
    if (!hasTag(bytes, strh + 8, "vids") ||
        !hasTag(bytes, strh + 12, "DIB ")) return null
    val moviOff = PreMoviBytes
    if (!hasTag(bytes, moviOff, "LIST") ||
        !hasTag(bytes, moviOff + 8, "movi")) return null
    val moviData = rdLe32(bytes, moviOff + 4) - 4
    if (moviOff + 12 + moviData.toLong != bytes.length) return null
    // walk every frame chunk — size math in Long like encode's: an Int
    // overflow here turns frameBytes negative, which a crafted chunk-size
    // field can match, driving the walk offset negative and THROWING on
    // the executor instead of null-routing the record
    val frameBytesL = strideL(w) * h
    if (frameBytesL > Int.MaxValue) return null
    val frameBytes = frameBytesL.toInt
    var o = moviOff + 12
    var count = 0
    while (o < bytes.length) {
      if (o + 8 > bytes.length) return null
      if (!hasTag(bytes, o, "00db")) return null
      if (rdLe32(bytes, o + 4) != frameBytes) return null
      if (o + 8L + frameBytes > bytes.length) return null
      o += 8 + frameBytes
      count += 1
    }
    if (count != nf) return null
    (w, h, nf, usec, moviData)
  }

  /**
   * Single-pass video perceptual signature: parse the container ONCE,
   * then walk the movi frame chunks in order, aHash each DIB block IN
   * PLACE ([[Bmp.aHashGrid]] over the frame's byte range — no BMP
   * re-wrap, no copy), and fold the ordered hashes as
   * `acc = (acc·131 + hi·31 + lo) mod 2^31−1`.
   *
   * Semantically identical to the composed form
   * (`transform(sequence(0, n−1), f ⇒ aHash(aviFrame(bytes, f)))` +
   * `aggregate` fold, kept as [[graft.multimodal.MediaDedup
   * .videoSignatureComposed]] and spec-pinned equal) but O(container
   * bytes) instead of O(frames × container bytes): the composed form
   * re-parses the whole container per frame AND re-validates each
   * re-wrapped BMP header, a superlinear straggler shape for long videos
   * at scale. Null for malformed containers, factor < 1, or a frame grid
   * that isn't exactly 64 cells — the same null contract as the composed
   * chain (frame dims are container-uniform, so one frame's grid verdict
   * is every frame's).
   */
  def signature(bytes: Array[Byte], factor: Int): java.lang.Long = {
    if (factor < 1) return null
    val p = parse(bytes)
    if (p == null) return null
    val (w, h, nf, _, _) = p
    val frameBytesL = strideL(w) * h
    if (frameBytesL > Int.MaxValue) return null
    val frameBytes = frameBytesL.toInt
    var acc = 0L
    var i = 0
    var off = PreMoviBytes + 12
    while (i < nf) {
      val hl = Bmp.aHashGrid(bytes, off + 8, w, h, factor)
      if (hl == null) return null
      // hi/lo < 2^32 and acc < 2^31 ⇒ acc·131 + hi·31 + lo < 2^39, no
      // Long overflow before the mod; all terms non-negative ⇒ % == pmod
      acc = (acc * 131L + hl(0) * 31L + hl(1)) % 2147483647L
      off += 8 + frameBytes
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Demux frame `idx` (0-based) as a standalone BMP blob — the REAL
    * frame-sample extraction; null for malformed input or out-of-range. */
  def extractFrame(bytes: Array[Byte], idx: Int): Array[Byte] = {
    val p = parse(bytes)
    if (p == null || idx < 0) return null
    val (w, h, nf, _, _) = p
    if (idx >= nf) return null
    val frameBytes = stride(w) * h
    val frameOff = PreMoviBytes + 12 + idx * (8 + frameBytes) + 8
    val out = new Array[Byte](Bmp.HeaderBytes + frameBytes)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(out, 2, out.length)
    le32(out, 10, Bmp.HeaderBytes)
    le32(out, 14, 40); le32(out, 18, w); le32(out, 22, h)
    out(26) = 1; out(28) = 24
    le32(out, 34, frameBytes)
    System.arraycopy(bytes, frameOff, out, Bmp.HeaderBytes, frameBytes)
    out
  }
}

/** `graft_avi_encode(usec_per_frame, frames array<binary BMP>)` → AVI. */
case class AviEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_encode"

  override protected def nullSafeEval(usec: Any, frames: Any): Any =
    Avi.encode(usec.asInstanceOf[Int], frames.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, f) => {
      s"""
         |byte[] ${ev.value}Tmp = graft.functions.Avi.encode($u, $f);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_avi_meta(bytes)` → container metadata struct, null-routing. */
case class AviDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Avi.metaSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_meta"

  override protected def nullSafeEval(bytes: Any): Any =
    Avi.decode(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |InternalRow ${ev.value}Tmp = graft.functions.Avi.decode($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviDecodeExpr =
    copy(child = newChild)
}

/** `graft_avi_signature(bytes, factor)` → 31-bit ordered per-frame aHash
  * fold of the whole container in ONE scan; null-routing. The codegen'd
  * replacement for the per-frame `transform(sequence…, aviFrame → aHash)`
  * chain (which re-parses the container per frame — O(frames × bytes)). */
case class AviSignatureExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_signature"

  override protected def nullSafeEval(bytes: Any, factor: Any): Any =
    Avi.signature(bytes.asInstanceOf[Array[Byte]], factor.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, f) => {
      s"""
         |java.lang.Long ${ev.value}Tmp = graft.functions.Avi.signature($b, $f);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviSignatureExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_avi_frame(bytes, idx)` → frame `idx` re-wrapped as a BMP blob. */
case class AviFrameExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frame"

  override protected def nullSafeEval(bytes: Any, idx: Any): Any =
    Avi.extractFrame(bytes.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, i) => {
      s"""
         |byte[] ${ev.value}Tmp = graft.functions.Avi.extractFrame($b, $i);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviFrameExpr =
    copy(left = newLeft, right = newRight)
}
