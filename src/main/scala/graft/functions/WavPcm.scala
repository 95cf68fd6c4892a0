package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Real (not stubbed) audio codec for the multimodal path: RIFF/WAVE PCM16LE
 * mono encode + header-validating decode, as native Catalyst expressions
 * with whole-stage codegen. WAV/PCM is a pure byte-layout format (RIFF
 * chunks + little-endian samples; public spec, Microsoft/IBM 1991), so a
 * complete codec needs no media library — which makes it the one modality
 * this container can decode END TO END rather than behind a declared stub.
 *
 * The decode returns null for anything that is not a well-formed
 * PCM16-mono WAV (wrong magic, non-PCM format tag, truncated data chunk),
 * so corrupt blobs surface as null-metadata rows a pipeline can route,
 * never as executor exceptions — the ignoreErrors discipline of the sink's
 * codecs (reference: the DSBulk-style invalid-record path) applied to
 * media.
 *
 * All emitted stats are exact integers (peak, Σ|s|, Σs²; duration in ms by
 * integer division), so a DuckDB oracle reproduces the round trip
 * bit-for-bit from the sample formula alone: hash-equality on
 * encode→decode output IS the proof that the byte layout round-trips.
 */
object WavPcm {

  val HeaderBytes = 44

  /** RIFF/WAVE PCM16LE mono bytes from int16 samples (low 16 bits of each
    * long are written; callers keep samples in [-32768, 32767]). */
  def encode(sampleRate: Int, samples: ArrayData): Array[Byte] = {
    val n = samples.numElements()
    // Long size math: n*2 overflows Int past 2³⁰ samples and would throw
    // NegativeArraySizeException on the executor — route to null instead
    if (HeaderBytes + n.toLong * 2L > Int.MaxValue) return null
    val dataBytes = n * 2
    val out = new Array[Byte](HeaderBytes + dataBytes)
    @inline def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    @inline def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM format tag
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate = rate · block align
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < n) {
      le16(HeaderBytes + 2 * i, (samples.getLong(i) & 0xffffL).toInt)
      i += 1
    }
    out
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  @inline private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def hasTag(b: Array[Byte], off: Int, s: String): Boolean =
    b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  /** Parse + integer-stat a PCM16-mono WAV; null on any malformation. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < HeaderBytes) return null
    if (!hasTag(bytes, 0, "RIFF") || !hasTag(bytes, 8, "WAVE") ||
        !hasTag(bytes, 12, "fmt ") || !hasTag(bytes, 36, "data")) return null
    if (rdLe32(bytes, 16) != 16) return null // fmt chunk size
    val fmtTag = rdLe16(bytes, 20)
    val channels = rdLe16(bytes, 22)
    val bits = rdLe16(bytes, 34)
    if (fmtTag != 1 || channels != 1 || bits != 16) return null
    val sampleRate = rdLe32(bytes, 24)
    if (sampleRate <= 0) return null
    val dataBytes = rdLe32(bytes, 40)
    if (dataBytes < 0 || dataBytes % 2 != 0 ||
        HeaderBytes + dataBytes != bytes.length) return null
    val n = dataBytes / 2
    var peak = 0L
    var sumAbs = 0L
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = rdLe16(bytes, HeaderBytes + 2 * i).toShort.toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      sumSq += s * s
      i += 1
    }
    new GenericInternalRow(Array[Any](
      sampleRate, channels, bits, n.toLong,
      n.toLong * 1000L / sampleRate, peak, sumAbs, sumSq))
  }

  /** Per-frame energy (Σ s² over consecutive `frameLen`-sample windows,
    * last frame partial) of a PCM16-mono WAV — the frame-level feature
    * extraction a VAD / loudness-segmentation pipeline runs. Null on
    * malformed input (same validation as [[decode]]). */
  def frameEnergy(bytes: Array[Byte], frameLen: Int): ArrayData = {
    if (frameLen < 1) return null
    if (bytes == null || bytes.length < HeaderBytes) return null
    if (!hasTag(bytes, 0, "RIFF") || !hasTag(bytes, 8, "WAVE") ||
        !hasTag(bytes, 12, "fmt ") || !hasTag(bytes, 36, "data")) return null
    if (rdLe32(bytes, 16) != 16 || rdLe16(bytes, 20) != 1 ||
        rdLe16(bytes, 22) != 1 || rdLe16(bytes, 34) != 16) return null
    val dataBytes = rdLe32(bytes, 40)
    if (dataBytes < 0 || dataBytes % 2 != 0 ||
        HeaderBytes + dataBytes != bytes.length) return null
    val n = dataBytes / 2
    val nFrames = (n + frameLen - 1) / frameLen
    val out = new Array[Long](nFrames)
    var i = 0
    while (i < n) {
      val s = rdLe16(bytes, HeaderBytes + 2 * i).toShort.toLong
      out(i / frameLen) += s * s
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `graft_wav_encode(sample_rate, samples)` → binary WAV blob. */
case class WavPcmEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_encode"

  override protected def nullSafeEval(rate: Any, samples: Any): Any =
    WavPcm.encode(rate.asInstanceOf[Int], samples.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, s) => s"graft.functions.WavPcm.encode($r, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavPcmEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_wav_meta(bytes)` → struct metadata, null when not a valid
  * PCM16-mono WAV (the route-don't-throw contract). */
case class WavPcmDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavPcm.metaSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_meta"

  override protected def nullSafeEval(bytes: Any): Any =
    WavPcm.decode(bytes.asInstanceOf[Array[Byte]]) // null ⇒ result null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |InternalRow ${ev.value}Tmp = graft.functions.WavPcm.decode($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavPcmDecodeExpr =
    copy(child = newChild)
}

/** `graft_wav_frame_energy(bytes, frameLen)` → array<long> of per-frame
  * Σ s² (last frame partial); null for malformed WAVs. */
case class WavFrameEnergyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_frame_energy"

  override protected def nullSafeEval(bytes: Any, frameLen: Any): Any =
    WavPcm.frameEnergy(bytes.asInstanceOf[Array[Byte]],
      frameLen.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, f) => {
      s"""
         |ArrayData ${ev.value}Tmp = graft.functions.WavPcm.frameEnergy($b, $f);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavFrameEnergyExpr =
    copy(left = newLeft, right = newRight)
}
