package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * Deterministic synthetic test-clip generator — the CORPUS DEFINITION of
 * the media-dedup fixtures (q280's oracle SQL states the identical pixel
 * formula), generated natively instead of through per-pixel interpreted
 * higher-order column closures.
 *
 * Frame `f` of clip `(base, id)` is a square `width`×`width` gray BMP with
 * pixel `i` (top-left row-major) =
 * `g·0x010101` where `g = 8 + (base·37 + f·53 + i·11) mod 240 +
 * (id·3 + f·7 + i) mod 2` — a per-clip gray ramp (`base` picks the
 * content) plus a per-copy ±1 jitter (`id` varies each copy without moving
 * any 2×2 block mean by more than 1, so copies of one `base` aHash
 * identically). The frames mux through the REAL codecs — [[Bmp.encode]]
 * then [[Avi.encode]] — so the output is bit-identical to the composed
 * `aviEncode(transform(sequence…, bmpEncode(…)))` constructor by
 * construction (MediaDedupSpec pins the equality). The composed form costs
 * `width²·nFrames` interpreted closure evaluations per row (~4 s of the
 * sf0.1 q280 wall before this expression existed); this is one native
 * call, so fixture generation no longer buries the operator a bench row
 * measures. Also the cheap container source for long-video probes
 * (≥64-frame containers at negligible generation cost).
 */
object SynthMedia {

  val UsecPerFrame = 40000 // 25 fps — the fixture's fixed frame clock

  /** Pixel array of frame `f` — the formula in the object scaladoc
    * (`f = 0` drops the per-frame terms: the single-image fixture). */
  private def framePixels(width: Int, f: Int, base: Long, id: Long): Array[Long] = {
    val n = width * width
    val px = new Array[Long](n)
    var i = 0
    while (i < n) {
      val g = 8L + Math.floorMod(base * 37L + f * 53L + i * 11L, 240L) +
        Math.floorMod(id * 3L + f * 7L + i, 2L)
      px(i) = g * 65793L // 0x010101 — gray replicated across channels
      i += 1
    }
    px
  }

  /** The synthetic clip for (width, nFrames, base, id); null for
    * non-positive dims or an unencodable total (same null routing as the
    * composed constructor's codecs). */
  def clip(width: Int, nFrames: Int, base: Long, id: Long): Array[Byte] = {
    if (width <= 0 || nFrames <= 0) return null
    val frames = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val bmp = Bmp.encode(width, new GenericArrayData(framePixels(width, f, base, id)))
      if (bmp == null) return null
      frames(f) = bmp
      f += 1
    }
    Avi.encode(UsecPerFrame, new GenericArrayData(frames))
  }

  /** Frame 0 of [[clip]] as a standalone BMP — the single-IMAGE fixture
    * corpus (the phash queries): `base` picks the picture, `id` jitters
    * each copy by ±1 gray without moving any 2×2 block mean by more than
    * 1. Bit-identical to the composed `bmpEncode(transform(sequence…))`
    * with the same formula for non-negative (base, id) (Spark's `%` is a
    * remainder; the fixture ids are non-negative, so it coincides with
    * the floorMod here). */
  def frame(width: Int, base: Long, id: Long): Array[Byte] = {
    if (width <= 0) return null
    Bmp.encode(width, new GenericArrayData(framePixels(width, 0, base, id)))
  }

  /** The WAV ramp fixture: `n` samples `floorMod(id·7 + i·31, 2001) −
    * 1000` at `rate`, through the real [[WavPcm.encode]] — the roundtrip/
    * framing corpus. Null for non-positive dims (the composed codec's
    * routing). */
  def wavRamp(rate: Int, n: Int, id: Long): Array[Byte] = {
    if (rate <= 0 || n <= 0) return null
    val s = new Array[Long](n)
    var i = 0
    while (i < n) {
      s(i) = Math.floorMod(id * 7L + i * 31L, 2001L) - 1000L
      i += 1
    }
    WavPcm.encode(rate, new GenericArrayData(s))
  }

  /** The audio near-dup fixture: `base` picks the waveform
    * (`floorMod(base·97 + (i+3)·(base+7)·11 + i²·29, 2001) − 1000`), `id`
    * adds a per-copy jitter in {−1, 0, 1} — copies of one base fingerprint
    * identically through the band-energy hash while byte hashes differ. */
  def audioClip(rate: Int, n: Int, base: Long, id: Long): Array[Byte] = {
    if (rate <= 0 || n <= 0) return null
    val s = new Array[Long](n)
    var i = 0
    while (i < n) {
      s(i) = Math.floorMod(base * 97L + (i + 3L) * (base + 7L) * 11L +
        i.toLong * i * 29L, 2001L) - 1000L + Math.floorMod(id + i, 3L) - 1L
      i += 1
    }
    WavPcm.encode(rate, new GenericArrayData(s))
  }
}

/** `graft_synth_clip(width, n_frames, base, id)` → synthetic AVI clip
  * (see [[SynthMedia]]); null-routing, codegen'd. */
case class SynthClipExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synth_clip"

  override def nullSafeEval(w: Any, nf: Any, base: Any, id: Any): Any =
    SynthMedia.clip(w.asInstanceOf[Int], nf.asInstanceOf[Int],
      base.asInstanceOf[Long], id.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, nf, base, id) => {
      s"""
         |byte[] ${ev.value}Tmp =
         |  graft.functions.SynthMedia.clip($w, $nf, $base, $id);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SynthClipExpr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `graft_synth_frame(width, base, id)` → synthetic BMP (frame 0 of the
  * clip fixture — see [[SynthMedia.frame]]); null-routing, codegen'd. */
case class SynthFrameExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synth_frame"

  override def nullSafeEval(w: Any, base: Any, id: Any): Any =
    SynthMedia.frame(w.asInstanceOf[Int], base.asInstanceOf[Long],
      id.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, base, id) => {
      s"""
         |byte[] ${ev.value}Tmp =
         |  graft.functions.SynthMedia.frame($w, $base, $id);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SynthFrameExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_synth_wav(rate, n, id)` → synthetic ramp WAV (see
  * [[SynthMedia.wavRamp]]); null-routing, codegen'd. */
case class SynthWavExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synth_wav"

  override def nullSafeEval(rate: Any, n: Any, id: Any): Any =
    SynthMedia.wavRamp(rate.asInstanceOf[Int], n.asInstanceOf[Int],
      id.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (rate, n, id) => {
      s"""
         |byte[] ${ev.value}Tmp =
         |  graft.functions.SynthMedia.wavRamp($rate, $n, $id);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SynthWavExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_synth_audio(rate, n, base, id)` → synthetic near-dup audio clip
  * (see [[SynthMedia.audioClip]]); null-routing, codegen'd. */
case class SynthAudioExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synth_audio"

  override def nullSafeEval(rate: Any, n: Any, base: Any, id: Any): Any =
    SynthMedia.audioClip(rate.asInstanceOf[Int], n.asInstanceOf[Int],
      base.asInstanceOf[Long], id.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (rate, n, base, id) => {
      s"""
         |byte[] ${ev.value}Tmp =
         |  graft.functions.SynthMedia.audioClip($rate, $n, $base, $id);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SynthAudioExpr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
