package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
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

  /** The synthetic clip for (width, nFrames, base, id); null for
    * non-positive dims or an unencodable total (same null routing as the
    * composed constructor's codecs). */
  def clip(width: Int, nFrames: Int, base: Long, id: Long): Array[Byte] = {
    if (width <= 0 || nFrames <= 0) return null
    val n = width * width
    val frames = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val px = new Array[Long](n)
      var i = 0
      while (i < n) {
        val g = 8L + Math.floorMod(base * 37L + f * 53L + i * 11L, 240L) +
          Math.floorMod(id * 3L + f * 7L + i, 2L)
        px(i) = g * 65793L // 0x010101 — gray replicated across channels
        i += 1
      }
      val bmp = Bmp.encode(width, new GenericArrayData(px))
      if (bmp == null) return null
      frames(f) = bmp
      f += 1
    }
    Avi.encode(UsecPerFrame, new GenericArrayData(frames))
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
