package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{AviDecodeExpr, AviEncodeExpr, AviFrameExpr, BmpAHashExpr, BmpDecodeExpr, BmpEncodeExpr, BmpPixelsExpr, BmpResizeExpr, LongArrayDotExpr, LongArrayNorm2Expr, StringFoldHashExpr, TimeUuidExpression, WavPcmDecodeExpr, WavPcmEncodeExpr}

/**
 * SparkSessionExtensions hook: registers graft's custom expressions as SQL
 * functions so `spark.sql` users get the same surface as the Column API —
 *
 *   now_timeuuid()        fresh RFC-4122 v1 TIMEUUID per row per call
 *   graft_fold_hash(s)    the engine's portable string hash
 *   graft_qdot(a, b)      codegen'd int64 dot product over array<long>
 *   graft_qnorm2(a)       codegen'd int64 squared norm over array<long>
 *   graft_qlog2(x)        fixed-point log2 (1024 units/bit), the scoring scale
 *   graft_token_count(s)  the engine's whitespace token count
 *   graft_wav_encode(rate, samples)   RIFF/WAVE PCM16 bytes
 *   graft_wav_meta(bytes)             validated WAV metadata struct (null-routing)
 *   graft_bmp_encode(width, pixels)   24bpp BMP bytes
 *   graft_bmp_meta(bytes)             validated BMP metadata struct (null-routing)
 *   graft_bmp_resize(bytes, k)        integer box-downsample, re-decodable
 *   graft_bmp_pixels(bytes)           decode to packed 0xRRGGBB array<long>
 *   graft_bmp_ahash(bytes, k)         64-bit average-hash struct(hi, lo)
 *   graft_minhash_bands(s, k, n, r)   LSH band array — SQL-side dedup candidates
 *   graft_avi_signature(bytes, f)     single-scan video signature
 *   graft_wav_frame_energy(bytes, n)  per-frame Σs² (audio fingerprint unit)
 *   graft_normalize_text(s)           canonical normalize-then-hash form
 *
 * Wire up with:
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("now_timeuuid"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TimeUuidExpression].getName, "now_timeuuid"),
      (_: Seq[Expression]) => TimeUuidExpression()))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fold_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StringFoldHashExpr].getName, "graft_fold_hash"),
      (args: Seq[Expression]) => StringFoldHashExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongArrayDotExpr].getName, "graft_qdot"),
      (args: Seq[Expression]) => LongArrayDotExpr(args.head, args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qnorm2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongArrayNorm2Expr].getName, "graft_qnorm2"),
      (args: Seq[Expression]) => LongArrayNorm2Expr(args.head)))
    // composite builtins exposed as SQL names — built from catalyst nodes
    // directly (a Column round-trip yields an un-codegen-able node inside
    // injectFunction), expanding to builtin expressions only, so they stay
    // inside whole-stage codegen. Arithmetic mirrors Retrieval.qlog2 /
    // TextAnalysis.tokenCount exactly; GraftExtensionsSpec pins equality.
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qlog2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.operators.Retrieval", "graft_qlog2"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{IntegerType, LongType}
        val x = Cast(args.head, LongType)
        val ilog2 = Cast(Subtract(Length(Bin(x)), Literal(1)), LongType)
        Subtract(
          Add(Multiply(Literal(1024L), ilog2),
            ShiftRight(Multiply(x, Literal(1024L)),
              Cast(ilog2, IntegerType))),
          Literal(1024L))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_token_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.operators.TextAnalysis", "graft_token_count"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{LongType, StringType}
        val t = UnresolvedNamedLambdaVariable(Seq("t"))
        Cast(Size(ArrayFilter(
          StringSplit(new StringTrim(Cast(args.head, StringType)),
            Literal("\\s+"), Literal(-1)),
          LambdaFunction(GreaterThan(Length(t), Literal(0)), Seq(t))),
          legacySizeOfNull = false), LongType)
      }))
    // the REAL media codecs as SQL names: encode/decode/resize for
    // RIFF/WAVE PCM16 and 24bpp BMP (WavPcm/Bmp expressions; null-routing
    // decode contract carries over to SQL)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_wav_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WavPcmEncodeExpr].getName, "graft_wav_encode"),
      (args: Seq[Expression]) => WavPcmEncodeExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.IntegerType), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_wav_meta"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WavPcmDecodeExpr].getName, "graft_wav_meta"),
      (args: Seq[Expression]) => WavPcmDecodeExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bmp_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BmpEncodeExpr].getName, "graft_bmp_encode"),
      (args: Seq[Expression]) => BmpEncodeExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.IntegerType), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bmp_meta"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BmpDecodeExpr].getName, "graft_bmp_meta"),
      (args: Seq[Expression]) => BmpDecodeExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bmp_resize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BmpResizeExpr].getName, "graft_bmp_resize"),
      (args: Seq[Expression]) => BmpResizeExpr(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bmp_pixels"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BmpPixelsExpr].getName, "graft_bmp_pixels"),
      (args: Seq[Expression]) => BmpPixelsExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bmp_ahash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BmpAHashExpr].getName, "graft_bmp_ahash"),
      (args: Seq[Expression]) => BmpAHashExpr(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avi_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AviEncodeExpr].getName, "graft_avi_encode"),
      (args: Seq[Expression]) => AviEncodeExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.IntegerType), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avi_meta"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AviDecodeExpr].getName, "graft_avi_meta"),
      (args: Seq[Expression]) => AviDecodeExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avi_frame"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AviFrameExpr].getName, "graft_avi_frame"),
      (args: Seq[Expression]) => AviFrameExpr(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))))
    // graft_minhash_bands(text, numHashes, shingleN, rowsPerBand): the
    // streaming near-dedup banding core as a SQL name — numeric args must
    // be int LITERALS (the expression specializes its codegen per
    // parameterization). SQL-only users get LSH dedup CANDIDATES with
    //   SELECT a.doc_id, b.doc_id FROM
    //     (SELECT doc_id, explode(graft_minhash_bands(text,16,3,4)) b ...) a
    //     JOIN ... ON a.b = b.b AND a.doc_id < b.doc_id
    // — the same bit-identical banding the Column API and the sink's
    // dedup=near stage run (VERDICT r10 #8).
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_bands"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.MinhashBandsExpr].getName,
        "graft_minhash_bands"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_bands $what must be an int literal, got $other")
        }
        graft.functions.MinhashBandsExpr(args.head,
          intLit(args(1), "numHashes"), intLit(args(2), "shingleN"),
          intLit(args(3), "rowsPerBand"))
      }))
    // graft_avi_signature(bytes, factor): single-scan per-frame-aHash fold
    // — video dedup signatures straight from SQL
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avi_signature"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.AviSignatureExpr].getName,
        "graft_avi_signature"),
      (args: Seq[Expression]) => graft.functions.AviSignatureExpr(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))))
    // graft_wav_frame_energy(bytes, frameLen): per-frame Σs² — the audio
    // fingerprint building block as a SQL name
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        "graft_wav_frame_energy"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.WavFrameEnergyExpr].getName,
        "graft_wav_frame_energy"),
      (args: Seq[Expression]) => graft.functions.WavFrameEnergyExpr(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))))
    // graft_normalize_text(s): the normalize-then-hash canonical form
    // (TextAnalysis.normalizeText) — normalized exact dedup keys from pure
    // SQL; expands to builtin lower/regexp_replace/trim so it codegens
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.operators.TextAnalysis", "graft_normalize_text"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.StringType
        new StringTrim(RegExpReplace(
          Lower(Cast(args.head, StringType)),
          Literal("[^a-z0-9]+"), Literal(" ")))
      }))
    // graft_morton(x, y[, bits=8]): Z-order bit interleave of two
    // non-negative ints — Layout.mortonValue as a SQL name, expanded to
    // builtin shift/mask arithmetic so it codegens. `bits` must be an
    // integer LITERAL (the expansion is per-bit).
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_morton"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.operators.Layout", "graft_morton"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{IntegerType, LongType}
        val bits = args.lift(2) match {
          case None => 8
          case Some(Literal(v: Int, IntegerType)) if v >= 1 && v <= 31 => v
          case Some(other) => throw new IllegalArgumentException(
            s"graft_morton bits must be an int literal in [1,31], got $other")
        }
        val x = Cast(args.head, LongType)
        val y = Cast(args(1), LongType)
        (0 until bits).foldLeft[Expression](Literal(0L)) { (acc, i) =>
          Add(acc, Add(
            Multiply(Remainder(ShiftRight(x, Literal(i)), Literal(2L)),
              Literal(1L << (2 * i))),
            Multiply(Remainder(ShiftRight(y, Literal(i)), Literal(2L)),
              Literal(2L << (2 * i)))))
        }
      }))
  }
}
