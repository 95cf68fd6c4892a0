package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.IntMath

/**
 * Near-duplicate detection over DECODED media bytes — the image/audio
 * counterpart of the text MinHash/SimHash family in
 * [[graft.operators.Dedup]]. A crawl-scale multimodal corpus carries the
 * same dup structure as text (mirrors, re-encodes, slight crops/jitters),
 * and the curation pipeline needs content-level signatures, not byte
 * hashes: one flipped pixel changes the blob's SHA but not its perceptual
 * hash.
 *
 * Signatures compose the REAL codecs ([[Multimodal.bmpResize]] /
 * [[Multimodal.bmpPixels]] / [[Multimodal.wavFrameEnergy]]) as pure
 * codegen'd column logic:
 *
 *  - [[aHash64]] — classic average-hash: box-downsample to 8×8, grayscale,
 *    threshold against the grid mean → 64 bits. Robust to small pixel
 *    jitter (a ±1 channel wiggle moves a block mean by ≤1, flipping a bit
 *    only when the block sits exactly at the corpus mean).
 *  - [[audioFingerprint]] — FFT-free energy-descent fingerprint: frame the
 *    PCM stream, bit f = energy(f) > energy(f+1). The descent PATTERN
 *    survives amplitude jitter; no media library needed.
 *
 * Scale shape: signatures are map-only (one pass over the blob bytes,
 * whole-stage codegen); clustering is one partial-agg groupBy on the
 * 64-bit signature; near-match candidates use the same 4×16-bit banding
 * as the text LSH path (a hamming-≤k pair shares ≥1 exact band for k≤3 by
 * pigeonhole) so candidate volume tracks dup density, not corpus².
 * Like batch `minhashCandidates`, band buckets are uncapped here —
 * Dedup.cappedCandidates documents the cap contract for dup-dense
 * corpora.
 */
object MediaDedup {

  /** Truncating-mean grayscale of a packed 0xRRGGBB pixel column. */
  private def gray(p: Column): Column = IntMath.idiv(
    shiftright(p, 16).bitwiseAND(lit(255L)) +
      shiftright(p, 8).bitwiseAND(lit(255L)) + p.bitwiseAND(lit(255L)),
    lit(3L))

  /** Integer-exact bit pack: bits `hiBit..loBit` of the threshold mask
    * (gray(i) > mean), accumulated most-significant-first so the result is
    * Σ bit_o << (o - loBit) without needing a column-shift primitive. */
  private def packBits(grays: Column, mean: Column, hiBit: Int,
      loBit: Int): Column =
    aggregate(sequence(lit(hiBit), lit(loBit), lit(-1)), lit(0L),
      (acc, o) => acc * lit(2L) +
        when(element_at(grays, o + 1) > mean, 1L).otherwise(0L))

  /**
   * 64-bit average-hash of a 24bpp BMP blob as
   * `struct(phash_hi, phash_lo)` — two non-negative 32-bit halves (a
   * single LongType hash would fight sign semantics in both engines'
   * integer ops). `factor` must box-downsample the image to exactly 64
   * cells (factor = width/8 = height/8 for square images); anything
   * else — including malformed blobs — is null (route, don't throw).
   *
   * Backed by the codegen'd [[graft.functions.BmpAHashExpr]] — one pass
   * over the blob bytes. The same arithmetic composes from
   * `bmpResize`→`bmpPixels`→grayscale→threshold column logic (the spec
   * pins equality), but the interpreted higher-order chain re-evaluates
   * the codec per reference (~2 ms/row, 221 s on 100k images at sf0.1);
   * the native form is sub-second.
   */
  def aHash64(bytes: Column, factor: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.BmpAHashExpr(
      GraftBridge.expression(bytes),
      GraftBridge.expression(factor.cast(
        org.apache.spark.sql.types.IntegerType))))
  }

  /** The composed column form of [[aHash64]] (resize → pixels → gray →
    * grid-mean threshold) — kept as the executable specification of the
    * native expression; MediaDedupSpec asserts equality on real blobs. */
  def aHash64Composed(bytes: Column, factor: Column): Column = {
    val px = Multimodal.bmpPixels(Multimodal.bmpResize(bytes, factor))
    val gs = transform(px, gray(_))
    val mean = IntMath.idiv(aggregate(gs, lit(0L), _ + _), lit(64L))
    when(size(px) === 64, struct(
      packBits(gs, mean, 63, 32).as("phash_hi"),
      packBits(gs, mean, 31, 0).as("phash_lo")))
  }

  /**
   * Energy-descent audio fingerprint of a PCM16 WAV blob: frame into
   * `frameLen`-sample windows, bit f = energy(f) > energy(f+1), packed
   * LSB-first into a long. Null for malformed blobs or frame counts
   * outside [2, 64] (more than 64 frames would overflow the long).
   */
  def audioFingerprint(bytes: Column, frameLen: Column): Column = {
    val en = Multimodal.wavFrameEnergy(bytes, frameLen)
    val n = size(en)
    when(n >= 2 && n <= 64,
      aggregate(sequence(n - 2, lit(0), lit(-1)), lit(0L),
        (acc, f) => acc * lit(2L) +
          when(element_at(en, f + 1) > element_at(en, f + 2), 1L)
            .otherwise(0L)))
  }

  /**
   * Video-level perceptual signature: aHash every frame of a RIFF/AVI
   * container and fold the ORDERED hash sequence into one 31-bit
   * signature (acc = (acc·131 + hi·31 + lo) mod 2^31−1 per frame —
   * order-sensitive, so a re-cut with the same frames in a different
   * order signs differently). Same-content videos with per-frame pixel
   * jitter sign identically; null for malformed containers, frames the
   * aHash rejects, or zero frames.
   *
   * Backed by the codegen'd [[graft.functions.AviSignatureExpr]]: ONE
   * scan over the container bytes (parse header once, hash each movi
   * chunk in place, fold). The composed per-frame demux form is kept as
   * [[videoSignatureComposed]] — the executable specification
   * (MediaDedupSpec pins bit-equality) — but is O(frames × container
   * bytes) because each `aviFrame` call re-parses the container from the
   * top: a straggler shape for long videos at scale.
   */
  def videoSignature(bytes: Column, factor: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.AviSignatureExpr(
      GraftBridge.expression(bytes),
      GraftBridge.expression(factor.cast(
        org.apache.spark.sql.types.IntegerType))))
  }

  /** The composed column form of [[videoSignature]] (per-frame demux →
    * aHash → ordered fold) — kept as the executable specification of the
    * native one-scan expression; MediaDedupSpec asserts equality on real
    * containers. Not for hot paths: O(frames × container bytes). */
  def videoSignatureComposed(bytes: Column, factor: Column): Column = {
    val n = Multimodal.aviMeta(bytes).getField("n_frames")
    val hs = transform(sequence(lit(0L), n - 1L),
      f => aHash64(Multimodal.aviFrame(bytes, f), factor))
    when(n >= 1L && !exists(hs, _.isNull),
      aggregate(hs, lit(0L), (acc, h) => pmod(
        acc * lit(131L) + h.getField("phash_hi") * lit(31L) +
          h.getField("phash_lo"), lit(2147483647L))))
  }

  /** Explode an aHash into its `maxHamming + 1` contiguous-chunk LSH
    * bands as (band_id, band_val) — by pigeonhole a pair within the
    * hamming budget agrees exactly on at least one chunk, so an
    * equi-join on (band_id, band_val) is a lossless candidate gate at
    * that radius (Manku et al., WWW 2007 §3 — the [[graft.operators
    * .Dedup.simhashPairs]] chunk pattern over a 64-bit hash split as
    * two 32-bit halves). Chunk j covers full-hash bits
    * [j·width, j·width+bits); a chunk spanning the hi/lo boundary
    * stitches the lo tail under the hi head — all intermediates stay
    * < 2^32 so plain long arithmetic is exact. The default radius 3
    * reproduces the original 4×16-bit layout bit-for-bit. */
  private def bandCols(hi: Column, lo: Column, maxHamming: Int): Column = {
    val nBands = maxHamming + 1
    val width = 64 / nBands // last band takes the remainder bits
    array((0 until nBands).map { j =>
      val shift = j * width
      val bits = if (j == nBands - 1) 64 - shift else width
      val mask = (1L << bits) - 1
      if (shift + bits <= 32)
        shiftright(lo, shift).bitwiseAND(lit(mask))
      else if (shift >= 32)
        shiftright(hi, shift - 32).bitwiseAND(lit(mask))
      else // spans the hi/lo boundary: lo tail | hi head
        shiftright(lo, shift).bitwiseOR(
          shiftleft(hi.bitwiseAND(lit((1L << (shift + bits - 32)) - 1)),
            32 - shift)).bitwiseAND(lit(mask))
    }: _*)
  }

  /**
   * Banded near-duplicate candidate pairs over an image table:
   * (a_id, b_id, hamming) for every pair sharing ≥1 of the
   * `maxHamming + 1` contiguous hash chunks, each pair exactly once
   * (`distinct` collapses multi-band agreement). EXACT at hamming ≤
   * `maxHamming` (pigeonhole); higher-distance pairs appear only when
   * they happen to share a band. Shuffle carries (id, hi, lo, band)
   * longs only — image bytes never move past the signature scan.
   *
   * Radius/recall trade: larger `maxHamming` ⇒ more, narrower bands
   * (radius 7 ⇒ 8×8-bit chunks ⇒ only 256 buckets per band), so
   * incidental-collision candidate volume grows as n²/2^(64/(k+1)) —
   * at the 100 TB tier keep k ≤ 7 or pre-shard by a hash prefix.
   */
  def phashCandidatePairs(images: DataFrame, idCol: String,
      bytesCol: String, factor: Column, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming in [1,15], got $maxHamming")
    // stage the signatures: the full codec-chain hash (encode→resize→
    // pixels→threshold fold) feeds BOTH join sides — without staging each
    // side re-evaluates it per image (measured 2× the probe wall-clock)
    val h = graft.operators.Staging.stage(images
      .select(col(idCol).as("img_id"),
        aHash64(col(bytesCol), factor).as("h"))
      .filter(col("h").isNotNull)
      .select(col("img_id"), col("h.phash_hi").as("hi"),
        col("h.phash_lo").as("lo")))
    val bands = h.select(col("img_id"), col("hi"), col("lo"),
      posexplode(bandCols(col("hi"), col("lo"), maxHamming))
        .as(Seq("band_id", "band_val")))
    val a = bands.select(col("img_id").as("a_id"), col("hi").as("a_hi"),
      col("lo").as("a_lo"), col("band_id"), col("band_val"))
    val b = bands.select(col("img_id").as("b_id"), col("hi").as("b_hi"),
      col("lo").as("b_lo"), col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hi", "a_lo", "b_hi", "b_lo").distinct()
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast(LongType).as("hamming"))
  }
}
