package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Multi-dimensional data-layout planning: Z-order (Morton) interleaving and
 * the clustering report that justifies it. At 100 TB the dominant cost of a
 * two-predicate scan is how many files a `WHERE x BETWEEN … AND y BETWEEN …`
 * must touch; sorting by a Morton code of both columns keeps BOTH ranges
 * narrow per file, where a lexicographic sort keeps only the leading one
 * narrow. Public technique (Morton 1966; Delta/Iceberg both expose it as
 * Z-ORDER clustering). Everything here is integer-exact so the DuckDB oracle
 * reproduces the layout bit-for-bit.
 */
object Layout {

  /** Morton code of two non-negative ints, `bits` bits each, LSB-first
    * interleave (x even positions, y odd): Σᵢ ((x≫i)&1)·2²ⁱ + ((y≫i)&1)·2²ⁱ⁺¹.
    * Closed-form column expression — 2·`bits` codegen'd shift/mask terms,
    * no UDF. */
  def mortonValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        (shiftright(x, i).cast(LongType) % 2L) * lit(1L << (2 * i)) +
        (shiftright(y, i).cast(LongType) % 2L) * lit(2L << (2 * i))
    }
  }

  /**
   * Z-order layout plan over two integer columns: min-max-scale each to
   * `bits` bits, Morton-interleave, split the code space into `nFiles`
   * equal ranges by its top bits, and report each would-be file's row
   * count and PER-DIMENSION min/max — the fraction of files a range
   * predicate on EITHER column would touch is the layout's quality,
   * readable straight off the report.
   *
   * Shape at 100 TB: one bounded 1-row min/max aggregate, then a single
   * partial-agg groupBy on the file id — the plan itself (assign + write
   * by `zfile`) is a `repartitionByRange(col("zval"))` away and shuffles
   * once. log₂(nFiles) must be ≤ 2·bits (the code must have enough top
   * bits to split on).
   *
   * Output per file (ordered): (zfile, n, min_x, max_x, min_y, max_y).
   */
  def zOrderLayout(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, nFiles: Int = 16): DataFrame = {
    require(nFiles >= 2 && Integer.bitCount(nFiles) == 1,
      s"nFiles must be a power of two >= 2, got $nFiles")
    val fileBits = 31 - Integer.numberOfLeadingZeros(nFiles)
    require(fileBits <= 2 * bits,
      s"nFiles=$nFiles needs $fileBits top bits but the code has ${2 * bits}")
    val v = df.select(col(xCol).cast(LongType).as("x"),
        col(yCol).cast(LongType).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val mm = v.agg(min("x"), max("x"), min("y"), max("y"), count(lit(1)))
      .head()
    if (mm.getLong(4) == 0L)
      return v.groupBy(lit(0L).as("zfile")).agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y")).limit(0)
    val top = (1L << bits) - 1L
    def scale(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else IntMath.idiv((c - lit(lo)) * lit(top), lit(hi - lo))
    val z = v.select(col("x"), col("y"),
      mortonValue(scale(col("x"), mm.getLong(0), mm.getLong(1)),
        scale(col("y"), mm.getLong(2), mm.getLong(3)), bits).as("zval"))
    z.withColumn("zfile",
        shiftright(col("zval"), 2 * bits - fileBits).cast(LongType))
      .groupBy("zfile")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("zfile")
  }
}
