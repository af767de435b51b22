package graft.multimodal

/** Band layouts for LSH-for-Hamming candidate generation over a 64-bit
  * perceptual hash stored as two nonnegative 32-bit halves (h_hi, h_lo).
  *
  * Guarantee (pigeonhole): with t+1 pairwise-disjoint bands covering all
  * 64 bits, any two hashes at hamming distance ≤ t agree on at least one
  * whole band — so banded candidate generation has NO false negatives at
  * the verify threshold. A 4×16-bit split (the round-16 shape) only
  * guarantees recall for t ≤ 3; the aHash verify runs at t = 8 and the
  * pHash verify at t = 6, so those need 9 and 7 bands respectively.
  *
  * Bands live inside one 32-bit half each (no 64-bit recombine: both
  * engines then band nonnegative values with plain shift-and-mask and no
  * sign-bit hazard). Each band is (half, shift, mask).
  */
object HammingBands {

  type Band = (String, Int, Long)

  /** 9 disjoint bands (widths 7,7,6,6,6 | 8,8,8,8) — exact recall for
    * hamming ≤ 8, the aHash verify threshold. */
  val ahash: Seq[Band] = Seq(
    ("h_hi", 25, 0x7FL), ("h_hi", 18, 0x7FL), ("h_hi", 12, 0x3FL),
    ("h_hi", 6, 0x3FL), ("h_hi", 0, 0x3FL),
    ("h_lo", 24, 0xFFL), ("h_lo", 16, 0xFFL), ("h_lo", 8, 0xFFL),
    ("h_lo", 0, 0xFFL))

  /** 7 disjoint bands (widths 8,8,8,8 | 11,11,10) — exact recall for
    * hamming ≤ 6, the pHash verify threshold. */
  val phash: Seq[Band] = Seq(
    ("h_hi", 24, 0xFFL), ("h_hi", 16, 0xFFL), ("h_hi", 8, 0xFFL),
    ("h_hi", 0, 0xFFL),
    ("h_lo", 21, 0x7FFL), ("h_lo", 10, 0x7FFL), ("h_lo", 0, 0x3FFL))

  /** The round-16 4×16-bit chunk layout — kept ONLY for the recall spec
    * that pins what the t+1 layouts fix. */
  val legacy16: Seq[Band] = Seq(
    ("h_hi", 16, 0xFFFFL), ("h_hi", 0, 0xFFFFL),
    ("h_lo", 16, 0xFFFFL), ("h_lo", 0, 0xFFFFL))

  /** Band values of one hash — the Scala twin of the SQL CASE, for
    * specs and staging. */
  def values(bands: Seq[Band], hi: Long, lo: Long): Seq[Long] =
    bands.map { case (h, off, m) => ((if (h == "h_hi") hi else lo) >> off) & m }

  /** True iff two hashes collide on at least one band (i.e. would meet
    * as a banded candidate pair). */
  def collide(bands: Seq[Band], a: (Long, Long), b: (Long, Long)): Boolean =
    values(bands, a._1, a._2).zip(values(bands, b._1, b._2)).exists(p => p._1 == p._2)

  /** `CASE <ck> WHEN i THEN (half >> shift) & mask … END` with a
    * dialect-specific shift spelling (Spark `shiftright(h, n)`,
    * DuckDB `(h >> n)`). */
  def caseSql(bands: Seq[Band], ck: String,
              shift: (String, Int) => String): String =
    bands.zipWithIndex.map { case ((h, off, m), i) =>
      val v = if (off == 0) h else shift(h, off)
      s"WHEN $i THEN $v & CAST($m AS BIGINT)"
    }.mkString(s"CASE $ck ", " ", " ELSE NULL END")

  def sparkCaseSql(bands: Seq[Band], ck: String = "ck"): String =
    caseSql(bands, ck, (h, n) => s"shiftright($h, $n)")

  def duckCaseSql(bands: Seq[Band], ck: String = "ck"): String =
    caseSql(bands, ck, (h, n) => s"($h >> $n)")
}
