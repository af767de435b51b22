package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * `ROUND(double, 2)` disagrees between engines at representational
  * boundaries (Spark rounds the shortest-decimal rendering HALF_UP via
  * BigDecimal; DuckDB rounds the binary value), e.g. a product whose
  * closest double sits at x.xx4999… vs the literal "x.xx5". Instead we pin
  * one IEEE-754 formula — floor(x*10^k + 0.5)/10^k — that both engines
  * evaluate with bit-identical double ops, so oracle hash-compares are
  * stable. The DuckDB twin is `FLOOR(x*100 + 0.5)/100` (see QueryPack).
  */
object Portable {
  /** Deterministic 2-decimal rounding; twin: FLOOR(x*100+0.5)/100. */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** Deterministic 4-decimal rounding; twin: FLOOR(x*10000+0.5)/10000. */
  def round4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** Deterministic 6-decimal rounding; twin: FLOOR(x*1e6+0.5)/1e6. */
  def round6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000

  /** 16-bit Morton interleave of two 8-bit dimensions as a Spark SQL
    * expression string — ONE definition shared by the q_zorder audit
    * query and FileSources.writeZOrdered so the layout and its audit
    * can't drift. `xe`/`ye` are raw (possibly signed/bigint) integer
    * expressions; pmod keeps negative values in [0, 256) (a signed `%`
    * would emit negative remainders and break z-range contiguity). */
  def mortonInterleaveSql(xe: String, ye: String): String = {
    val x = s"CAST(pmod($xe, 256) AS INT)"
    val y = s"CAST(pmod($ye, 256) AS INT)"
    (0 until 8).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})").mkString(" + ")
  }
}
