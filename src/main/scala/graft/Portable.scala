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
}
