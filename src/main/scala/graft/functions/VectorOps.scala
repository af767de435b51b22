package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Vector kernels for the embedding queries.
  *
  * The declarative form — aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +) —
  * runs on the interpreted expression path (higher-order functions are
  * excluded from whole-stage codegen) and measured ~4× slower than a JVM
  * while-loop at sf0.1. The UDF keeps the exact fold-left order
  * (((0 + a0·b0) + a1·b1) + …), so results stay bit-identical to DuckDB's
  * list_reduce and the oracle compare is unaffected.
  */
object VectorOps {
  val dot: UserDefinedFunction = udf { (a: Array[Double], b: Array[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  val norm: UserDefinedFunction = udf { (a: Array[Double]) =>
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }
}
