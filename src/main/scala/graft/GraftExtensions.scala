package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{BloomContains, BloomSketchAgg, DotProduct, MinHashSketch}

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.GraftExtensions` to make graft's native
  * expressions available in any session (SQL included) without imperative
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "graft_minhash"),
      graft.functions.expressions.GraftFunctions.minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomSketchAgg].getName, "graft_bloom_agg"),
      graft.functions.expressions.GraftFunctions.bloomAggBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      graft.functions.expressions.GraftFunctions.bloomProbeBuilder))
  }
}
