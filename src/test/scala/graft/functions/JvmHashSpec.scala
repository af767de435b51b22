package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JvmHash must be value-identical to the PortableHash column expressions
  * (which in turn mirror the DuckDB oracle SQL fragments). */
class JvmHashSpec extends SparkSpec {

  test("h60 / h60p / seeded match the Spark column expressions") {
    import spark.implicits._
    val samples = Seq("", "a", "the quick fox", "key agg row", "ünïcödé",
      "x" * 100, "a b c", "0", "spark").toDF("s")
    val viaExpr = samples
      .select(col("s"),
        PortableHash.h60(col("s")).as("h"),
        PortableHash.h60p(col("s")).as("hp"),
        PortableHash.seeded(PortableHash.h60p(col("s")), lit(13)).as("sd"))
      .collect()
    viaExpr.foreach { r =>
      val s = r.getString(0)
      assert(JvmHash.h60(s) == r.getLong(1), s"h60 mismatch for <$s>")
      assert(JvmHash.h60p(s) == r.getLong(2), s"h60p mismatch for <$s>")
      assert(JvmHash.seeded(JvmHash.h60p(s), 13) == r.getLong(3), s"seeded mismatch for <$s>")
    }
  }
}
