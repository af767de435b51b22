package graft.functions

import graft.SparkSpec
import graft.functions.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("graft_dot equals the declarative aggregate/zip_with form on doubles") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
                 (Array(0.1, -0.2), Array(0.3, 0.4))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.dotCol(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dot widens float arrays per element (matches cast-then-multiply)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.5f, 2.25f, 0.1f), Array(3.5f, 0.5f, 0.1f))).toDF("fa", "fb")
    val r = df.select(
      GraftFunctions.dotCol(col("fa"), col("fb")).as("native"),
      expr("""aggregate(zip_with(transform(fa, x -> CAST(x AS DOUBLE)),
                                 transform(fb, x -> CAST(x AS DOUBLE)),
                                 (x, y) -> x * y), 0D, (acc, x) -> acc + x)""").as("hof"))
      .head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("two fused graft_dot calls in one projection produce correct results") {
    // Regression: fixed local names in doGenCode made two fused instances
    // collide in one whole-stage-codegen method (silent interpreted
    // fallback); freshName-based locals keep the fused form compiling.
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(
        GraftFunctions.dotCol(col("a"), col("b")).as("ab"),
        GraftFunctions.dotCol(col("a"), col("a")).as("aa"),
        sqrt(GraftFunctions.dotCol(col("b"), col("b"))).as("nb"))
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
  }

  test("graft_dot rejects non-numeric-array inputs at analysis") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((Array("x"), Array("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.dotCol(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("graft_dot raises on length mismatch in codegen and interpreted paths") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    // Codegen path (projection).
    val e1 = intercept[Exception] {
      df.select(GraftFunctions.dotCol(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage != null, "expected a raised error, got success")
    // Interpreted path: direct eval on Literal children.
    val e2 = intercept[Exception] {
      DotProductSpec.evalDirect(Array(1.0, 2.0, 3.0), Array(4.0, 5.0))
    }
    assert(e2.getMessage.contains("length mismatch"))
  }

  test("graft_dot skips null elements (0 contribution) in both paths") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array[java.lang.Double](1.0, null, 3.0),
                  Array[java.lang.Double](4.0, 5.0, null))).toDF("a", "b")
    // Codegen path: only index 0 contributes (1*4); indices with a null on
    // either side contribute 0.
    val viaCodegen = df.select(GraftFunctions.dotCol(col("a"), col("b")).as("d")).head().getDouble(0)
    assert(viaCodegen == 4.0)
    // Interpreted path: same semantics.
    assert(DotProductSpec.evalDirect(
      Array[java.lang.Double](1.0, null, 3.0),
      Array[java.lang.Double](4.0, 5.0, null)) == 4.0)
  }

  test("graft_dot is usable from SQL via extensions-style registration") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("dots")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM dots").head().getDouble(0) == 11.0)
  }
}

/** Drives the INTERPRETED eval path directly (Literal children + eval),
  * bypassing whole-stage codegen, so both execution paths are pinned. */
object DotProductSpec {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  def evalDirect(a: AnyRef, b: AnyRef): Any = {
    val t = ArrayType(DoubleType)
    graft.functions.expressions.DotProduct(Literal.create(a, t), Literal.create(b, t)).eval(null)
  }
}
