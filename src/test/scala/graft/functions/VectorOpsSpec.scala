package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite

/** FloatVecDot must be bit-identical to the composable higher-order
  * formulation it replaces (same left-to-right double fold). */
class VectorOpsSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
    lit(0.0), (acc, v) => acc + v)

  test("vec_dot matches aggregate(zip_with(...)) bit-for-bit") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 0.125f), Seq(4.0f, 0.5f, -8.0f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      VectorOps.vecDot(spark, col("a"), col("b")).as("native"),
      hofDot.as("hof")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("vec_dot on the real embeddings matches the HOF form everywhere") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val diff = e.select(
      VectorOps.vecDot(spark, col("a"), col("b")).as("native"), hofDot.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("vec_dot_d (double kernel) matches the HOF fold bit-for-bit, incl. integer-code vectors") {
    val df = Seq(
      (Seq(1.5d, -2.25d, 0.125d), Seq(4.0d, 0.5d, -8.0d)),
      (Seq(127d, -127d, 64d), Seq(254000d, 254000d, 1d)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      VectorOps.vecDotD(spark, col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // and over the real embeddings cast to double (the k-means code path)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("a"))
      .select(col("a"), col("a").as("b"))
    val diff = e.select(
      VectorOps.vecDotD(spark, col("a"), col("b")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("vec_dot is null-safe and SQL-callable") {
    VectorOps.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("degenerate arrays: NULL element or length mismatch → NULL, matching the HOF fold") {
    // the HOF fold: zip_with pads a length mismatch with NULLs and a NULL
    // element NULLs its product → the whole sum is NULL. Both kernels are
    // SQL-registered and user-reachable, so they must agree (round-6
    // ADVICE fix: the old kernels read garbage from null slots and
    // silently truncated mismatched lengths).
    VectorOps.register(spark)
    val cases = Seq(
      // (sql expr, expect null)
      ("vec_dot_d(array(1.0D, CAST(NULL AS DOUBLE)), array(2.0D, 3.0D))", true),
      ("vec_dot_d(array(1.0D, 2.0D), array(2.0D, CAST(NULL AS DOUBLE)))", true),
      ("vec_dot_d(array(1.0D, 2.0D), array(2.0D))", true),
      ("vec_dot_d(array(1.0D, 2.0D), array(2.0D, 3.0D))", false),
      ("vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))", true),
      ("vec_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))", true))
    cases.foreach { case (expr, expectNull) =>
      val r = spark.sql(s"SELECT $expr").collect().head
      assert(r.isNullAt(0) == expectNull, expr)
    }
    // bit-parity with the HOF fold on the same degenerate inputs
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](2.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](2.0, 3.0))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    df.select(VectorOps.vecDotD(spark, col("a"), col("b")).as("n"), hof.as("h"))
      .collect().foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1))
        if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      }
  }
}
