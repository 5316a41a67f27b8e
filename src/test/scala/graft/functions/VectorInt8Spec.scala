package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity gate for the r20 fused int8 quantization: [[VectorInt8]] must
  * reproduce the ORIGINAL interpreted lambda chain
  * (`greatest(array_max(transform(abs)), 1e-30)/127` +
  * `transform(floor(x/scale+0.5) as tinyint)`) bit-for-bit on the edge
  * cases the fused loop hand-implements: null vectors, empty vectors,
  * null elements, all-null vectors, NaN, ±0.0, zero vectors, and plain
  * float/double data. */
class VectorInt8Spec extends SparkSpec {

  private def fused(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.graftops.PlanApi
    val q = PlanApi.column(VectorInt8(PlanApi.expression(col("vec"))))
    df.select(col("id"), q.as("_q"))
      .select(col("id"), col("_q.scale").as("scale"), col("_q.qvec").as("qvec"))
  }

  private def lambdaChain(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("vec"))
      .withColumn("vecd", transform(col("vec"), x => x.cast("double")))
      .withColumn("scale",
        greatest(array_max(transform(col("vecd"), x => abs(x))), lit(1e-30)) / 127.0)
      .withColumn("qvec",
        transform(col("vecd"), x => floor(x / col("scale") + 0.5).cast("tinyint")))
      .select(col("id"), col("scale"), col("qvec"))

  private def assertParity(rows: Seq[(Long, Seq[java.lang.Float])]): Unit = {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val a = fused(df).collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2))).toSeq
      .sortBy(_._1)
    val b = lambdaChain(df).collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2))).toSeq
      .sortBy(_._1)
    // compare scale bits (exact IEEE) and code sequences incl. nulls
    a.zip(b).foreach { case ((ia, sa, qa), (ib, sb, qb)) =>
      assert(ia === ib)
      assert(java.lang.Double.doubleToLongBits(sa) ===
        java.lang.Double.doubleToLongBits(sb), s"scale for id $ia")
      assert(String.valueOf(qa) === String.valueOf(qb), s"qvec for id $ia")
    }
  }

  test("fused int8 ≡ lambda chain on plain and adversarial vectors") {
    assertParity(Seq(
      (0L, Seq[java.lang.Float](1.0f, -2.5f, 127.0f, 0.004f)),
      (1L, Seq[java.lang.Float](0.0f, -0.0f, 0.0f)),            // zero vector -> 1e-30 floor
      (2L, Seq[java.lang.Float]()),                              // empty -> scale floor, [] codes
      (3L, Seq[java.lang.Float](null, 3.0f, null)),              // null elements skipped/kept
      (4L, Seq[java.lang.Float](null, null)),                    // all-null -> scale floor
      (5L, Seq[java.lang.Float](Float.NaN, 1.0f)),               // NaN greatest, NaN codes
      (6L, Seq[java.lang.Float](-127.5f, 63.25f, -0.75f)),
      (7L, Seq[java.lang.Float](Float.MaxValue, Float.MinPositiveValue))))
  }

  test("null input vector: qvec null, scale at the 1e-30 floor") {
    import spark.implicits._
    val df = Seq((0L, Option.empty[Seq[Float]]),
        (1L, Some(Seq(2.0f, 4.0f)))).toDF("id", "vec")
    val a = fused(df).orderBy("id").collect()
    val b = lambdaChain(df).orderBy("id").collect()
    assert(a(0).isNullAt(2) && b(0).isNullAt(2))
    assert(java.lang.Double.doubleToLongBits(a(0).getDouble(1)) ===
      java.lang.Double.doubleToLongBits(b(0).getDouble(1)))
    assert(String.valueOf(a(1).get(2)) === String.valueOf(b(1).get(2)))
  }

  test("double-element arrays take the non-cast path with identical codes") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, -2.5, 126.99)), (1L, Seq(0.5, 0.5))).toDF("id", "vec")
    val a = fused(df).orderBy("id").collect()
    val b = lambdaChain(df).orderBy("id").collect()
    (0 to 1).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(a(i).getDouble(1)) ===
        java.lang.Double.doubleToLongBits(b(i).getDouble(1)))
      assert(String.valueOf(a(i).get(2)) === String.valueOf(b(i).get(2)))
    }
  }

  test("quantizeInt8 accepts non-float/double numeric arrays (r21 ADVICE)") {
    // the pre-r20 lambda chain cast ANY numeric element type to double;
    // the fused VectorInt8 only takes array<float|double>, so the
    // operator must project the widening cast in front for e.g.
    // array<int> vectors — and match the lambda chain's output exactly
    import spark.implicits._
    val df = Seq((0L, Seq(1, -2, 127)), (1L, Seq(0, 0)), (2L, Seq.empty[Int]))
      .toDF("id", "vec")
    val a = graft.operators.Similarity.quantizeInt8(df, "id", "vec")
      .orderBy("id").collect()
    val b = lambdaChain(df).orderBy("id").collect()
    (0 to 2).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(a(i).getDouble(1)) ===
        java.lang.Double.doubleToLongBits(b(i).getDouble(1)), s"scale row $i")
      assert(String.valueOf(a(i).get(2)) === String.valueOf(b(i).get(2)), s"qvec row $i")
    }
  }
}
