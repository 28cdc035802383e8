package graft

import org.apache.spark.sql.functions._

import graft.functions.vec

/** graft.functions custom Catalyst expressions (SURVEY §4). */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine matches the aggregate/zip_with formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6)),
      (Array(1e-8, 2e8, -3.5), Array(7.1, -2.2, 0.0))
    ).toDF("a", "b")
    val builtin = df.select(
      (expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
        (sqrt(expr("aggregate(transform(a, x -> x * x), 0D, (acc, x) -> acc + x)")) *
          sqrt(expr("aggregate(transform(b, x -> x * x), 0D, (acc, x) -> acc + x)"))))
        .as("c")).collect().map(_.getDouble(0))
    val custom = df.select(vec.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(custom.sameElements(builtin)) // exact, not approximate
  }

  test("fast_md5 matches the built-in md5 exactly") {
    val df = Tables.t(spark, Sf, "documents").select(col("text"))
    val mismatches = df.select(
      md5(col("text").cast("binary")).as("builtin"),
      graft.functions.hashes.md5(col("text")).as("fast"))
      .filter(col("builtin") =!= col("fast"))
    assert(mismatches.count() == 0)
    // null propagation
    assert(spark.sql("SELECT 1").select(
      graft.functions.hashes.md5(lit(null).cast("string"))).head.isNullAt(0))
  }

  test("cosine is null on zero-norm input, mirroring Divide semantics") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(vec.cosine(col("a"), col("b"))).head.isNullAt(0))
  }

  test("cosine participates in whole-stage codegen") {
    val df = Tables.t(spark, Sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(vec.cosine(col("v"), col("v")).as("c"))
    // "*(n)" prefixes mark operators fused into WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_similarity"))
    assert(df.filter(abs(col("c") - 1.0) > 1e-9).count() == 0) // self-cosine ≈ 1
  }
}
