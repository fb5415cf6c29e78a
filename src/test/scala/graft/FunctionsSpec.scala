package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFns, VectorFns}

class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("rollingHash matches the reference fold computed in plain Scala") {
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % TextFns.HashMod)
    val inputs = Seq("a", "abc", "the fast key", "")
    val got = inputs.toDF("s").select(TextFns.rollingHash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(fold))
  }

  test("shingles produce n-w+1 space-joined grams; short docs yield none beyond the text") {
    val got = Seq("a b c d", "a b", "a").toDF("t")
      .select(TextFns.shingles(TextFns.tokens(col("t")), 2))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b", "b c", "c d"), Seq("a b"), Seq()))
  }

  test("stopwordCount counts only list members") {
    val got = Seq("the a the b", "b c").toDF("t")
      .select(TextFns.stopwordCount(TextFns.tokens(col("t"))))
      .as[Int].collect().toSeq
    assert(got == Seq(3, 0))
  }

  test("cosine identities: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f)),
      (Array(1f, 0f), Array(0f, 3f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
    val got = df.select(round(VectorFns.cosine(col("a"), col("b")), 9)).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, -1.0))
  }

  test("signBucket packs sign bits little-endian over leading dims") {
    val df = Seq(
      Array(1f, -1f, 1f, -1f),   // bits 1,0,1,0 -> 5
      Array(-1f, -1f, -1f, -1f), // 0
      Array(1f, 1f, 1f, 1f))     // 15
      .toDF("v")
    val got = df.select(VectorFns.signBucket(col("v"), 4)).as[Int].collect().toSeq
    assert(got == Seq(5, 0, 15))
  }

  test("property: codegen DotProductF32 equals the HOF fold bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val got = df.select(
      VectorFns.dot(col("a"), col("b")).as("fast"),
      VectorFns.dotHof(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("DotProductF32 handles nulls and mismatched lengths") {
    val df = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(4f, 5f))), // min-length semantics
      (None, Some(Array(1f)))                          // null -> null
    ).toDF("a", "b")
    val got = df.select(VectorFns.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 14.0)
    assert(got(1).isNullAt(0))
  }

  test("graft_dot is registered as a SQL function via GraftExtensions") {
    val got = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .selectExpr("graft_dot(a, b)").as[Double].collect().head
    assert(got == 11.0)
  }

  test("dot is double-precision (no f32 drift on large values)") {
    val df = Seq((Array(1e7f, 1f), Array(1e7f, 1f))).toDF("a", "b")
    val got = df.select(VectorFns.dot(col("a"), col("b"))).as[Double].collect().head
    assert(got == 1e14 + 1.0)
  }
}
