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

  test("property: codegen StringPolyHash equals the HOF fold on random strings") {
    val rnd = new scala.util.Random(23)
    val inputs = Seq.fill(100)(rnd.alphanumeric.take(rnd.nextInt(60) + 1).mkString(" "))
    val df = inputs.toDF("s")
    val got = df.select(
      TextFns.rollingHash(col("s")).as("fast"),
      TextFns.rollingHashHof(col("s")).as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("property: BandedEditDistance equals the thresholded builtin levenshtein") {
    val rnd = new scala.util.Random(41)
    val alpha = "abcd " // small alphabet → high collision rate → edits of every size
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = Seq.tabulate(300) { i =>
      val a = word(rnd.nextInt(30))
      val b = i % 3 match {
        case 0 => word(rnd.nextInt(30)) // unrelated
        case 1 => // near-dup: shared prefix+suffix, small middle edit
          val mid = word(rnd.nextInt(4))
          a.take(a.length / 2) + mid + a.drop(a.length / 2)
        case _ => a // identical
      }
      (a, b, rnd.nextInt(8))
    } ++ Seq(("", "", 0), ("", "abc", 2), ("abc", "", 5), ("abc", "abc", 0),
      ("aa", "a", 1), ("a", "aa", 0))
    for ((a, b, t) <- pairs) {
      val fast = graft.functions.expr.EditDistOps.banded(a, b, t)
      val full = Seq((a, b)).toDF("a", "b")
        .select(levenshtein(col("a"), col("b"))).as[Int].head()
      val want = if (full <= t) full else -1
      assert(fast == want, s"a='$a' b='$b' t=$t fast=$fast full=$full")
    }
    // the codegen path end-to-end (Expression inside a projection)
    val df = pairs.toDF("a", "b", "t")
    val got = df.select(col("a"), col("b"),
        TextFns.bandedEditDist(col("a"), col("b"), 4).as("d4"),
        levenshtein(col("a"), col("b")).as("full")).collect()
    got.foreach { r =>
      val want = if (r.getInt(3) <= 4) r.getInt(3) else -1
      assert(r.getInt(2) == want, r.toString)
    }
  }

  test("property: BandedEditDistance counts code points on supplementary-plane text and survives huge thresholds") {
    // Round-9 ADVICE regressions: (a) non-BMP inputs must match the
    // builtin's CODE-POINT count (a char-indexed DP would charge an emoji
    // 2 edits); (b) t >= 2^30 must not overflow the band index or leak the
    // INF sentinel — the entry clamp bounds t at max(len).
    val rnd = new scala.util.Random(47)
    val cps = Seq(0x1F600, 0x1F4A9, 0x20000, 'a'.toInt, 'b'.toInt, 0x3042)
    def word(n: Int) =
      Seq.fill(n)(new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
    val pairs = Seq.tabulate(120) { i =>
      val a = word(rnd.nextInt(12))
      val b = if (i % 2 == 0) word(rnd.nextInt(12))
        else a.take(a.length / 2) + word(rnd.nextInt(3)) + a.drop(a.length / 2)
      (a, b, if (i % 5 == 0) Int.MaxValue - 1 else rnd.nextInt(8))
    } ++ Seq(
      ("😀", "a", 1),            // emoji vs letter: 1 substitution, not 2
      ("😀💩", "", 2), // two supplementary chars: distance 2
      ("abc", "abd", Int.MaxValue),        // huge threshold on BMP text
      ("", "", Int.MaxValue))
    for ((a, b, t) <- pairs) {
      val fast = graft.functions.expr.EditDistOps.banded(a, b, t)
      val full = Seq((a, b)).toDF("a", "b")
        .select(levenshtein(col("a"), col("b"))).as[Int].head()
      val want = if (full <= t) full else -1
      assert(fast == want, s"a='$a' b='$b' t=$t fast=$fast full=$full")
    }
  }

  test("property: fused CosineSimF32 equals the composed dot/norm form bit-for-bit") {
    val rnd = new scala.util.Random(31)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val got = df.select(
      VectorFns.cosine(col("a"), col("b")).as("fused"),
      VectorFns.cosineComposed(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("property: TopKAggregator equals sort-take under random insert orders and merges") {
    val rnd = new scala.util.Random(43)
    val agg = new graft.functions.TopKAggregator(3)
    for (_ <- 1 to 40) {
      val rows = Seq.fill(rnd.nextInt(12))((rnd.nextInt(5).toDouble, rnd.nextLong().abs))
      val expect = rows.sortBy(r => (-r._1, r._2)).take(3)
      // single-buffer reduction in arrival order
      val direct = rows.foldLeft(agg.zero)(agg.reduce)
      assert(direct == expect, s"direct $rows")
      // arbitrary split into two partial buffers, then merge
      val (l, r) = rows.splitAt(if (rows.isEmpty) 0 else rnd.nextInt(rows.size + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expect, s"merged $rows split at ${l.size}")
    }
  }

  test("property: fused SqL2DistF32 equals the composed three-dot form bit-for-bit") {
    val rnd = new scala.util.Random(37)
    val vecs = Seq.fill(50)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val got = df.select(
      VectorFns.sqL2(col("a"), col("b")).as("fused"),
      VectorFns.sqL2Composed(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("shingles produce n-w+1 space-joined grams; short docs yield none beyond the text") {
    val got = Seq("a b c d", "a b", "a").toDF("t")
      .select(TextFns.shinglesHof(TextFns.tokens(col("t")), 2))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b", "b c", "c d"), Seq("a b"), Seq()))
  }

  test("property: TokenShingles expression equals the HOF form (incl. empty-token edges)") {
    val rnd = new scala.util.Random(41)
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val inputs = Seq.fill(60)(Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" ")) ++
      Seq("", "a", "a ", " a", "a  b") // empty/trailing/leading/double-space edges
    for (w <- Seq(2, 3)) {
      val got = inputs.toDF("t").select(
        TextFns.shinglesFromText(col("t"), w).as("fast"),
        TextFns.shinglesHof(TextFns.tokens(col("t")), w).as("ref")).collect()
      got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    }
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

  test("property: unrolled signBucketAt equals the interpreted-HOF fold, nulls included (round 21)") {
    // The old spelling, reconstructed: aggregate(transform(sequence(...)))
    // — the interpreted fold the round-21 unroll replaced.
    def hofForm(v: org.apache.spark.sql.Column, offset: Int, bits: Int) =
      aggregate(
        transform(
          sequence(lit(0), lit(bits - 1)),
          j => when(get(v, j + offset) > 0, pow(lit(2.0), j).cast("int")).otherwise(lit(0))),
        lit(0),
        (acc, x) => acc + x)
    val rnd = new scala.util.Random(17)
    val vecs: Seq[Array[Float]] =
      Seq.fill(40)(Array.fill(64)(rnd.nextFloat() * 2 - 1)) :+
        (null: Array[Float]) // null vector must stay null through both spellings
    val df = vecs.toDF("v")
    for ((offset, bits) <- Seq((0, 4), (0, 8), (24, 8), (56, 8))) {
      val got = df.select(
        VectorFns.signBucketAt(col("v"), offset, bits).as("fast"),
        hofForm(col("v"), offset, bits).as("ref")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch at ($offset,$bits)")
        if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), s"value mismatch at ($offset,$bits)")
      }
    }
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

  test("MinHashAggregator equals the DataFrame min-over-affine formulation") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(100000).toLong))
    val ds = rows.toDF("doc_id", "h").as[(Long, Long)]

    val typed = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinHashAggregator(8).toColumn.name("sig"))
      .collect().toMap.view.mapValues(_.toSeq).toMap

    val frame = rows.toDF("doc_id", "h")
      .withColumn("i", explode(sequence(lit(0), lit(7))))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(TextFns.affineHash(col("h"), col("i"))).as("minh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("i"), col("minh")))).as("s"))
      .select(col("doc_id"), transform(col("s"), p => p.getField("minh")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(typed == frame)
  }

  test("MinHashAggregator input mapping: typed agg consumes the shingle hash column") {
    // known-value check: the aggregator folds the mapped hash member
    val ds = Seq((1L, 10L), (1L, 3L), (2L, 7L)).toDS()
    val sig = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinHashAggregator(2).toColumn.name("sig"))
      .collect().toMap
    // key 1: min over h∈{10,3}: i=0: (3h+7)%P -> min(37,16)=16; i=1: (5h+18)%P -> min(68,33)=33
    assert(sig(1L).toSeq == Seq(16L, 33L))
    assert(sig(2L).toSeq == Seq(3L * 7 + 7, 5L * 7 + 18))
  }

  test("dot is double-precision (no f32 drift on large values)") {
    val df = Seq((Array(1e7f, 1f), Array(1e7f, 1f))).toDF("a", "b")
    val got = df.select(VectorFns.dot(col("a"), col("b"))).as[Double].collect().head
    assert(got == 1e14 + 1.0)
  }

  test("property: codegen ByteGradientHash equals the reference fold, incl. short payloads") {
    def ref(bytes: Array[Byte]): Long = {
      val n = bytes.length
      val s = new Array[Long](33)
      val c = new Array[Long](33)
      for (i <- 0 until n) {
        val b = ((i.toLong * 33L) / n).toInt
        s(b) += (bytes(i) & 0xff).toLong
        c(b) += 1L
      }
      (0 until 32).foldLeft(0L)((h, b) =>
        if (s(b) * c(b + 1) > s(b + 1) * c(b)) h | (1L << b) else h)
    }
    val rnd = new scala.util.Random(53)
    // lengths straddle the 33-byte block boundary: empty-block semantics,
    // exactly-33, and long payloads all pinned
    val inputs = (Seq(1, 5, 32, 33, 34) ++ Seq.fill(40)(rnd.nextInt(600) + 1))
      .map(len => Array.fill(len)(rnd.nextInt(256).toByte))
    val got = inputs.toDF("b")
      .select(graft.multimodal.MediaPipeline.phash(col("b"))).as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("ByteGradientHash is stable under near-duplication (tail truncation)") {
    // Gradient hashes are stable for SMOOTH signals (decoded images/audio),
    // not white noise — use a slow sinusoid, the shape a real decoder emits.
    val base = Array.tabulate(400)(i =>
      (128 + 100 * math.sin(i / 20.0)).toInt.toByte)
    val trunc = base.take(390) // a re-encode/truncated-tail near-dup
    val hs = Seq(base, trunc).toDF("b")
      .select(graft.multimodal.MediaPipeline.phash(col("b"))).as[Long].collect()
    val dist = java.lang.Long.bitCount(hs(0) ^ hs(1))
    assert(dist <= 6, s"near-dup payloads should stay Hamming-close, got $dist")
    // and an unrelated signal (phase-shifted) is NOT close
    val other = Array.tabulate(400)(i =>
      (128 + 100 * math.sin(i / 20.0 + math.Pi)).toInt.toByte)
    val hs2 = Seq(base, other).toDF("b")
      .select(graft.multimodal.MediaPipeline.phash(col("b"))).as[Long].collect()
    assert(java.lang.Long.bitCount(hs2(0) ^ hs2(1)) > 6)
  }
}
