package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends AnyFunSuite with SparkSpec {
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val media = MediaPipeline.fromDocuments(docs)

  test("fromDocuments carries binary payload + typed metadata") {
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(r.meta.mime.startsWith("text/plain;lang="))
    assert(r.meta.nBytes == r.payload.length.toLong)
  }

  test("decode stub is deterministic and fixed-dimension") {
    val p = "hello".getBytes("UTF-8")
    val f1 = MediaPipeline.decodeStub(p)
    val f2 = MediaPipeline.decodeStub(p)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == MediaPipeline.FeatureDim)
    assert(MediaPipeline.decodeStub(Array.emptyByteArray).length == MediaPipeline.FeatureDim)
  }

  test("extractFeatures emits (id, features[dim]) for every record") {
    val feats = MediaPipeline.extractFeatures(media)
    assert(feats.count() == docs.count())
    val row = feats.head()
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == MediaPipeline.FeatureDim)
  }

  test("repartitionByBytes sizes partitions from a byte budget") {
    val ds = MediaPipeline.repartitionByBytes(media, totalBytes = 100000L, bytesPerPartition = 10000L)
    assert(ds.rdd.getNumPartitions == 10)
  }

  test("frames pipeline is byte-addressed on multi-byte text (may split codepoints)") {
    import spark.implicits._
    // 'é'/'ö' are 2 UTF-8 bytes each: 26 chars → 32 bytes → 3 full 10-byte
    // frames, and frame boundaries fall INSIDE codepoints — opaque-bytes
    // semantics.
    val text = "héllö wörld héllö wörld éö!"
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > 30 && bytes.length > text.length)
    val docs = Seq((1L, text, "fr", "test", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = MediaPipeline
      .sampleFrames(MediaPipeline.fromDocuments(docs), frameBytes = 10, everyK = 1)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    frames.foreach { r =>
      val idx = r.getInt(1)
      assert(r.getAs[Array[Byte]]("frame").toSeq == bytes.slice(idx * 10, idx * 10 + 10).toSeq)
    }
  }

  test("audioStats folds int16 LE samples exactly: energy, peak, crossings, odd tail") {
    import spark.implicits._
    // Samples: +1, -1, +256, -32768 (le bytes below), trailing odd byte dropped.
    val payload = Array[Byte](
      0x01, 0x00,              // +1
      0xff.toByte, 0xff.toByte, // -1
      0x00, 0x01,              // +256
      0x00, 0x80.toByte,       // -32768
      0x2a)                    // odd tail — dropped
    val one = Seq(MediaPipeline.MediaRecord(7L, payload,
      MediaPipeline.MediaMeta("audio/fake", 7L, payload.length.toLong))).toDS()
    val r = MediaPipeline.audioStats(one).head()
    assert(r.getAs[Long]("n_samples") == 4L)
    assert(r.getAs[Long]("sum_sq") == 1L + 1L + 256L * 256L + 32768L * 32768L)
    assert(r.getAs[Long]("peak_abs") == 32768L)
    // sign sequence +,-,+,- → 3 crossings
    assert(r.getAs[Long]("zero_cross") == 3L)
  }

  test("audioStats plan has no shuffle: stats stay in the decode partition") {
    val stats = MediaPipeline.audioStats(media)
    assert(!stats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sampleFrames slices every k-th fixed-size frame") {
    val payload = Array.tabulate(100)(_.toByte)
    import spark.implicits._
    val one = Seq(MediaPipeline.MediaRecord(1L, payload,
      MediaPipeline.MediaMeta("video/fake", 1L, 100L))).toDS()
    val frames = MediaPipeline.sampleFrames(one, frameBytes = 10, everyK = 2).collect()
    assert(frames.length == 5) // frames 0,2,4,6,8 of 10
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.head.getAs[Array[Byte]]("frame").toSeq == payload.slice(0, 10).toSeq)
  }
}
