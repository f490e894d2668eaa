package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.{MediaRow, StubCodec}

/** Multimodal plumbing tests (SURVEY.md §2.11 E4): schema, determinism,
  * batch shape, frame fan-out — everything except the codec itself,
  * which is a documented stub.
  */
class MultimodalSpec extends SparkSpec {

  private val docsDir = "/root/testdata/sf0.001"

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet(s"$docsDir/documents.parquet"))

  test("media table matches the declared schema (names and types)") {
    def shape(s: org.apache.spark.sql.types.DataType): Any = s match {
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.map(f => (f.name, shape(f.dataType))).toSeq
      case dt => dt
    }
    assert(shape(media.toDF().schema) == shape(Multimodal.mediaSchema))
  }

  test("feature extraction: deterministic, fixed dim, full coverage") {
    val f1 = Multimodal.extractFeatures(media).collect()
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == StubCodec.FeatureDim))
    val m1 = f1.map(r => r.doc_id -> r.features.toSeq).toMap
    f2.foreach(r => assert(m1(r.doc_id) == r.features.toSeq))
    // features reflect content: not all rows identical
    assert(f1.map(_.features.toSeq).distinct.length > 1)
  }

  test("batch shape: codec sees batches of at most batchSize") {
    import spark.implicits._
    // drives Multimodal.batches — the SAME seam extractFeatures and
    // extractFeaturesPortable chunk through — not a test-local
    // re-grouping, so a production change to whole-partition slices
    // fails here
    val sizes = Multimodal
      .repartitionForDecode(media, 4)
      .mapPartitions(rows => Multimodal.batches(rows, 8).map(_.size))
      .collect()
    assert(sizes.forall(_ <= 8))
    assert(sizes.exists(_ == 8)) // partitions are big enough to fill one
    assert(sizes.sum == media.count())
  }

  test("repartitionForDecode controls task count") {
    assert(Multimodal.repartitionForDecode(media, 4)
      .rdd.getNumPartitions == 4)
  }

  test("frame sampling fans out n frames per row") {
    val frames = Multimodal.sampleFrames(media, 3)
    val n = media.count()
    assert(frames.count() == 3 * n)
    import spark.implicits._
    val perDoc = frames.groupByKey(_.doc_id).count().collect()
    assert(perDoc.forall(_._2 == 3))
    // frames are non-empty payload windows
    assert(frames.collect().forall(_.frame.nonEmpty))
  }

  test("stub codec: resize keeps every stride-th byte") {
    val payload = Array.tabulate[Byte](10)(_.toByte)
    assert(StubCodec.resize(payload, 3).toSeq ==
      Seq[Byte](0, 3, 6, 9))
  }
}
