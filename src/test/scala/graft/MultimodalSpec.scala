package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalPipeline
import graft.multimodal.MultimodalPipeline._

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val items = MultimodalPipeline.ingestFromDocuments(spark, sfDir)

  test("ingest builds typed binary rows with modality and metadata") {
    val rows = items.collect()
    assert(rows.length == 500)
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
    rows.foreach { m =>
      assert(m.payload.nonEmpty)
      assert(m.meta.mime == s"application/x-fake-${m.modality}")
      assert(m.meta.width >= 1 && m.meta.height >= 1)
    }
  }

  test("feature extraction is deterministic and matches the local stub") {
    val feats = extractFeatures(items).collect().map(f => f.id -> f).toMap
    val local = items.collect()
    local.foreach { m =>
      val expected = FakeDecoder.decode(m.payload)
      assert(feats(m.id).features.toSeq == expected.toSeq, s"id ${m.id}")
      assert(feats(m.id).features.forall(f => f >= 0f && f < 1f))
    }
    // repartitioning must not change anything (mapPartitions purity)
    val feats2 = extractFeatures(items.repartition(7)).collect()
      .map(f => f.id -> f.features.toSeq).toMap
    assert(feats2 == feats.map { case (k, v) => k -> v.features.toSeq })
  }

  test("frame sampling emits duration/step + 1 frames per video item") {
    val counts = sampleFrames(items, everyMs = 1000L)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    val videos = items.filter(_.modality == "video").collect()
    assert(videos.nonEmpty)
    videos.foreach { m =>
      assert(counts(m.id) == m.meta.durationMs / 1000 + 1, s"id ${m.id}")
    }
  }

  test("resizeMeta rewrites metadata only") {
    val r = resizeMeta(items, 224, 224).collect()
    assert(r.forall(m => m.meta.width == 224 && m.meta.height == 224))
    assert(r.map(_.id).sorted.toSeq == items.collect().map(_.id).sorted.toSeq)
  }
}
