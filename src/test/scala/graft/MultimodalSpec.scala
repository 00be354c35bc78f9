package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends GraftSpec {

  test("decode is deterministic, schema-stable, and shuffle-free") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf()))
    val out = Multimodal.decode(spark, media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "features"))
    val a = out.collect().sortBy(_.doc_id)
    val b = Multimodal.decode(spark, media).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.zip(b).forall { case (x, y) =>
      x.doc_id == y.doc_id && x.features.sameElements(y.features)
    })
    assert(a.forall(_.features.length == Multimodal.FakeCodec.Dim))
    // narrow op: partition count preserved (no shuffle introduced)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }
}
