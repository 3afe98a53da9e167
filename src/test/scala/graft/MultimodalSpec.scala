package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The multimodal plumbing around the stubbed decoder (SURVEY.md §2.11 E5):
  * schema, payload carriage, executor-side mapPartitions extraction, and
  * frame sampling must all behave like the real thing — only fakeDecode's
  * body is a placeholder.
  */
class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  test("attachPayload carries bytes + typed metadata") {
    val df  = Seq((1L, "ab"), (2L, "中")).toDF("id", "t")
    val out = Multimodal.attachPayload(df, "t", "image", "png")
    assert(out.schema("payload").dataType.typeName == "binary")
    // compare field names/types; literal-derived fields differ only in
    // nullability flags
    val metaFields = out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.MetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = out.orderBy("id").select("meta.n_bytes").as[Long].collect()
    assert(rows.toSeq == Seq(2L, 3L)) // "中" is 3 UTF-8 bytes
  }

  test("extractFeatures runs the (stub) decoder per partition with stable output") {
    val df  = Multimodal.attachPayload(Seq((1L, "abc")).toDF("id", "t"), "t", "image", "png")
    val out = Multimodal.extractFeatures(df).select("features.*").collect()(0)
    val (w, h, c) = Multimodal.fakeDecode("abc".getBytes("UTF-8"))
    assert((out.getInt(0), out.getInt(1), out.getLong(2)) == ((w, h, c)))
  }

  test("sampleUnits keeps every stride-th frame") {
    val df  = Seq((1L, Seq("f0", "f1", "f2", "f3", "f4"))).toDF("id", "frames")
    val out = Multimodal.sampleUnits(df, "frames", stride = 2)
      .select("unit").as[String].collect().toSeq
    assert(out == Seq("f0", "f2", "f4"))
  }
}
