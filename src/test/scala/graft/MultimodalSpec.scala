package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpecBase {

  test("binary table carries payload + typed metadata") {
    val bt = MultimodalOps.asBinaryTable(spark, sf0001)
    assert(bt.schema("payload").dataType.typeName == "binary")
    val r = bt.first()
    assert(r.getAs[String]("mime") == "text/plain")
    assert(r.getAs[Int]("n_bytes") == r.getAs[Array[Byte]]("payload").length)
  }

  test("decode stub is deterministic and checksum matches recomputation") {
    val f1 = MultimodalOps.binaryFeatures(spark, sf0001).collect()
    val f2 = MultimodalOps.binaryFeatures(spark, sf0001).collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    val bytes = MultimodalOps.asBinaryTable(spark, sf0001)
      .orderBy("doc_id").first().getAs[Array[Byte]]("payload")
    var cs = 0L
    bytes.foreach(b => cs = (cs * 31 + (b & 0xff)) & 0xFFFFFFFFL)
    assert(f1.minBy(_.getAs[Long]("doc_id")).getAs[Long]("checksum") == cs)
  }

  test("frame sampling keeps every k-th byte") {
    val df = MultimodalOps.frameSample(MultimodalOps.asBinaryTable(spark, sf0001), 10)
    val r = df.select(col("n_bytes"), size(col("frames")).as("nf")).first()
    val expected = (r.getAs[Int]("n_bytes") + 9) / 10
    assert(r.getAs[Int]("nf") == expected)
  }
}
