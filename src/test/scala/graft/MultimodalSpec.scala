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

  test("resize downsamples to n bytes; batched decode equals per-record decode") {
    import spark.implicits._
    val resized = MultimodalOps.resize(MultimodalOps.asBinaryTable(spark, sf0001), 16)
      .select(col("doc_id"), octet_length(col("resized")).as("nr"), col("n_bytes"))
      .collect()
    assert(resized.forall(r =>
      r.getAs[Int]("nr") == math.min(16, r.getAs[Int]("n_bytes"))))
    val ds = MultimodalOps.asBinaryTable(spark, sf0001).as[MultimodalOps.MmRecord]
    val a = MultimodalOps.decodeBatched(ds, 64).collect().sortBy(_.doc_id)
    val b = ds.mapPartitions(_.map(MultimodalOps.decodeStub)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling keeps every k-th byte") {
    val df = MultimodalOps.frameSample(MultimodalOps.asBinaryTable(spark, sf0001), 10)
    val r = df.select(col("n_bytes"), size(col("frames")).as("nf")).first()
    val expected = (r.getAs[Int]("n_bytes") + 9) / 10
    assert(r.getAs[Int]("nf") == expected)
  }

  test("embed stub is deterministic, unit-norm, and separates distributions") {
    import graft.operators.MultimodalOps.embedStub
    val a = embedStub("hello world hello world".getBytes("UTF-8"))
    val b = embedStub("hello world hello world".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    val c = embedStub(Array.fill[Byte](64)(0x01))
    val dot = a.zip(c).map { case (x, y) => x.toDouble * y }.sum
    assert(dot < 0.999, "disjoint byte distributions must not near-dup")
  }

  test("multimodal embed-dedup pipeline runs end to end with exact verify") {
    val pairs = graft.operators.MultimodalOps.embedDedup(spark, sf0001).collect()
    pairs.foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.999)
      assert(r.getAs[Long]("v1") < r.getAs[Long]("v2"))
    }
  }
}
