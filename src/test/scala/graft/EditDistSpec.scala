package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Planted semantics for the fuzzy (edit-distance) near-dup operator:
  * a one-typo clone must surface with the exact Levenshtein cost, an
  * unrelated doc must not pair, and normalization must divide by the
  * longer side.
  */
class EditDistSpec extends SparkSpecBase {
  import spark.implicits._

  test("edit-distance near-dup: typo clone found with exact DP cost; unrelated absent") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    // one character substituted inside one token -> edit distance exactly 1
    val typo = base.replace("tok7 ", "tok# ")
    val other = (1 to 30).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, typo), (3L, other)).toDF("doc_id", "text")
    val out = DedupOps.editDistPairsOn(docs).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"typo clone not found: ${out.mkString(";")}")
    assert(pair.get.getLong(2) == 1L, s"edit dist should be exactly 1: ${pair.get}")
    assert(pair.get.getDouble(3) == 1.0 / base.length,
      "normalization must divide by the longer text")
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "unrelated doc must not pair")
  }
}
