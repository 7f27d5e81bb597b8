package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Codec-free multimodal payload dedup: exact content-hash identity, and
  * chunked byte-signature near-dup with hand-computable Jaccard values,
  * byte-faithful chunk boundaries under multi-byte UTF-8, and the
  * empty/null-payload exclusions. */
class MultimodalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def payloads(rows: (Long, String)*) =
    Multimodal.withPayload(rows.toDF("doc_id", "text"), "doc_id", "text")

  test("payloadContentDedup: identical bytes collapse, canonical = min id") {
    val df = payloads(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val out = Multimodal.payloadContentDedup(df, "doc_id")
      .collect().map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups"))
      .toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("payloadChunkSignatures: byte-faithful boundaries, short tail, dedup within doc") {
    // 24-byte payload, chunkBytes=8 -> 3 chunks; chunks 1 and 3 identical
    val df = payloads(1L -> ("ABCDEFGH" + "12345678" + "ABCDEFGH"))
    val sigs = Multimodal.payloadChunkSignatures(df, "doc_id", chunkBytes = 8)
    assert(sigs.count() == 2) // distinct within doc
    // 20-byte payload -> 2 full + 1 short chunk of 4 bytes
    val df2 = payloads(2L -> ("ABCDEFGH" + "12345678" + "WXYZ"))
    assert(Multimodal.payloadChunkSignatures(df2, "doc_id", 8).count() == 3)
    // multi-byte UTF-8: é is 2 bytes — 5 chars = 6 bytes -> one 6-byte chunk
    val df3 = payloads(3L -> "héllo")
    val one = Multimodal.payloadChunkSignatures(df3, "doc_id", 8)
    assert(one.count() == 1)
    // empty payload: no chunks
    assert(Multimodal.payloadChunkSignatures(payloads(4L -> ""), "doc_id", 8)
      .count() == 0)
  }

  test("payloadNearDupPairs: hand Jaccard, threshold cut, identity pair") {
    val c = (s: Char) => s.toString * 8 // one 8-byte chunk of repeated char
    // a: chunks {A,B,C,D}; b: {A,B,C,E} -> inter 3, union 5, j = 0.6
    // x: {A,Z,Y,W} vs a: inter 1, union 7, j ≈ 0.142857 — below threshold
    val df = payloads(
      1L -> (c('A') + c('B') + c('C') + c('D')),
      2L -> (c('A') + c('B') + c('C') + c('E')),
      3L -> (c('A') + c('Z') + c('Y') + c('W')),
      4L -> (c('A') + c('B') + c('C') + c('D'))) // exact dup of 1
    val out = Multimodal.payloadNearDupPairs(df, "doc_id", 8, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("jaccard"))
      .toMap
    assert(out.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out((1L, 2L)) == 0.6)
    assert(out((1L, 4L)) == 1.0)
  }

  test("payloadNearDupPairs: disjoint payloads produce no candidate pairs") {
    val df = payloads(1L -> ("A" * 32), 2L -> ("B" * 32))
    assert(Multimodal.payloadNearDupPairs(df, "doc_id", 8, 0.1).count() == 0)
  }
}
