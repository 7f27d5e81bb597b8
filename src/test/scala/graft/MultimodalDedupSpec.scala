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

  test("payloadShards: first-byte rule, contiguous shard ids, permutation-stable across layouts") {
    val df = payloads((0L until 200L).map(i => i -> ("x" * (40 + (i % 97)).toInt)): _*)
    val out = Multimodal.payloadShards(df, "doc_id", shardBytes = 2048)
      .select("doc_id", "payload_bytes", "cum_bytes", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 200)
    out.foreach { case (id, bytes, cum, shard) =>
      assert(shard === (cum - bytes) / 2048, s"doc $id violates the first-byte rule")
    }
    // shard ids cover 0..max with none skipped (concat-and-chunk leaves no
    // empty shard), and the running total is consistent: per-shard first
    // bytes are ordered
    val shards = out.map(_._4).distinct.sorted
    assert(shards === (0L to shards.max).toArray)
    // a different physical layout folds to the identical assignment
    val re = Multimodal.payloadShards(df.repartition(13), "doc_id", 2048)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === out.map(t => t._1 -> t._4).toMap)
    // null payloads are excluded
    val withNull = payloads(1L -> "abc")
      .unionByName(payloads(2L -> "ignored")
        .withColumn("payload", lit(null).cast("binary")))
    assert(Multimodal.payloadShards(withNull, "doc_id", 2048).count() === 1)
  }
}
