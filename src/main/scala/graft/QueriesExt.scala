package graft

import org.apache.spark.sql.functions._

import graft.Queries.Entry
import graft.operators._

/** North-star extension queries (SURVEY.md §2.12 Q18-Q20 + the LLM-pipeline
  * operators): dedup, similarity search, text analysis, multimodal plumbing.
  *
  * Oracle notes: queries whose semantics depend on xxhash64 (MinHash, SimHash,
  * LSH, winnowing) have no SQL-expressible DuckDB equivalent → no oracle
  * (driver records a rows-only check). Everything else is mirrored exactly.
  */
object QueriesExt {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")
  private def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  val all: Seq[Entry] = Seq(
    // Q18 — dedup by normalized-text hash (md5 on both sides).
    Entry(
      "q18_dedup_norm",
      (s, d) => Dedup.byNormalizedText(docs(s, d), "doc_id", "text"),
      Some("""SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
                     COUNT(*) AS n_dups, MIN(doc_id) AS canonical_id
              FROM documents
              GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))""")),

    // Q19 — similarity baseline: exact top-5 cosine neighbors of vec_id=0.
    Entry(
      "q19_cosine_topk",
      (s, d) => Similarity.bruteForceTopK(embs(s, d), "vec_id", "embedding", 0L, 5),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                         FROM embeddings WHERE vec_id = 0),
                   sims AS (SELECT e.vec_id AS vec_id,
                                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS raw_sim
                            FROM embeddings e, q WHERE e.vec_id <> 0),
                   top AS (SELECT vec_id, raw_sim FROM sims
                           ORDER BY raw_sim DESC, vec_id LIMIT 5)
              SELECT vec_id, ROUND(raw_sim, 6) AS sim FROM top""")),

    // Q20 — token counting + language filter over documents.
    Entry(
      "q20_tokens",
      (s, d) =>
        docs(s, d).filter(col("lang") === "en")
          .select(
            col("doc_id"), col("lang"), col("n_chars"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
      Some("""SELECT doc_id, lang, n_chars,
                     len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
              FROM documents WHERE lang = 'en'""")),

    // D1 — exact full-row dedup.
    Entry(
      "d01_exact_dedup",
      (s, d) => Dedup.exact(docs(s, d)),
      Some("SELECT DISTINCT * FROM documents")),

    // D2 — MinHash+LSH near-dup pairs. The LSH candidate step is xxhash64-
    // based, but the FINAL filter is exact shingle-set Jaccard ≥ 0.5, so the
    // oracle computes the exact all-pairs answer (with a lossless length-
    // ratio prune: jaccard ≥ t implies min(|A|,|B|) ≥ t·max(|A|,|B|)) — a
    // stronger check than mirroring: it also proves LSH recall is complete
    // on this data (32 bands × 2 rows ⇒ p(miss) ≤ 1e-4 at j = 0.5).
    Entry(
      "d02_minhash_lsh",
      (s, d) => Dedup.minHashLshPairs(docs(s, d), "doc_id", "text", threshold = 0.5),
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   t AS (SELECT doc_id,
                                list_distinct([substring(norm, i, 5)
                                               for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                         FROM n)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
              FROM t a JOIN t b
                ON a.doc_id < b.doc_id
               AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
              WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""")),

    // D3 — SimHash near-dup pairs. hash56 (md5-derived) simhash is computed
    // bit-identically by DuckDB; 8×7-bit chunk blocking guarantees recall for
    // Hamming ≤ 7, so the output IS the all-pairs answer and the oracle
    // computes it directly.
    Entry(
      "d03_simhash",
      (s, d) => Dedup.simHashPairs(docs(s, d), "doc_id", "text", maxHamming = 7),
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   h AS (SELECT doc_id,
                                [('0x' || substr(md5(t), 1, 14))::UBIGINT::BIGINT
                                 for t in string_split(norm, ' ')] AS th
                         FROM n),
                   s AS (SELECT doc_id,
                                list_sum([CASE WHEN list_sum([CASE WHEN (x >> j) & 1 = 1
                                                                   THEN 1 ELSE -1 END
                                                              for x in th]) > 0
                                               THEN (1::BIGINT << j) ELSE 0 END
                                          for j in range(0, 56)])::BIGINT AS simhash
                         FROM h)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     bit_count(xor(a.simhash, b.simhash)) AS hamming
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 7""")),

    // D4 — blocked word-set Jaccard pairs; blocking on (lang, n_chars/100).
    Entry(
      "d04_ngram_jaccard",
      (s, d) =>
        Dedup.ngramJaccardPairs(
          docs(s, d), "doc_id", "text",
          Seq(col("lang"), expr("n_chars div 100")), threshold = 0.8),
      Some("""WITH t AS (SELECT doc_id, lang, n_chars // 100 AS blk,
                                list_distinct(string_split_regex(lower(text), '\s+')) AS toks
                         FROM documents)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                           / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jacc
              FROM t a JOIN t b
                ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8""")),

    // D5 — embedding-cosine near-dup pairs, blocked on label (coarse cell).
    Entry(
      "d05_embed_neardup",
      (s, d) =>
        Dedup.embeddingNearDupPairs(
          embs(s, d), "vec_id", "embedding", "label", threshold = 0.3),
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])), 6) AS sim
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.3""")),

    // D6 — connected components over the d02 near-dup pairs: the cluster-
    // assignment step of corpus dedup (one canonical doc per cluster).
    // Oracle: DuckDB recursive-CTE transitive closure → min reachable id.
    Entry(
      "d06_components",
      (s, d) => {
        val documents = docs(s, d)
        Dedup.connectedComponents(
          documents.select("doc_id"), "doc_id",
          Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
            .select("a_id", "b_id"),
          "a_id", "b_id")
      },
      Some("""WITH RECURSIVE
                n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                      FROM documents),
                t AS (SELECT doc_id,
                             list_distinct([substring(norm, i, 5)
                                            for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                      FROM n),
                p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                      FROM t a JOIN t b
                        ON a.doc_id < b.doc_id
                       AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
                      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
                e AS (SELECT a_id AS src, b_id AS dst FROM p
                      UNION SELECT b_id, a_id FROM p),
                reach(src, dst) AS (
                  SELECT src, dst FROM e
                  UNION
                  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
                m AS (SELECT src, MIN(dst) AS mn FROM reach GROUP BY src)
              SELECT d.doc_id AS doc_id,
                     LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN m ON d.doc_id = m.src""")),

    // S1 — IVF-style ANN (label cells, probe top-2 centroids). Fully
    // deterministic given the data, so the oracle mirrors the whole pipeline:
    // per-cell mean centroid → rank cells by query cosine → exact top-k
    // within the probed cells.
    Entry(
      "s01_ann_ivf",
      (s, d) =>
        Similarity.ivfTopKOneShot(embs(s, d), "vec_id", "embedding", "label", 0L, 5, nProbe = 2),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   probed AS (SELECT cent.label FROM cent, q
                              ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label
                              LIMIT 2),
                   cand AS (SELECT e.vec_id AS vec_id,
                                   list_cosine_similarity(e.v, q.qv) AS raw_sim
                            FROM e JOIN probed ON e.label = probed.label, q
                            WHERE e.vec_id <> 0)
              SELECT vec_id, ROUND(raw_sim, 6) AS sim FROM cand
              ORDER BY raw_sim DESC, vec_id LIMIT 5""")),

    // S2 — sign-LSH ANN. Hyperplanes are md5-derived, so DuckDB recomputes
    // the identical plane matrix and the whole bucket-then-exact-rank
    // pipeline is mirrored (the last formerly-oracle-less query).
    Entry(
      "s02_ann_lsh",
      (s, d) =>
        Similarity.lshTopKOneShot(embs(s, d), "vec_id", "embedding", 0L, 5, nPlanes = 8),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   s AS (SELECT vec_id, v,
                                list_sum([CASE WHEN
                                    list_sum([v[i+1] * ((('0x' || substr(md5(p::VARCHAR || '_' || i::VARCHAR), 1, 14))::UBIGINT::BIGINT % 2000003) / 1000001.5 - 1.0)
                                              for i in range(0, 64)]) >= 0
                                    THEN (1::BIGINT << p) ELSE 0 END
                                          for p in range(0, 8)])::BIGINT AS bucket
                         FROM e),
                   q AS (SELECT v AS qv, bucket AS qb FROM s WHERE vec_id = 0),
                   cand AS (SELECT s.vec_id AS vec_id,
                                   list_cosine_similarity(s.v, q.qv) AS raw
                            FROM s, q WHERE s.bucket = q.qb AND s.vec_id <> 0)
              SELECT vec_id, ROUND(raw, 6) AS sim FROM cand
              ORDER BY raw DESC, vec_id LIMIT 5""")),

    // S3 — batch ANN: one job answers a whole query SET (every 100th vector)
    // through the materialized IVF index — build once (codebook + cell
    // assignments), probe as a cell equi-join + per-query two-pass top-k. No
    // per-query driver loop anywhere; the oracle replays the identical
    // centroid → cell-rank → candidate → rank pipeline per query.
    Entry(
      "s03_ann_batch",
      (s, d) => {
        val e = embs(s, d)
        val index = Similarity.buildIvfIndex(e, "vec_id", "embedding", col("label"))
        Similarity.probeIvf(
          index, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 3, nProbe = 2, excludeSelf = true)
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   cr AS (SELECT q.q_id, cent.label,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label) AS crk
                          FROM cent, q),
                   probed AS (SELECT q_id, label FROM cr WHERE crk <= 2),
                   cand AS (SELECT p.q_id, e.vec_id,
                                   list_cosine_similarity(e.v, q.qv) AS raw
                            FROM e JOIN probed p ON e.label = p.label
                                   JOIN q ON q.q_id = p.q_id
                            WHERE e.vec_id <> p.q_id),
                   r AS (SELECT q_id, vec_id, raw,
                                row_number() OVER (PARTITION BY q_id
                                                   ORDER BY raw DESC, vec_id) AS rank
                         FROM cand)
              SELECT q_id, rank, vec_id, ROUND(raw, 6) AS sim FROM r WHERE rank <= 3""")),

    // S4 — incremental index maintenance: the index is built on two thirds
    // of the corpus (label cells), the remaining third arrives later and is
    // assigned by the FROZEN codebook (broadcast argmax fold — no corpus
    // pass), then the batch probe runs over the extended index. The oracle
    // replays centroids-from-base → rounded-cosine argmax for the new
    // vectors → union → cell-rank → candidate → rank.
    Entry(
      "s04_ann_extend",
      (s, d) => {
        val e = embs(s, d)
        val base = Similarity.buildIvfIndex(
          e.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding", col("label"))
        val extended = Similarity.extendIvfIndex(base, e.filter(col("vec_id") % 3 === 0))
        Similarity.probeIvf(
          extended, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 3, nProbe = 2, excludeSelf = true)
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   base AS (SELECT * FROM e WHERE vec_id % 3 <> 0),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM base),
                   cent AS (SELECT label AS cell, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   nas AS (SELECT vec_id, v, cell FROM
                             (SELECT n.vec_id, n.v, c.cell,
                                     row_number() OVER (PARTITION BY n.vec_id
                                       ORDER BY ROUND(list_cosine_similarity(n.v, c.cv) + 1e-9, 6) DESC, c.cell) AS rn
                              FROM e n CROSS JOIN cent c WHERE n.vec_id % 3 = 0) WHERE rn = 1),
                   corpus AS (SELECT vec_id, v, label AS cell FROM base
                              UNION ALL SELECT vec_id, v, cell FROM nas),
                   q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
                   cr AS (SELECT q.q_id, cent.cell,
                                 row_number() OVER (PARTITION BY q.q_id
                                   ORDER BY list_cosine_similarity(cv, qv) DESC, cent.cell) AS crk
                          FROM cent, q),
                   probed AS (SELECT q_id, cell FROM cr WHERE crk <= 2),
                   cand AS (SELECT p.q_id, corpus.vec_id,
                                   list_cosine_similarity(corpus.v, q.qv) AS raw
                            FROM corpus JOIN probed p ON corpus.cell = p.cell
                                   JOIN q ON q.q_id = p.q_id
                            WHERE corpus.vec_id <> p.q_id),
                   r AS (SELECT q_id, vec_id, raw,
                                row_number() OVER (PARTITION BY q_id
                                                   ORDER BY raw DESC, vec_id) AS rank
                         FROM cand)
              SELECT q_id, rank, vec_id, ROUND(raw, 6) AS sim FROM r WHERE rank <= 3""")),

    // S5 — multi-table (OR-amplified) sign-LSH batch probe: 4 independent
    // 4-plane tables from the same md5-derived matrix; a pair is a
    // candidate if it shares a bucket in ANY table (recall
    // 1-(1-p^4)^4 vs single-table p^8); cross-table duplicates are kept
    // only in their first agreeing table (exact dedup, no distinct
    // shuffle). The oracle recomputes all four tables bit-identically and
    // dedups with DISTINCT over the computed cosine.
    Entry(
      "s05_ann_lsh_multi",
      (s, d) => {
        val e = embs(s, d)
        val index = Similarity.buildLshIndexMulti(
          e, "vec_id", "embedding", nTables = 4, nPlanes = 4, dims = 64)
        Similarity.probeLshMulti(
          index, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 5, excludeSelf = true)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   s AS (SELECT vec_id, v,
                                [list_sum([CASE WHEN
                                    list_sum([v[i+1] * ((('0x' || substr(md5((t*4+p)::VARCHAR || '_' || i::VARCHAR), 1, 14))::UBIGINT::BIGINT % 2000003) / 1000001.5 - 1.0)
                                              for i in range(0, 64)]) >= 0
                                    THEN (1::BIGINT << p) ELSE 0 END
                                          for p in range(0, 4)])::BIGINT
                                 for t in range(0, 4)] AS bks
                         FROM e),
                   sb AS (SELECT vec_id, v, unnest(bks) AS b, generate_subscripts(bks, 1) AS t FROM s),
                   qb AS (SELECT vec_id AS q_id, v AS qv, unnest(bks) AS b,
                                 generate_subscripts(bks, 1) AS t
                          FROM s WHERE vec_id % 100 = 0),
                   cand AS (SELECT DISTINCT qb.q_id, sb.vec_id,
                                   list_cosine_similarity(sb.v, qb.qv) AS raw
                            FROM sb JOIN qb ON sb.t = qb.t AND sb.b = qb.b
                            WHERE sb.vec_id <> qb.q_id),
                   r AS (SELECT q_id, vec_id, raw,
                                row_number() OVER (PARTITION BY q_id
                                                   ORDER BY raw DESC, vec_id) AS rank
                         FROM cand)
              SELECT q_id, rank, vec_id, ROUND(raw, 6) AS sim FROM r WHERE rank <= 5""")),

    // S6 — embedding-space mislabel detection: the 5 vectors per label
    // FARTHEST (lowest cosine) from their own label's mean vector. Fully
    // deterministic; the oracle replays centroid → cosine → per-label
    // bottom-k.
    Entry(
      "s06_label_outliers",
      (s, d) =>
        Similarity.labelOutliers(embs(s, d), "vec_id", "embedding", "label", k = 5),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   sims AS (SELECT e.label, e.vec_id,
                                   list_cosine_similarity(e.v, cent.cv) AS raw
                            FROM e JOIN cent USING (label)),
                   r AS (SELECT label, vec_id, raw,
                                row_number() OVER (PARTITION BY label
                                                   ORDER BY raw ASC, vec_id) AS rank
                         FROM sims)
              SELECT label, rank, vec_id, ROUND(raw, 6) AS sim FROM r WHERE rank <= 5""")),

    // S7 — hard-negative mining: for each query (every 100th vector), the
    // top-3 most similar vectors with a DIFFERENT label, candidates probed
    // from the top-2 FOREIGN label cells (the exclusion runs on the tiny
    // codebook, before candidate generation). Oracle replays
    // centroid → foreign-cell rank → candidate → rank.
    Entry(
      "s07_hard_negatives",
      (s, d) => {
        val e = embs(s, d)
        Similarity.hardNegatives(
          e, "vec_id", "embedding", "label",
          e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", "label",
          k = 3, nProbe = 2)
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, label AS q_lbl, v AS qv
                         FROM e WHERE vec_id % 100 = 0),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   cr AS (SELECT q.q_id, cent.label,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label) AS crk
                          FROM cent, q WHERE cent.label <> q.q_lbl),
                   probed AS (SELECT q_id, label FROM cr WHERE crk <= 2),
                   cand AS (SELECT p.q_id, e.vec_id,
                                   list_cosine_similarity(e.v, q.qv) AS raw
                            FROM e JOIN probed p ON e.label = p.label
                                   JOIN q ON q.q_id = p.q_id),
                   r AS (SELECT q_id, vec_id, raw,
                                row_number() OVER (PARTITION BY q_id
                                                   ORDER BY raw DESC, vec_id) AS rank
                         FROM cand)
              SELECT q_id, rank, vec_id, ROUND(raw, 6) AS sim FROM r WHERE rank <= 3""")),

    // C1 — the whole curation pipeline as ONE composed query: quality
    // filter → canonical exact dedup → benchmark decontamination → sequence
    // packing → round-robin sharding. Every stage is individually
    // oracle-verified (t02, q18, t07, t14, t19); this entry pins their
    // COMPOSITION — the dataflow a real corpus-curation job runs — against
    // one end-to-end DuckDB replay. Plan: map-side quality expressions, one
    // hash-dedup aggregate, the no-doc×doc gram join, the distributed
    // prefix sum; nothing quadratic, no global window.
    Entry(
      "c01_curation",
      (s, d) => {
        val documents = docs(s, d)
        // threshold on the 6dp-ROUNDED score — t02's hash-match pins that
        // column bit-identical across engines, so the cut is reproducible
        // (0.45 fits this corpus's score distribution; the default `keep`
        // at 0.5 would keep 3 docs of 500 — a meaningless pipeline)
        val kept = TextAnalysis.withQuality(documents, "text")
          .filter(col("quality_score") >= 0.45).select("doc_id", "text")
        val canon = Dedup.byNormalizedText(kept, "doc_id", "text")
          .select(col("canonical_id").as("doc_id"))
        val train = kept.join(canon, Seq("doc_id"))
          .filter(col("doc_id") % 50 =!= 0)
        val contaminated = TextAnalysis.contaminatedDocs(
            train, documents.filter(col("doc_id") % 50 === 0),
            "doc_id", "text", n = 3)
          .select("doc_id")
        val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
        Packing.packSequences(
            clean.select(
              col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "n_tokens", maxTokens = 512)
          .select(
            col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("cum_tokens"), col("seq_id"),
            pmod(col("seq_id"), lit(8)).cast("long").as("shard"))
      },
      Some("""WITH m AS (
                SELECT doc_id, text,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS atl,
                       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                         / length(text) AS pr,
                       CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS swr
                FROM documents),
              kept AS (
                SELECT doc_id, text FROM m
                WHERE ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 0.05*atl + 0.5*swr - 2.0*pr)), 6) >= 0.45),
              canon AS (
                SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id,
                             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
                      FROM kept)
                GROUP BY h),
              train AS (
                SELECT kept.doc_id, kept.text FROM kept JOIN canon USING (doc_id)
                WHERE kept.doc_id % 50 <> 0),
              nb AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                     FROM documents WHERE doc_id % 50 = 0),
              tb AS (SELECT string_split(norm, ' ') AS toks FROM nb),
              bench AS (SELECT DISTINCT unnest([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS gram
                        FROM tb),
              nt AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                     FROM train),
              tt AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM nt),
              tg AS (SELECT doc_id,
                            unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, greatest(len(toks) - 3, 0) + 2)])) AS gram
                     FROM tt),
              contam AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (gram)),
              clean AS (SELECT train.doc_id, train.text FROM train
                        WHERE train.doc_id NOT IN (SELECT doc_id FROM contam)),
              tok AS (SELECT doc_id,
                             len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
                      FROM clean),
              c AS (SELECT doc_id, n_tokens,
                           CAST(SUM(n_tokens) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                    FROM tok)
              SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens,
                     (cum_tokens - n_tokens) // 512 AS seq_id,
                     ((cum_tokens - n_tokens) // 512) % 8 AS shard
              FROM c""")),

    // C3 — the curation funnel's ATTRITION REPORT: every document labeled
    // with the FIRST stage of c01's pipeline that dropped it (quality cut →
    // duplicate → benchmark holdout → contamination → kept), then one
    // count per stage. Computed as ONE labeled pass — a per-doc CASE over
    // the pipeline's own two stage joins — not per-stage recounts, which
    // would re-derive stage k's full lineage k times (O(stages²) corpus
    // work at 100 TB). This is the first dashboard any production curation
    // pipeline needs: where did my corpus go?
    Entry(
      "c03_funnel_report",
      (s, d) => {
        val documents = docs(s, d)
        val scored = TextAnalysis.withQuality(documents, "text")
          .select(col("doc_id"), col("text"), col("quality_score"))
        val kept = scored.filter(col("quality_score") >= 0.45)
          .select("doc_id", "text")
        val canon = Dedup.byNormalizedText(kept, "doc_id", "text")
          .select(col("canonical_id").as("doc_id"), lit(1).as("_canon"))
        val train = kept.join(canon.select("doc_id"), Seq("doc_id"))
          .filter(col("doc_id") % 50 =!= 0)
        val contaminated = TextAnalysis.contaminatedDocs(
            train, documents.filter(col("doc_id") % 50 === 0),
            "doc_id", "text", n = 3)
          .select(col("doc_id"), lit(1).as("_contam"))
        scored
          .join(canon, Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left")
          .select(
            when(col("quality_score") < 0.45, "1_quality")
              .when(col("_canon").isNull, "2_duplicate")
              .when(col("doc_id") % 50 === 0, "3_benchmark_holdout")
              .when(col("_contam").isNotNull, "4_contaminated")
              .otherwise("5_kept").as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH m AS (
                SELECT doc_id, text,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS atl,
                       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                         / length(text) AS pr,
                       CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS swr
                FROM documents),
              scored AS (
                SELECT doc_id, text,
                       ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 0.05*atl + 0.5*swr - 2.0*pr)), 6) AS qs
                FROM m),
              kept AS (SELECT doc_id, text FROM scored WHERE qs >= 0.45),
              canon AS (
                SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id,
                             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
                      FROM kept)
                GROUP BY h),
              train AS (
                SELECT kept.doc_id, kept.text FROM kept JOIN canon USING (doc_id)
                WHERE kept.doc_id % 50 <> 0),
              nb AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                     FROM documents WHERE doc_id % 50 = 0),
              tb AS (SELECT string_split(norm, ' ') AS toks FROM nb),
              bench AS (SELECT DISTINCT unnest([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS gram
                        FROM tb),
              nt AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                     FROM train),
              tt AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM nt),
              grams AS (SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS gram
                        FROM tt),
              contaminated AS (
                SELECT DISTINCT grams.doc_id
                FROM grams JOIN bench ON grams.gram = bench.gram),
              lab AS (
                SELECT s.doc_id,
                       CASE WHEN s.qs < 0.45 THEN '1_quality'
                            WHEN c.doc_id IS NULL THEN '2_duplicate'
                            WHEN s.doc_id % 50 = 0 THEN '3_benchmark_holdout'
                            WHEN ct.doc_id IS NOT NULL THEN '4_contaminated'
                            ELSE '5_kept' END AS stage
                FROM scored s
                LEFT JOIN canon c ON s.doc_id = c.doc_id
                LEFT JOIN contaminated ct ON s.doc_id = ct.doc_id)
              SELECT stage, COUNT(*) AS n_docs FROM lab GROUP BY stage""")),

    // C2 — the embedding-side curation pipeline as ONE composed query
    // (c01's vector-space sibling): semantic dedup (d09) → per-cluster
    // outlier drop (s06's bottom-5, on the SURVIVORS' centroids) →
    // semantic decontamination vs the benchmark split (d12). Each stage is
    // individually oracle-verified; this pins their composition — order
    // matters (outlier centroids shift after dedup) and the oracle replays
    // the exact chain.
    Entry(
      "c02_embedding_curation",
      (s, d) => {
        val e = embs(s, d)
        val train = e.filter(col("vec_id") % 100 =!= 0)
        val bench = e.filter(col("vec_id") % 100 === 0)
        val kept = Dedup.semanticDedup(train, "vec_id", "embedding", "label",
          threshold = 0.4)
        val kv = train.join(kept, Seq("vec_id"))
        val outliers = Similarity.labelOutliers(
            kv, "vec_id", "embedding", "cluster", k = 5)
          .select("vec_id")
        val inliers = kv.join(outliers, Seq("vec_id"), "left_anti")
        Dedup.semanticDecontaminate(
            inliers, "vec_id", "embedding", bench, "embedding", threshold = 0.25)
          .join(kv.select(col("vec_id"), col("cluster")), Seq("vec_id"))
          .select(col("vec_id"), col("cluster"), col("max_bench_sim"))
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   tr AS (SELECT * FROM e WHERE vec_id % 100 <> 0),
                   bench AS (SELECT v AS bv FROM e WHERE vec_id % 100 = 0),
                   comp AS (SELECT label AS cell, i, ROUND(avg(v[i]) + 1e-9, 6) AS m
                            FROM tr, (SELECT unnest(range(1, 65)) AS i) r GROUP BY 1, 2),
                   cent AS (SELECT cell, list(m ORDER BY i) AS c FROM comp GROUP BY cell),
                   scored AS (SELECT vec_id, v, cell,
                                     ROUND(list_cosine_similarity(v, c) + 1e-9, 6) AS cs
                              FROM tr CROSS JOIN cent),
                   assigned AS (SELECT vec_id, v, cell FROM
                                (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                              ORDER BY cs DESC, cell) AS rn
                                 FROM scored) WHERE rn = 1),
                   kept AS (SELECT a.vec_id, a.v, a.cell FROM assigned a
                            WHERE NOT EXISTS (SELECT 1 FROM assigned b
                                              WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                                                AND list_cosine_similarity(a.v, b.v) >= 0.4)),
                   ccomp AS (SELECT cell, i, AVG(val) AS av
                             FROM (SELECT cell, unnest(v) AS val,
                                          generate_subscripts(v, 1) AS i FROM kept)
                             GROUP BY cell, i),
                   ccent AS (SELECT cell, list(av ORDER BY i) AS cv FROM ccomp GROUP BY cell),
                   ranked AS (SELECT k.vec_id, k.v, k.cell,
                                     row_number() OVER (PARTITION BY k.cell
                                       ORDER BY list_cosine_similarity(k.v, ccent.cv) ASC, k.vec_id) AS crk
                              FROM kept k JOIN ccent USING (cell)),
                   inl AS (SELECT vec_id, v, cell FROM ranked WHERE crk > 5),
                   m AS (SELECT inl.vec_id, inl.cell,
                                ROUND(MAX(list_cosine_similarity(inl.v, bench.bv)) + 1e-9, 6) AS ms
                         FROM inl CROSS JOIN bench GROUP BY inl.vec_id, inl.cell)
              SELECT vec_id, CAST(cell AS INT) AS cluster, ms AS max_bench_sim
              FROM m WHERE ms < 0.25""")),

    // T1 — language-ID heuristic (stopword density).
    Entry(
      "t01_langid",
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          TextAnalysis.langIdHeuristic(col("text")).as("pred_lang"),
          round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio")),
      Some("""SELECT doc_id,
                     CASE WHEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                    x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                               / len(string_split_regex(trim(lower(text)), '\s+')) >= 0.1
                          THEN 'en' ELSE 'unk' END AS pred_lang,
                     ROUND(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                    x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                           / len(string_split_regex(trim(lower(text)), '\s+')), 6) AS stop_ratio
              FROM documents""")),

    // T2 — quality scoring (length/punct/stopword ratios + linear score).
    Entry(
      "t02_quality",
      (s, d) =>
        TextAnalysis.withQuality(docs(s, d), "text")
          .select(
            "doc_id", "n_tokens", "avg_token_len", "punct_ratio",
            "stopword_ratio", "quality_score", "keep"),
      Some("""WITH m AS (
                SELECT doc_id,
                       len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS avg_token_len,
                       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                         / length(text) AS punct_ratio,
                       CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS stopword_ratio
                FROM documents)
              SELECT doc_id, n_tokens, ROUND(avg_token_len, 6) AS avg_token_len,
                     ROUND(punct_ratio, 6) AS punct_ratio,
                     ROUND(stopword_ratio, 6) AS stopword_ratio,
                     ROUND(LEAST(1.0, GREATEST(0.0,
                       0.2 + 0.05 * avg_token_len + 0.5 * stopword_ratio - 2.0 * punct_ratio)), 6) AS quality_score,
                     LEAST(1.0, GREATEST(0.0,
                       0.2 + 0.05 * avg_token_len + 0.5 * stopword_ratio - 2.0 * punct_ratio)) >= 0.5 AS keep
              FROM m""")),

    // T3 — whitespace + BPE-ish regex token counts.
    Entry(
      "t03_tokens_bpe",
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeTokenCount("text").as("n_bpe_tokens")),
      Some("""SELECT doc_id,
                     len(string_split_regex(trim(lower(text)), '\s+')) AS n_ws_tokens,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
              FROM documents""")),

    // T4 — winnowing fingerprint (hash56 k-gram minima, string output). The
    // md5-derived hash makes the whole fingerprint DuckDB-reproducible.
    Entry(
      "t04_fingerprint",
      (s, d) =>
        TextAnalysis.withFingerprint(docs(s, d), "text")
          .select("doc_id", "fingerprint"),
      Some("""WITH nn AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                          FROM documents),
                   g AS (SELECT doc_id,
                                [('0x' || substr(md5(substring(norm, i, 8)), 1, 14))::UBIGINT::BIGINT
                                 for i in range(1, greatest(length(norm) - 8, 0) + 2)] AS grams
                         FROM nn),
                   m AS (SELECT doc_id,
                                list_sort(list_distinct([list_min(grams[w:w+3])
                                                         for w in range(1, greatest(len(grams) - 4, 0) + 2)])) AS mins
                         FROM g)
              SELECT doc_id, array_to_string(mins[1:8], ',') AS fingerprint FROM m""")),

    // T5 — corpus-trained trigram language classifier: per-label top-200
    // document-frequency trigram profiles, classify by max overlap. Both
    // engines train and classify on the same data with integer counts and
    // deterministic tie-breaks, so the oracle mirrors the whole pipeline.
    Entry(
      "t05_langid_ngram",
      (s, d) =>
        TextAnalysis.langIdNgram(docs(s, d), "doc_id", "text", "lang"),
      Some("""WITH n AS (SELECT doc_id, lang,
                                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   t AS (SELECT doc_id, lang,
                                unnest(list_distinct([substring(norm, i, 3)
                                       for i in range(1, greatest(length(norm) - 3, 0) + 2)])) AS tri
                         FROM n),
                   c AS (SELECT lang AS plab, tri, count(*) AS c FROM t GROUP BY lang, tri),
                   p AS (SELECT plab, tri FROM
                           (SELECT plab, tri,
                                   row_number() OVER (PARTITION BY plab ORDER BY c DESC, tri ASC) AS rk
                            FROM c) WHERE rk <= 200),
                   ov AS (SELECT t.doc_id, p.plab, count(*) AS ov
                          FROM (SELECT DISTINCT doc_id, tri FROM t) t
                          JOIN p ON t.tri = p.tri
                          GROUP BY t.doc_id, p.plab),
                   pr AS (SELECT doc_id, plab, ov FROM
                            (SELECT doc_id, plab, ov,
                                    row_number() OVER (PARTITION BY doc_id ORDER BY ov DESC, plab ASC) AS rk
                             FROM ov) WHERE rk = 1)
              SELECT d.doc_id AS doc_id,
                     COALESCE(pr.plab, 'unk') AS lang_pred,
                     COALESCE(pr.ov, 0) AS n_shared
              FROM documents d LEFT JOIN pr ON d.doc_id = pr.doc_id""")),

    // T6 — deterministic md5 hash-split (train/validation/test): identical
    // assignment on every engine and run, unlike random sampling.
    Entry(
      "t06_hash_split",
      (s, d) =>
        TextAnalysis.deterministicSplit(docs(s, d), "doc_id")
          .select("doc_id", "bucket", "split"),
      Some("""WITH b AS (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 100 AS bucket
              FROM documents)
              SELECT doc_id, bucket,
                     CASE WHEN bucket < 90 THEN 'train'
                          WHEN bucket < 95 THEN 'validation'
                          ELSE 'test' END AS split
              FROM b""")),

    // T7 — benchmark decontamination: training docs sharing any 3-token-gram
    // with the benchmark slice (doc_id % 50 = 0 stands in for the holdout;
    // real pipelines use 13-grams — the short synthetic docs need short
    // grams for the check to exercise real overlap volume).
    Entry(
      "t07_decontam",
      (s, d) => {
        val documents = docs(s, d)
        TextAnalysis.contaminatedDocs(
          documents.filter(col("doc_id") % 50 =!= 0),
          documents.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3)
      },
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
                   g AS (SELECT doc_id,
                                list_distinct([array_to_string(toks[i:i+2], ' ')
                                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS grams
                         FROM tk),
                   bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
                   tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0)
              SELECT tr.doc_id AS doc_id, COUNT(*) AS n_shared_grams
              FROM tr JOIN bench ON tr.gram = bench.gram
              GROUP BY tr.doc_id
              HAVING COUNT(*) >= 1""")),

    // T8 — exact heavy hitters: global top-50 tokens with deterministic
    // tie-break (vocabulary/boilerplate audit over the corpus).
    Entry(
      "t08_topterms",
      (s, d) => TextAnalysis.topTerms(docs(s, d), "text", 50),
      Some("""WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                           FROM documents)
              SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
              ORDER BY cnt DESC, token ASC LIMIT 50""")),

    // T9 — PII redaction: synthetic emails/phones are spliced in (the
    // corpus has none), then scrubbed; audit counts ride along. The regex
    // is written in the Java∩RE2 common subset so both engines apply the
    // identical pattern.
    Entry(
      "t09_redact",
      (s, d) => {
        val aug = concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          (lit(1000) + col("doc_id") % 9000).cast("string"))
        docs(s, d)
          .select(col("doc_id"), aug.as("_raw"))
          .select(
            col("doc_id"),
            TextAnalysis.redactPii(col("_raw")).as("redacted"),
            TextAnalysis.emailCount(col("_raw")).cast("long").as("n_emails"),
            TextAnalysis.phoneCount(col("_raw")).cast("long").as("n_phones"))
      },
      Some("""WITH aug AS (SELECT doc_id,
                                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                                       || '@example.com or +1-555-'
                                       || CAST(1000 + doc_id % 9000 AS VARCHAR) AS raw
                           FROM documents)
              SELECT doc_id,
                     regexp_replace(regexp_replace(raw,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}', '<PHONE>', 'g') AS redacted,
                     len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                     len(regexp_extract_all(raw, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}')) AS n_phones
              FROM aug""")),

    // T10 — repetition-based quality (the Gopher-rule family): top-2-gram
    // fraction + repeated-token fraction, with a keep flag.
    Entry(
      "t10_repetition",
      (s, d) =>
        TextAnalysis.repetitionStats(docs(s, d), "doc_id", "text", n = 2),
      Some("""WITH nn AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                          FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM nn),
                   g AS (SELECT doc_id,
                                unnest([array_to_string(toks[i:i+1], ' ')
                                        for i in range(1, greatest(len(toks) - 2, 0) + 2)]) AS gram
                         FROM tk),
                   c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
                   r AS (SELECT doc_id, MAX(c) AS top, SUM(c) AS total FROM c GROUP BY doc_id),
                   b AS (SELECT doc_id, len(toks) AS n_tokens,
                                len(list_distinct(toks)) AS n_distinct
                         FROM tk)
              SELECT b.doc_id AS doc_id, b.n_tokens AS n_tokens,
                     ROUND(CAST(r.top AS DOUBLE) / r.total, 6) AS top_ngram_ratio,
                     ROUND(1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens, 6) AS dup_token_ratio,
                     (CAST(r.top AS DOUBLE) / r.total <= 0.2
                      AND 1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens <= 0.3) AS keep
              FROM b LEFT JOIN r ON b.doc_id = r.doc_id""")),

    // D7 — the SAME cluster-assignment contract as d06, computed by the
    // diameter-independent star-contraction algorithm — both paths are held
    // to the identical recursive-CTE transitive-closure oracle.
    Entry(
      "d07_components_star",
      (s, d) => {
        val documents = docs(s, d)
        Dedup.connectedComponentsAlternating(
          documents.select("doc_id"), "doc_id",
          Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
            .select("a_id", "b_id"),
          "a_id", "b_id")
      },
      Some("""WITH RECURSIVE
                n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                      FROM documents),
                t AS (SELECT doc_id,
                             list_distinct([substring(norm, i, 5)
                                            for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                      FROM n),
                p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                      FROM t a JOIN t b
                        ON a.doc_id < b.doc_id
                       AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
                      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
                e AS (SELECT a_id AS src, b_id AS dst FROM p
                      UNION SELECT b_id, a_id FROM p),
                reach(src, dst) AS (
                  SELECT src, dst FROM e
                  UNION
                  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
                m AS (SELECT src, MIN(dst) AS mn FROM reach GROUP BY src)
              SELECT d.doc_id AS doc_id,
                     LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN m ON d.doc_id = m.src""")),

    // M1 — multimodal binary-column plumbing: payload bytes + hash (the
    // decode step itself is the stubbed [[Multimodal.decodeFeatures]]).
    Entry(
      "m01_multimodal",
      (s, d) =>
        Multimodal.withPayload(docs(s, d), "doc_id", "text")
          .select(
            col("doc_id"),
            col("meta.n_bytes").as("byte_len"),
            sha2(col("payload"), 256).as("sha")),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
                     sha256(text) AS sha
              FROM documents""")),

    // M2 — multimodal frame-sampling shape: every stride-th byte offset of
    // the payload (stand-in for video frame sampling), output as a string so
    // the compare harness can canonicalize it.
    Entry(
      "m02_frame_sample",
      (s, d) =>
        Multimodal.sampleOffsets(
            Multimodal.withPayload(docs(s, d), "doc_id", "text"), stride = 64)
          .select(
            col("doc_id"),
            concat_ws(",", col("sampled_offsets")).as("offsets")),
      Some("""SELECT doc_id,
                     array_to_string(
                       range(0, greatest(octet_length(encode(text)) - 1, 0) + 1, 64),
                       ',') AS offsets
              FROM documents""")),

    // M3 — exact multimodal payload dedup by content hash: identical bytes
    // are identical media regardless of codec, so raw-byte identity is the
    // one dedup signal that needs no decoder. The oracle's md5(text) hashes
    // the SAME UTF-8 bytes the Spark side hashes as the binary payload.
    Entry(
      "m03_payload_dedup",
      (s, d) => Multimodal.payloadContentDedup(
        Multimodal.withPayload(docs(s, d), "doc_id", "text"), "doc_id"),
      Some("""SELECT md5(text) AS payload_hash, COUNT(*) AS n_dups,
                     MIN(doc_id) AS canonical_id
              FROM documents WHERE text IS NOT NULL
              GROUP BY md5(text)""")),

    // M4 — chunked byte-signature near-dup over payloads: fixed 64-byte
    // chunk-hash sets, candidates by shared chunk (exact blocking key, no
    // all-pairs), lossless length-ratio prune, exact Jaccard ≥ 0.5.
    // Chunking runs on the payload's HEX form (2 chars = 1 byte — the one
    // byte-faithful representation both engines slice identically), so the
    // oracle replays chunk hashes, candidate set and Jaccard bit-for-bit.
    Entry(
      "m04_payload_neardup",
      (s, d) => Multimodal.payloadNearDupPairs(
        Multimodal.withPayload(docs(s, d), "doc_id", "text"), "doc_id",
        chunkBytes = 64, threshold = 0.5),
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                                CAST((octet_length(encode(text)) + 63) // 64 AS INTEGER) AS nch
                         FROM documents WHERE text IS NOT NULL),
                   t AS (SELECT doc_id,
                                list_distinct([md5(substring(hx, i*128+1, 128)) for i in range(0, nch)]) AS ch
                         FROM h WHERE nch > 0)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     ROUND(CAST(len(list_intersect(a.ch, b.ch)) AS DOUBLE)
                           / (len(a.ch) + len(b.ch) - len(list_intersect(a.ch, b.ch))) + 1e-9, 6) AS jaccard
              FROM t a JOIN t b
                ON a.doc_id < b.doc_id
               AND least(len(a.ch), len(b.ch)) >= 0.5 * greatest(len(a.ch), len(b.ch))
              WHERE CAST(len(list_intersect(a.ch, b.ch)) AS DOUBLE)
                    / (len(a.ch) + len(b.ch) - len(list_intersect(a.ch, b.ch))) >= 0.5""")),

    // M05 — WebDataset-style payload shard packing: the export step a
    // multimodal corpus actually ships as — fixed ~16 KiB archive shards
    // under the deterministic md5(id) permutation (shard id = pure function
    // of the corpus, so every re-export is byte-stable). Reuses the
    // t19/packing distributed prefix sum — never a single-task global
    // window; concat-and-chunk semantics (a payload belongs to the shard
    // its first byte lands in).
    Entry(
      "m05_payload_shards",
      (s, d) =>
        Multimodal.payloadShards(
          Multimodal.withPayload(docs(s, d), "doc_id", "text"),
          "doc_id", shardBytes = 16384)
          .select("doc_id", "payload_bytes", "cum_bytes", "shard"),
      Some("""WITH p AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
                         FROM documents WHERE text IS NOT NULL),
                   r AS (SELECT doc_id, payload_bytes,
                                SUM(payload_bytes) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                                         ROWS UNBOUNDED PRECEDING) AS cum_bytes
                         FROM p)
              SELECT doc_id, payload_bytes, CAST(cum_bytes AS BIGINT) AS cum_bytes,
                     CAST((cum_bytes - payload_bytes) // 16384 AS BIGINT) AS shard
              FROM r""")),

    // T11 — per-group top-k (TopK.perGroup two-pass rank: local top-k per
    // (group, partition) slice, then global over ≤ k×partitions survivors —
    // a hot group cannot straggle one task): best 3 documents per language
    // by quality score. Ranking on the ROUNDED score (what both engines
    // output for t02) with doc_id tie-break keeps the cut deterministic.
    Entry(
      "t11_topk_quality",
      (s, d) => {
        val q = TextAnalysis.withQuality(docs(s, d), "text")
          .select(col("lang"), col("doc_id"), col("quality_score"))
        TopK.perGroup(
            q, Seq("lang"),
            Seq(col("quality_score").desc, col("doc_id").asc), 3)
          .select(
            col("lang"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("quality_score"))
      },
      Some("""WITH m AS (
                SELECT lang, doc_id,
                       CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS avg_token_len,
                       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                         / length(text) AS punct_ratio,
                       CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                         / len(string_split_regex(trim(lower(text)), '\s+')) AS stopword_ratio
                FROM documents),
              sc AS (
                SELECT lang, doc_id,
                       ROUND(LEAST(1.0, GREATEST(0.0,
                         0.2 + 0.05 * avg_token_len + 0.5 * stopword_ratio - 2.0 * punct_ratio)), 6) AS quality_score
                FROM m),
              r AS (
                SELECT lang, doc_id, quality_score,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY quality_score DESC, doc_id) AS rank
                FROM sc)
              SELECT lang, rank, doc_id, quality_score FROM r WHERE rank <= 3""")),

    // T12 — deterministic stratified sample: exactly 5 docs per language,
    // selected by md5(doc_id) order — stable across runs, partitionings, and
    // engines (the md5 IS the sampling randomness, as in t06's hash split).
    Entry(
      "t12_stratified_sample",
      (s, d) =>
        TopK.stratifiedSample(docs(s, d), Seq("lang"), "doc_id", 5)
          .select(
            col("lang"), col("rank").cast("long").as("rank"), col("doc_id")),
      Some("""WITH r AS (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
                FROM documents)
              SELECT lang, rank, doc_id FROM r WHERE rank <= 5""")),

    // T13 — per-document top-3 TF-IDF terms (smoothed idf; scores rounded
    // to 6dp BEFORE ranking so a last-ulp ln() difference can't reorder the
    // cut; term tie-break). The corpus size joins in as a broadcast one-row
    // frame — no driver collect.
    Entry(
      "t13_tfidf",
      (s, d) =>
        TextAnalysis.tfIdfTopTerms(docs(s, d), "doc_id", "text", k = 3)
          .select(
            col("doc_id"), col("rank").cast("long").as("rank"), col("term"),
            col("tf"), col("tfidf")),
      Some("""WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
                FROM documents),
              f AS (SELECT doc_id, term, COUNT(*) AS tf
                    FROM toks WHERE length(term) >= 3 GROUP BY doc_id, term),
              dd AS (SELECT term, COUNT(*) AS dfq FROM f GROUP BY term),
              n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
              sc AS (SELECT f.doc_id, f.term, f.tf,
                            ROUND(f.tf * ln((n.n + 1.0) / (dd.dfq + 1)) + 1e-9, 6) AS tfidf
                     FROM f, dd, n WHERE f.term = dd.term),
              r AS (SELECT doc_id, term, tf, tfidf,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY tfidf DESC, term) AS rank
                    FROM sc)
              SELECT doc_id, rank, term, tf, tfidf FROM r WHERE rank <= 3""")),

    // T14 — training-sequence packing: concatenate the corpus in
    // deterministic md5(doc_id) order and cut every 512 tokens; each doc
    // gets the 0-based id of the sequence its first token lands in. The
    // global running token count is a DISTRIBUTED prefix sum
    // (Packing.globalRunningSum: range partition + per-slice window +
    // broadcast slice offsets) — the naive `sum over (order by)` would pull
    // 100 TB through one task's sort.
    Entry(
      "t14_packing",
      (s, d) =>
        Packing.packSequences(
            docs(s, d).select(
              col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "n_tokens", maxTokens = 512)
          .select("doc_id", "n_tokens", "cum_tokens", "seq_id"),
      Some("""WITH t AS (
                SELECT doc_id,
                       len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
                FROM documents),
              c AS (
                SELECT doc_id, n_tokens,
                       CAST(SUM(n_tokens) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                FROM t)
              SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens,
                     (cum_tokens - n_tokens) // 512 AS seq_id
              FROM c""")),

    // D8 — fixed-width token-chunk exact dedup (the shuffle-bounded stand-in
    // for Lee-et-al-2021 exact-substring dedup): every 10-token chunk seen
    // earlier (smallest (doc_id, pos)) anywhere in the corpus is removed and
    // docs are rebuilt from the survivors. The oracle replays the identical
    // chunking + first-occurrence rule in SQL.
    Entry(
      "d08_chunk_dedup",
      (s, d) => Dedup.chunkDedup(docs(s, d), "doc_id", "text", width = 10),
      Some("""WITH n AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                         FROM documents),
                   c AS (SELECT doc_id, i AS pos,
                                array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS chunk
                         FROM n, LATERAL (SELECT unnest(range(0, CAST(ceil(len(n.toks)/10.0) AS BIGINT))) AS i) r),
                   k AS (SELECT chunk, min({'d': doc_id, 'p': pos}) AS keeper
                         FROM c GROUP BY chunk),
                   kept AS (SELECT c.doc_id, c.pos, c.chunk FROM c JOIN k USING (chunk)
                            WHERE k.keeper.d = c.doc_id AND k.keeper.p = c.pos)
              SELECT d.doc_id,
                     coalesce(string_agg(kept.chunk, ' ' ORDER BY kept.pos), '') AS clean_text,
                     count(kept.pos) AS n_kept
              FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
              GROUP BY d.doc_id""")),

    // D9 — SemDeDup-style semantic dedup: per-label centroids → nearest-
    // centroid assignment (6dp-rounded cosine, ties to the lowest cell) →
    // drop every vector with a smaller-id same-cluster neighbor at cosine
    // ≥ 0.4. The oracle replays centroid means, the argmax, and the
    // anti-join exactly.
    Entry(
      "d09_semdedup",
      (s, d) =>
        Dedup.semanticDedup(embs(s, d), "vec_id", "embedding", "label",
          threshold = 0.4),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   comp AS (SELECT label AS cell, i, ROUND(avg(v[i]) + 1e-9, 6) AS m
                            FROM e, (SELECT unnest(range(1, 65)) AS i) r GROUP BY 1, 2),
                   cent AS (SELECT cell, list(m ORDER BY i) AS c FROM comp GROUP BY cell),
                   scored AS (SELECT vec_id, v, cell,
                                     ROUND(list_cosine_similarity(v, c) + 1e-9, 6) AS cs
                              FROM e CROSS JOIN cent),
                   assigned AS (SELECT vec_id, v, cell FROM
                                (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                              ORDER BY cs DESC, cell) AS rn
                                 FROM scored) WHERE rn = 1)
              SELECT a.vec_id, CAST(a.cell AS INT) AS cluster FROM assigned a
              WHERE NOT EXISTS (SELECT 1 FROM assigned b
                                WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                                  AND list_cosine_similarity(a.v, b.v) >= 0.4)""")),

    // D13 — incremental NEAR-dup: which "new batch" docs (doc_id % 10 = 0)
    // near-duplicate an "existing corpus" doc (the rest) at Jaccard ≥ 0.5.
    // Banding recall is the same as d02's (whose all-pairs output these
    // cross pairs are a subset of); the oracle computes the exact cross
    // product directly.
    Entry(
      "d13_incremental_neardup",
      (s, d) => {
        val docs0 = docs(s, d)
        Dedup.incrementalNearDupPairs(
          docs0.filter(col("doc_id") % 10 === 0),
          docs0.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", threshold = 0.5)
      },
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   t AS (SELECT doc_id,
                                list_distinct([substring(norm, i, 5)
                                               for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                         FROM n)
              SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id,
                     ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
              FROM t a JOIN t b
                ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
               AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
              WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""")),

    // D14 — cross-source duplicate-overlap matrix: for every unordered
    // source pair, shared normalized-text hashes + Jaccard of the two
    // hash sets, WITH zero-overlap pairs present (a monitoring matrix with
    // missing cells reads as "no overlap" for the wrong reason). One
    // (source, hash) distinct, a hash-keyed self-join bounded by sources²
    // per hash, and a sources²-sized pair frame.
    Entry(
      "d14_source_overlap",
      (s, d) => Dedup.sourceOverlap(docs(s, d), "text", "source"),
      Some("""WITH h AS (SELECT DISTINCT source AS src,
                                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
                         FROM documents),
                   sizes AS (SELECT src, COUNT(*) AS n FROM h GROUP BY src),
                   inter AS (SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS shared
                             FROM h a JOIN h b ON a.h = b.h AND a.src < b.src
                             GROUP BY a.src, b.src),
                   pairs AS (SELECT x.src AS source_a, y.src AS source_b,
                                    x.n AS na, y.n AS nb
                             FROM sizes x JOIN sizes y ON x.src < y.src)
              SELECT p.source_a, p.source_b,
                     COALESCE(i.shared, 0) AS n_shared,
                     ROUND(COALESCE(i.shared, 0) * 1.0
                           / (p.na + p.nb - COALESCE(i.shared, 0)), 6) AS jaccard
              FROM pairs p LEFT JOIN inter i
                ON p.source_a = i.source_a AND p.source_b = i.source_b""")),

    // D12 — semantic decontamination: training vectors (vec_id % 100 <> 0)
    // whose max cosine to ANY benchmark vector (vec_id % 100 = 0) stays
    // under 0.25 — the embedding-space complement of t07's n-gram check
    // (catches paraphrased leakage). The fold-max is order-independent, so
    // the rounded compare is cross-engine stable.
    Entry(
      "d12_semantic_decon",
      (s, d) => {
        val e = embs(s, d)
        Dedup.semanticDecontaminate(
          e.filter(col("vec_id") % 100 =!= 0), "vec_id", "embedding",
          e.filter(col("vec_id") % 100 === 0), "embedding", threshold = 0.25)
      },
      Some("""WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS bv FROM embeddings
                         WHERE vec_id % 100 = 0),
                   c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                         WHERE vec_id % 100 <> 0),
                   m AS (SELECT c.vec_id, ROUND(MAX(list_cosine_similarity(v, bv)) + 1e-9, 6) AS ms
                         FROM c CROSS JOIN b GROUP BY c.vec_id)
              SELECT vec_id, ms AS max_bench_sim FROM m WHERE ms < 0.25""")),

    // T15 — deterministic weighted mixture sampling (domain reweighting):
    // even-numbered sources keep 30%, odd keep 10%, selected in md5 order so
    // the carve-out is reproducible. Quota per stratum = ceil(f·n).
    Entry(
      "t15_weighted_mix",
      (s, d) =>
        TopK.weightedStratifiedSample(
            docs(s, d).select("doc_id", "source"), Seq("source"), "doc_id",
            when(substring(col("source"), 4, 10).cast("int") % 2 === 0, 0.3)
              .otherwise(0.1))
          .select(
            col("doc_id"), col("source"), col("rank").cast("long").as("rank")),
      Some("""WITH s AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
                         FROM documents),
                   n AS (SELECT source, count(*) AS ns FROM s GROUP BY source),
                   k AS (SELECT source,
                                CAST(ceil(ns * (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                                                     THEN 0.3 ELSE 0.1 END)) AS BIGINT) AS ks
                         FROM n),
                   r AS (SELECT doc_id, source,
                                row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rank
                         FROM s)
              SELECT r.doc_id, r.source, r.rank
              FROM r JOIN k USING (source) WHERE r.rank <= k.ks""")),

    // T16 — per-language length-decile bucketing (curriculum binning) via
    // the distributed-rank cut points of Quantiles.exactGrouped — the ntile
    // formulation would sort each whole language in one task; this never
    // sorts a group anywhere.
    Entry(
      "t16_quantile_buckets",
      (s, d) =>
        Quantiles.withQuantileBucket(
            docs(s, d).select("doc_id", "lang", "n_chars"),
            Seq("lang"), "n_chars", nBuckets = 10)
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("cnt")),
      Some("""WITH c AS (SELECT lang,
                                ROUND(quantile_cont(n_chars, 0.1) + 1e-9, 6) AS c1,
                                ROUND(quantile_cont(n_chars, 0.2) + 1e-9, 6) AS c2,
                                ROUND(quantile_cont(n_chars, 0.3) + 1e-9, 6) AS c3,
                                ROUND(quantile_cont(n_chars, 0.4) + 1e-9, 6) AS c4,
                                ROUND(quantile_cont(n_chars, 0.5) + 1e-9, 6) AS c5,
                                ROUND(quantile_cont(n_chars, 0.6) + 1e-9, 6) AS c6,
                                ROUND(quantile_cont(n_chars, 0.7) + 1e-9, 6) AS c7,
                                ROUND(quantile_cont(n_chars, 0.8) + 1e-9, 6) AS c8,
                                ROUND(quantile_cont(n_chars, 0.9) + 1e-9, 6) AS c9
                         FROM documents GROUP BY lang)
              SELECT d.lang,
                     CAST(1 + ((d.n_chars > c1)::INT + (d.n_chars > c2)::INT
                             + (d.n_chars > c3)::INT + (d.n_chars > c4)::INT
                             + (d.n_chars > c5)::INT + (d.n_chars > c6)::INT
                             + (d.n_chars > c7)::INT + (d.n_chars > c8)::INT
                             + (d.n_chars > c9)::INT) AS BIGINT) AS bucket,
                     count(*) AS cnt
              FROM documents d JOIN c USING (lang)
              GROUP BY 1, 2""")),

    // T17 — n-gram novelty: fraction of each doc's distinct trigrams found
    // nowhere else in the corpus (inverse boilerplate signal). Gram
    // construction mirrors t07's decontamination unit exactly.
    Entry(
      "t17_novelty",
      (s, d) => TextAnalysis.noveltyScore(docs(s, d), "doc_id", "text", n = 3),
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
                   g AS (SELECT doc_id,
                                list_distinct([array_to_string(toks[i:i+2], ' ')
                                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS grams
                         FROM tk),
                   x AS (SELECT doc_id, unnest(grams) AS gram FROM g),
                   f AS (SELECT gram, count(*) AS df FROM x GROUP BY gram)
              SELECT x.doc_id, count(*) AS n_grams,
                     CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
                     ROUND(CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                           / count(*) + 1e-9, 6) AS novelty
              FROM x JOIN f USING (gram) GROUP BY x.doc_id""")),

    // D10 — cluster-canonical selection: d06's near-dup components carried
    // through to the step that actually shrinks the corpus — per cluster
    // keep the longest member (ties to the lowest id) and map every doc to
    // its keeper. The keeper pick is ONE max_by hash aggregate per cluster
    // (no per-cluster sort, no window), so a million-member cluster is a
    // combiner-absorbed hot KEY, not a hot task.
    Entry(
      "d10_canonical",
      (s, d) => {
        val documents = docs(s, d)
        val labels = Dedup.connectedComponents(
          documents.select("doc_id"), "doc_id",
          Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
            .select("a_id", "b_id"),
          "a_id", "b_id")
        Dedup.canonicalByCluster(
          labels.join(
            documents.select(
              col("doc_id"),
              TextAnalysis.tokenCount(col("text")).as("_n_toks")),
            Seq("doc_id")),
          "doc_id", "cluster_id", "_n_toks")
          .select("doc_id", "cluster_id", "keeper_id", "kept")
      },
      Some("""WITH RECURSIVE
                n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                      FROM documents),
                t AS (SELECT doc_id,
                             list_distinct([substring(norm, i, 5)
                                            for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                      FROM n),
                p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                      FROM t a JOIN t b
                        ON a.doc_id < b.doc_id
                       AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
                      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
                e AS (SELECT a_id AS src, b_id AS dst FROM p
                      UNION SELECT b_id, a_id FROM p),
                reach(src, dst) AS (
                  SELECT src, dst FROM e
                  UNION
                  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
                m AS (SELECT src, MIN(dst) AS mn FROM reach GROUP BY src),
                lab AS (SELECT d.doc_id AS doc_id,
                               LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
                        FROM documents d LEFT JOIN m ON d.doc_id = m.src),
                q AS (SELECT doc_id,
                             len(string_split_regex(trim(lower(text)), '\s+')) AS n_toks
                      FROM documents),
                k AS (SELECT cluster_id, doc_id AS keeper_id FROM
                      (SELECT lab.cluster_id, lab.doc_id,
                              row_number() OVER (PARTITION BY lab.cluster_id
                                                 ORDER BY q.n_toks DESC, lab.doc_id) AS rn
                       FROM lab JOIN q USING (doc_id)) WHERE rn = 1)
              SELECT lab.doc_id AS doc_id, lab.cluster_id AS cluster_id,
                     k.keeper_id AS keeper_id,
                     lab.doc_id = k.keeper_id AS kept
              FROM lab JOIN k USING (cluster_id)""")),

    // D11 — incremental (cross-corpus) exact dedup, the ingestion-time form:
    // a batch of new docs is admitted only where its normalized-text hash is
    // absent from the accumulated corpus AND first within the batch. Corpus
    // side moves only as its DISTINCT hash set (the hash index, not the
    // text); all three exchanges hash on the same key.
    Entry(
      "d11_incremental",
      (s, d) => {
        val documents = docs(s, d)
        Dedup.incrementalDedup(
          documents.filter(col("doc_id") % 3 =!= 0),
          documents.filter(col("doc_id") % 3 === 0),
          "doc_id", "text")
      },
      Some("""WITH n AS (SELECT doc_id,
                                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash
                         FROM documents),
                   c AS (SELECT DISTINCT text_hash FROM n WHERE doc_id % 3 = 0),
                   b AS (SELECT doc_id, text_hash FROM n WHERE doc_id % 3 <> 0),
                   f AS (SELECT text_hash, min(doc_id) AS first_id FROM b GROUP BY text_hash)
              SELECT b.doc_id AS doc_id, b.text_hash AS text_hash,
                     (c.text_hash IS NOT NULL) AS dup_of_corpus,
                     (c.text_hash IS NULL AND b.doc_id = f.first_id) AS kept
              FROM b LEFT JOIN c USING (text_hash) JOIN f USING (text_hash)""")),

    // T18 — scored decontamination: t07's binary flag graded into the
    // contamination FRACTION (shared ÷ distinct grams), the form a
    // threshold-policy pipeline actually consumes. LEFT gram join so
    // unshared grams still count the denominator; same no-doc×doc shape as
    // t07/t17.
    Entry(
      "t18_contam_score",
      (s, d) => {
        val documents = docs(s, d)
        TextAnalysis.contaminationScore(
          documents.filter(col("doc_id") % 50 =!= 0),
          documents.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3)
      },
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
                   g AS (SELECT doc_id,
                                list_distinct([array_to_string(toks[i:i+2], ' ')
                                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS grams
                         FROM tk),
                   bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
                   tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0)
              SELECT tr.doc_id AS doc_id, COUNT(*) AS n_grams,
                     CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                     ROUND(CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                           / COUNT(*) + 1e-9, 6) AS contam_score
              FROM tr LEFT JOIN bench ON tr.gram = bench.gram
              GROUP BY tr.doc_id""")),

    // T19 — deterministic corpus shuffle + round-robin shard assignment
    // (training-data export): md5-order permutation, shards balanced to ±1
    // by construction. The global rank is the DISTRIBUTED prefix sum
    // (Packing.globalRunningSum of 1) — the `row_number() OVER (ORDER BY …)`
    // the oracle runs would be a single-task sort at 100 TB.
    Entry(
      "t19_shard",
      (s, d) =>
        Packing.shardAssignments(
            docs(s, d).select("doc_id"), "doc_id", nShards = 16)
          .select("doc_id", "global_rank", "shard", "shard_pos"),
      Some("""WITH r AS (SELECT doc_id,
                                row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS global_rank
                         FROM documents)
              SELECT doc_id, global_rank, (global_rank - 1) % 16 AS shard,
                     (global_rank - 1) // 16 AS shard_pos
              FROM r""")),

    // T20 — corpus-trained unigram log-probability (CCNet-style quality
    // signal): mean per-token ln P(token) with P from this corpus's own
    // frequencies. Oracle replays per-(doc, token) counts → vocabulary
    // frequencies → corpus total → count-weighted mean of ln(freq/total).
    Entry(
      "t20_unigram_logprob",
      (s, d) => TextAnalysis.unigramLogProb(docs(s, d), "doc_id", "text"),
      Some("""WITH t AS (SELECT doc_id,
                                unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                         FROM documents),
                   tf AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w),
                   f AS (SELECT w, SUM(c) AS wc FROM tf GROUP BY w),
                   tot AS (SELECT SUM(wc) AS n FROM f),
                   j AS (SELECT tf.doc_id, tf.c, tf.c * LN(wc / n) AS wlp
                         FROM tf JOIN f USING (w), tot)
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                     ROUND(SUM(wlp) / SUM(c) + 1e-9, 6) AS avg_logprob
              FROM j GROUP BY doc_id""")),

    // T21 — PMI bigram collocations (phrase mining): top-20 bigrams by
    // pointwise mutual information, min pair count 5. Oracle replays
    // unigram counts → bigram counts → totals → ln((c12/M)/((c1/N)(c2/N))).
    Entry(
      "t21_pmi_collocations",
      (s, d) => TextAnalysis.pmiCollocations(docs(s, d), "text", k = 20, minCount = 5),
      Some("""WITH nt AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                          FROM documents),
                   tk AS (SELECT string_split(norm, ' ') AS toks FROM nt),
                   u AS (SELECT unnest(toks) AS w FROM tk),
                   uni AS (SELECT w, COUNT(*) AS c1 FROM u GROUP BY w),
                   n AS (SELECT SUM(c1) AS n FROM uni),
                   bg AS (SELECT unnest([array_to_string(toks[i:i+1], ' ')
                                         for i in range(1, len(toks))]) AS g
                          FROM tk WHERE len(toks) >= 2),
                   m AS (SELECT COUNT(*) AS m FROM bg),
                   pair AS (SELECT g, COUNT(*) AS c12 FROM bg GROUP BY g
                            HAVING COUNT(*) >= 5),
                   sp AS (SELECT string_split(g, ' ') AS ps, c12 FROM pair),
                   sc AS (SELECT ps[1] AS w1, ps[2] AS w2, c12,
                                 ROUND(LN((c12::DOUBLE * n.n * n.n) /
                                          (m.m::DOUBLE * u1.c1 * u2.c1)) + 1e-9, 6) AS pmi
                          FROM sp JOIN uni u1 ON ps[1] = u1.w
                                  JOIN uni u2 ON ps[2] = u2.w, n, m)
              SELECT w1, w2, c12 AS n_pair, pmi FROM sc
              ORDER BY pmi DESC, w1, w2 LIMIT 20""")),

    // T22 — RAG-style overlapping token chunking: 20-token chunks, 5-token
    // overlap, purely map-side (zero shuffle). Oracle replays the
    // normalize → tokenize → ceil((T-o)/step) chunk count → slice pipeline.
    Entry(
      "t22_chunking",
      (s, d) =>
        TextAnalysis.chunkDocs(docs(s, d), "doc_id", "text",
          chunkTokens = 20, overlap = 5),
      Some("""WITH nt AS (SELECT doc_id,
                                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
                          FROM documents),
                   c AS (SELECT doc_id, toks,
                                GREATEST(1, CAST(CEIL((len(toks) - 5)::DOUBLE / 15) AS BIGINT)) AS nc
                         FROM nt),
                   x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM c)
              SELECT doc_id, chunk_id, chunk_id * 15 AS start_tok,
                     len(toks[(chunk_id*15+1):(chunk_id*15+20)]) AS n_tokens,
                     array_to_string(toks[(chunk_id*15+1):(chunk_id*15+20)], ' ') AS chunk_text
              FROM x""")),

    // T23 — temperature-scaled mixture weights (α-smoothing, α = 0.3): the
    // per-source sampling distribution q ∝ p^α that up-samples tail
    // domains. Oracle replays per-source token mass → share → power →
    // renormalize → boost.
    Entry(
      "t23_mixture_weights",
      (s, d) =>
        TopK.temperatureWeights(
          docs(s, d), "source", TextAnalysis.tokenCount(col("text")),
          alpha = 0.3),
      Some("""WITH g AS (SELECT source, COUNT(*) AS n_docs,
                                SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS nt
                         FROM documents GROUP BY source),
                   t AS (SELECT SUM(nt) AS tot FROM g),
                   p AS (SELECT g.source, g.n_docs, g.nt,
                                nt / t.tot AS p, POWER(nt / t.tot, 0.3) AS pa
                         FROM g, t),
                   z AS (SELECT SUM(pa) AS z FROM p)
              SELECT source, n_docs, CAST(nt AS BIGINT) AS n_tokens,
                     ROUND(p + 1e-9, 6) AS p, ROUND(pa / z.z + 1e-9, 6) AS q,
                     ROUND((pa / z.z) / p + 1e-9, 6) AS boost
              FROM p, z""")),

    // T24 — per-source KL drift vs the corpus unigram blend. After the
    // first (source, term) aggregate nothing is corpus-size-proportional;
    // the corpus total is a one-row broadcast. Oracle mirrors the identical
    // left-assoc double arithmetic.
    Entry(
      "t24_source_drift",
      (s, d) => TextAnalysis.sourceDrift(docs(s, d), "source", "text"),
      Some("""WITH toks AS (SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                            FROM documents WHERE source IS NOT NULL),
                   gt AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY source, t),
                   ct AS (SELECT t, SUM(c) AS ctot FROM gt GROUP BY t),
                   gn AS (SELECT source, SUM(c) AS ng FROM gt GROUP BY source),
                   n AS (SELECT SUM(ctot) AS ntot FROM ct)
              SELECT gt.source, COUNT(*) AS n_terms, CAST(SUM(c) AS BIGINT) AS n_tokens,
                     ROUND(SUM((c / ng) * ln((c / ng) / (ctot / ntot))) + 1e-9, 6) AS kl
              FROM gt JOIN ct USING (t) JOIN gn USING (source), n
              GROUP BY gt.source""")),

    // S8 — BM25 lexical retrieval: top-10 documents for a constant 3-term
    // query. The tf columns are per-row HOF kernels inside the scan stage
    // (no token explode, no (doc, term) shuffle); corpus stats are ONE
    // one-row broadcast aggregate; the finisher is TakeOrderedAndProject.
    // Oracle replays the identical arithmetic (same literal constants, same
    // left-assoc order) so doubles agree to the last ulp before rounding.
    Entry(
      "s08_bm25",
      (s, d) =>
        TextAnalysis.bm25TopK(
          docs(s, d), "doc_id", "text",
          queryTerms = Seq("vector", "merge", "scan"), k = 10),
      Some("""WITH p AS (
                SELECT doc_id,
                       CAST(len(toks) AS DOUBLE) AS dl,
                       CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf0,
                       CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tf1,
                       CAST(len(list_filter(toks, x -> x = 'scan')) AS DOUBLE) AS tf2
                FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
              g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                           SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
                           SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
                           SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
                    FROM p),
              sc AS (SELECT doc_id,
                       ROUND(
                         ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + 1e-9, 6) AS bm25
                     FROM p, g)
              SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
              ORDER BY bm25 DESC, doc_id LIMIT 10""")),

    // S9 — per-dimension embedding statistics (monitoring / whitening
    // input). posexplode → 64-key hash aggregate: shuffle ∝ dims ×
    // partitions, corpus-size-independent. Oracle zips two unnests
    // (dimension index + value) — DuckDB zips parallel unnests positionally.
    Entry(
      "s09_embed_stats",
      (s, d) => Similarity.dimensionStats(embs(s, d), "embedding"),
      Some("""WITH u AS (
                SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
                       unnest(CAST(embedding AS DOUBLE[])) AS v
                FROM embeddings)
              SELECT dim, COUNT(*) AS n,
                     ROUND(AVG(v) + 1e-9, 6) AS mean,
                     ROUND(var_pop(v) + 1e-9, 6) AS variance,
                     MIN(v) AS vmin, MAX(v) AS vmax
              FROM u GROUP BY dim""")),

    // S10 — SQ8-compressed exact retrieval: per-dimension (min, max) bounds
    // quantize every corpus vector to 1 byte/dim; top-k cosine runs against
    // the RECONSTRUCTED corpus with the query left full-precision (ADC).
    // Oracle replays bounds, round-trip quantization, and cosine with the
    // identical left-associated arithmetic (64 dims hardcoded — the
    // embeddings table's width; the operator itself is dims-agnostic).
    Entry(
      "s10_sq8_topk",
      (s, d) =>
        Similarity.sq8TopK(embs(s, d), "vec_id", "embedding", 0L, 5),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   px AS (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   b AS (SELECT list(mn ORDER BY pos) AS mns, list(ext ORDER BY pos) AS exts
                         FROM (SELECT pos, MIN(val) AS mn, MAX(val) - MIN(val) AS ext
                               FROM px GROUP BY pos)),
                   r AS (SELECT vec_id,
                                [CASE WHEN exts[i+1] = 0 THEN mns[i+1]
                                      ELSE mns[i+1] + round((v[i+1]-mns[i+1])*255.0/exts[i+1])*exts[i+1]/255.0
                                 END for i in range(0, 64)] AS rv
                         FROM e, b),
                   q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
                   cand AS (SELECT r.vec_id AS vec_id,
                                   list_cosine_similarity(r.rv, q.qv) AS raw
                            FROM r, q WHERE r.vec_id <> 0)
              SELECT vec_id, ROUND(raw, 6) AS sim FROM cand
              WHERE NOT isnan(raw)
              ORDER BY raw DESC, vec_id LIMIT 5""")),

    // S11 — compressed IVF: candidates pruned to the top-nProbe label cells
    // (s01's coarse path, centroids from RAW vectors) AND the resident
    // corpus held as SQ8 codes, reconstructed map-side before the cosine —
    // the pairing that holds at 100 TB (scan ∝ probed cells, bytes ∝ ¼).
    Entry(
      "s11_sq8_ivf",
      (s, d) =>
        Similarity.sq8IvfTopK(
          embs(s, d), "vec_id", "embedding", "label", 0L, 5, nProbe = 2),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
                   cx AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM cx GROUP BY label, pos)
                            GROUP BY label),
                   probed AS (SELECT cent.label FROM cent, q
                              ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label
                              LIMIT 2),
                   b AS (SELECT list(mn ORDER BY pos) AS mns, list(ext ORDER BY pos) AS exts
                         FROM (SELECT pos, MIN(val) AS mn, MAX(val) - MIN(val) AS ext
                               FROM cx GROUP BY pos)),
                   r AS (SELECT vec_id, label,
                                [CASE WHEN exts[i+1] = 0 THEN mns[i+1]
                                      ELSE mns[i+1] + round((v[i+1]-mns[i+1])*255.0/exts[i+1])*exts[i+1]/255.0
                                 END for i in range(0, 64)] AS rv
                         FROM e, b),
                   cand AS (SELECT r.vec_id AS vec_id,
                                   list_cosine_similarity(r.rv, q.qv) AS raw
                            FROM r JOIN probed ON r.label = probed.label, q
                            WHERE r.vec_id <> 0)
              SELECT vec_id, ROUND(raw, 6) AS sim FROM cand
              WHERE NOT isnan(raw)
              ORDER BY raw DESC, vec_id LIMIT 5""")),

    // S12 — recall@k audit: the acceptance gate for every approximate index.
    // Exact ground truth (brute-force top-5) vs the IVF probe's top-5, per
    // query; recall = |overlap| / |ground truth|. The audit join touches two
    // queries×k frames only — corpus cost is the two probes themselves. The
    // oracle replays both rankings with the identical NaN guard and
    // (sim DESC, id ASC) tie-breaks, then the same left-join overlap count.
    Entry(
      "s12_recall_audit",
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") % 50 === 0)
        val exact = Similarity.bruteForceBatch(
          e, "vec_id", "embedding", q, "vec_id", "embedding",
          k = 5, excludeSelf = true)
        // guardBroadcast = false: the modulo sample is bounded by
        // construction, and the guard's head-count would re-execute the
        // lazy filter's full corpus lineage once per probe call
        val approx = Similarity.probeIvf(
          Similarity.buildIvfIndex(e, "vec_id", "embedding", col("label")),
          q, "vec_id", "embedding", k = 5, nProbe = 2, excludeSelf = true,
          guardBroadcast = false)
        Similarity.recallAtK(exact, approx, "vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
                   ex AS (SELECT q.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
                          FROM e, q
                          WHERE e.vec_id <> q.q_id
                            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
                   exact AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   cr AS (SELECT q.q_id, cent.label,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label) AS crk
                          FROM cent, q),
                   probed AS (SELECT q_id, label FROM cr WHERE crk <= 2),
                   ax AS (SELECT p.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY p.q_id
                                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
                          FROM e JOIN probed p ON e.label = p.label
                                 JOIN q ON q.q_id = p.q_id
                          WHERE e.vec_id <> p.q_id
                            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
                   approx AS (SELECT q_id, vec_id FROM ax WHERE rk <= 5)
              SELECT exact.q_id AS q_id,
                     ROUND(SUM(CASE WHEN approx.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                           / COUNT(*), 6) AS recall
              FROM exact LEFT JOIN approx
                ON exact.q_id = approx.q_id AND exact.vec_id = approx.vec_id
              GROUP BY exact.q_id""")),

    // S29 — IVF nProbe operating curve: the FAISS-benchmark tuning table
    // s12's single-config audit can't be — mean recall@5 at nProbe ∈
    // {1, 2, 4} (10% / 20% / 40% of the 10 cells scanned), in ONE query.
    // Ground truth is ONE brute-force pass over the query sample; the
    // index is built once and probed three times, each probe touching
    // only probed-cell members. The GENERATED oracle shares the
    // exact/centroid CTEs across the three settings and unrolls one
    // probed→ranked→recall chain per nProbe. The hash-checked content is
    // the CURVE — recall must be non-decreasing in nProbe by construction
    // (probed sets are nested), so any cell-routing bug that breaks
    // nesting breaks the hash.
    Entry(
      "s29_nprobe_curve",
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") % 50 === 0)
        val exact = Similarity.bruteForceBatch(
          e, "vec_id", "embedding", q, "vec_id", "embedding",
          k = 5, excludeSelf = true)
        val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", col("label"))
        Seq(1, 2, 4).map { np =>
          Similarity.recallAtK(
            exact,
            Similarity.probeIvf(idx, q, "vec_id", "embedding", k = 5,
              nProbe = np, excludeSelf = true, guardBroadcast = false),
            "vec_id")
            .agg(
              count(lit(1)).as("n_queries"),
              stableRound(avg("recall"), 6).as("mean_recall"))
            .withColumn("n_probe", lit(np))
        }.reduce(_ unionByName _)
          .select("n_probe", "n_queries", "mean_recall")
      },
      Some {
        def chain(np: Int) =
          s"""probed$np AS (SELECT q_id, label FROM cr WHERE crk <= $np),
             |ax$np AS (SELECT p.q_id, e.vec_id,
             |                 row_number() OVER (PARTITION BY p.q_id
             |                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
             |          FROM e JOIN probed$np p ON e.label = p.label
             |                 JOIN q ON q.q_id = p.q_id
             |          WHERE e.vec_id <> p.q_id
             |            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
             |rec$np AS (SELECT exact.q_id,
             |                  ROUND(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             |                        / COUNT(*), 6) AS recall
             |           FROM exact LEFT JOIN (SELECT q_id, vec_id FROM ax$np WHERE rk <= 5) a
             |             ON exact.q_id = a.q_id AND exact.vec_id = a.vec_id
             |           GROUP BY exact.q_id),
             |agg$np AS (SELECT $np AS n_probe, COUNT(*) AS n_queries,
             |                  ROUND(AVG(recall) + 1e-9, 6) AS mean_recall FROM rec$np)""".stripMargin
        s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |     q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
           |     ex AS (SELECT q.q_id, e.vec_id,
           |                   row_number() OVER (PARTITION BY q.q_id
           |                                      ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
           |            FROM e, q
           |            WHERE e.vec_id <> q.q_id
           |              AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
           |     exact AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
           |     px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
           |     cent AS (SELECT label, list(av ORDER BY pos) AS cv
           |              FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
           |              GROUP BY label),
           |     cr AS (SELECT q.q_id, cent.label,
           |                   row_number() OVER (PARTITION BY q.q_id
           |                                      ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label) AS crk
           |            FROM cent, q),
           |${Seq(1, 2, 4).map(chain).mkString(",\n")}
           |SELECT n_probe, n_queries, mean_recall FROM
           |(SELECT * FROM agg1 UNION ALL SELECT * FROM agg2 UNION ALL SELECT * FROM agg4)""".stripMargin
      }),

    // S13 — 1-bit sign quantization + Hamming retrieval: the 32× end of the
    // compressed-residency ladder. Sign bits packed 32-per-BIGINT-word (no
    // set bit ever lands in a sign position, so both engines build
    // identical words), nearest = smallest Σ popcount(xor). Integral
    // distances — zero floating-point parity surface. Oracle hardcodes the
    // embeddings table's 64 dims (2 words); the operator is dims-agnostic.
    Entry(
      "s13_sign_hamming",
      (s, d) =>
        Similarity.signTopK(embs(s, d), "vec_id", "embedding", 64, 0L, 5),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   b AS (SELECT vec_id,
                                CAST(list_sum([CASE WHEN v[j+1] >= 0 THEN (1::BIGINT << j) ELSE 0 END
                                               for j in range(0, 32)]) AS BIGINT) AS w0,
                                CAST(list_sum([CASE WHEN v[j+33] >= 0 THEN (1::BIGINT << j) ELSE 0 END
                                               for j in range(0, 32)]) AS BIGINT) AS w1
                         FROM e),
                   q AS (SELECT w0 AS qw0, w1 AS qw1 FROM b WHERE vec_id = 0),
                   cand AS (SELECT b.vec_id,
                                   bit_count(xor(b.w0, q.qw0)) + bit_count(xor(b.w1, q.qw1)) AS h
                            FROM b, q WHERE b.vec_id <> 0)
              SELECT vec_id, CAST(h AS BIGINT) AS hamming FROM cand
              ORDER BY h, vec_id LIMIT 5""")),

    // S14 — two-stage rerank funnel on dimension prefixes (Matryoshka
    // discipline): stage 1 shortlists 50 per query by cosine on the first
    // 16 dims (¼ of the scan work; at rest the prefix is its own column),
    // stage 2 re-ranks the shortlist with exact full-dimension cosine.
    // Oracle replays both stages with identical NaN guards and tie-breaks.
    Entry(
      "s14_rerank_funnel",
      (s, d) => {
        val e = embs(s, d)
        Similarity.rerankTopK(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 5, prefixDims = 16, shortlist = 50, guardBroadcast = false)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
                   coarse AS (SELECT q.q_id, e.vec_id,
                                     row_number() OVER (PARTITION BY q.q_id
                                                        ORDER BY list_cosine_similarity(e.v[1:16], q.qv[1:16]) DESC, e.vec_id) AS rk
                              FROM e, q
                              WHERE e.vec_id <> q.q_id
                                AND NOT isnan(list_cosine_similarity(e.v[1:16], q.qv[1:16]))),
                   short AS (SELECT q_id, vec_id FROM coarse WHERE rk <= 50),
                   r AS (SELECT s.q_id, s.vec_id,
                                list_cosine_similarity(e.v, q.qv) AS raw,
                                row_number() OVER (PARTITION BY s.q_id
                                                   ORDER BY list_cosine_similarity(e.v, q.qv) DESC, s.vec_id) AS rank
                         FROM short s JOIN e ON e.vec_id = s.vec_id
                              JOIN q ON q.q_id = s.q_id
                         WHERE NOT isnan(list_cosine_similarity(e.v, q.qv)))
              SELECT q_id, rank, vec_id, ROUND(raw, 6) AS sim FROM r
              WHERE rank <= 5""")),

    // T25 — Naive Bayes language classifier (the fastText-style curation
    // classifier): train token→lang log-probs on the deterministic 90%
    // split, score the held-out 10%, argmax per doc. (On THIS synthetic
    // corpus the langs share one token vocabulary, so accuracy sits at the
    // majority prior — the oracle pins the math, not the signal; on real
    // text the same pipeline separates languages.) The oracle replays
    // training (counts → smoothed conditionals → priors) and scoring
    // (per-doc token counts × per-label lookups → rounded log-posterior →
    // argmax, ties on label) with identical rounding BEFORE the argmax so
    // the winner is decided on identical numbers in both engines.
    Entry(
      "t25_nb_langid",
      (s, d) => {
        val split = TextAnalysis.deterministicSplit(docs(s, d), "doc_id")
        val model = Classifier.trainNaiveBayes(
          split.filter(col("split") === "train"), "text", "lang")
        Classifier.scoreNaiveBayes(
          model, split.filter(col("split") =!= "train"), "doc_id", "text")
      },
      Some("""WITH b AS (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 100 AS bucket
              FROM documents),
                   tr AS (SELECT d.* FROM documents d JOIN b USING (doc_id) WHERE bucket < 90),
                   te AS (SELECT d.* FROM documents d JOIN b USING (doc_id) WHERE bucket >= 90),
                   tt AS (SELECT lang AS label,
                                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                          FROM tr),
                   cnt AS (SELECT label, w, COUNT(*) AS c FROM tt GROUP BY 1, 2),
                   v AS (SELECT COUNT(DISTINCT w) AS v FROM cnt),
                   lt AS (SELECT label, SUM(c) AS nl FROM cnt GROUP BY 1),
                   cond AS (SELECT label, w, LN((c + 1)::DOUBLE / (nl + v)) AS lp
                            FROM cnt JOIN lt USING (label), v),
                   fb AS (SELECT label, LN(1.0 / (nl + v)) AS lp0 FROM lt, v),
                   n AS (SELECT COUNT(*) AS n FROM tr),
                   pr AS (SELECT lang AS label, LN(COUNT(*)::DOUBLE / n.n) AS prior
                          FROM tr, n GROUP BY lang, n.n),
                   dt AS (SELECT doc_id, w, COUNT(*) AS cw
                          FROM (SELECT doc_id,
                                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                                FROM te)
                          GROUP BY 1, 2),
                   sc AS (SELECT dt.doc_id, pr.label,
                                 ROUND(pr.prior + SUM(dt.cw * COALESCE(cond.lp, fb.lp0)) + 1e-9, 6) AS score
                          FROM dt
                               CROSS JOIN pr
                               JOIN fb ON fb.label = pr.label
                               LEFT JOIN cond ON cond.label = pr.label AND cond.w = dt.w
                          GROUP BY dt.doc_id, pr.label, pr.prior),
                   rk AS (SELECT doc_id, label, score,
                                 row_number() OVER (PARTITION BY doc_id
                                                    ORDER BY score DESC, label) AS rk
                          FROM sc)
              SELECT doc_id, label AS pred_label, score FROM rk WHERE rk = 1""")),

    // C4 — ROC threshold sweep for a curation cutoff (score = n_chars,
    // positive class = lang 'en'): cumulative confusion counts per distinct
    // score under "keep when score ≥ threshold". Counts are exact longs —
    // the hash-robust part — and the rates are rounded identically on both
    // sides. Oracle replays the collapse-then-cumulate shape directly.
    Entry(
      "c04_roc_sweep",
      (s, d) => Profiling.rocSweep(
        docs(s, d).withColumn("is_en", col("lang") === "en"),
        "n_chars", "is_en"),
      Some("""WITH per AS (SELECT CAST(n_chars AS DOUBLE) AS threshold,
                                  COUNT(*) FILTER (lang = 'en') AS pos,
                                  COUNT(*) FILTER (lang <> 'en') AS neg
                           FROM documents GROUP BY 1),
                   tot AS (SELECT COUNT(*) FILTER (lang = 'en') AS p,
                                  COUNT(*) FILTER (lang <> 'en') AS n
                           FROM documents),
                   c AS (SELECT threshold,
                                CAST(SUM(pos) OVER (ORDER BY threshold DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
                                CAST(SUM(neg) OVER (ORDER BY threshold DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
                         FROM per)
              SELECT threshold, tp, fp, p - tp AS fn, n - fp AS tn,
                     ROUND(tp::DOUBLE / p + 1e-9, 6) AS tpr,
                     ROUND(fp::DOUBLE / n + 1e-9, 6) AS fpr
              FROM c, tot""")),

    // Q33 — conversion funnel (ordered-sequence analytics): earliest
    // view → click → purchase chain per user, each step strictly after the
    // previous step's earliest qualified time. Pure conditional
    // aggregation — no window, no sort, no self-join (see the operator's
    // equivalence argument). The oracle keeps the textbook stacked-window
    // formulation: an INDEPENDENT derivation of the same semantics.
    Entry(
      "q33_funnel_steps",
      (s, d) => Sequence.funnelTimes(
        graft.Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")),
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                                epoch_us(ts) AS t
                         FROM events),
                   o1 AS (SELECT *,
                                 MIN(CASE WHEN event_type = 'view' THEN t END)
                                   OVER w AS v
                          FROM e
                          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                   o2 AS (SELECT *,
                                 CASE WHEN event_type = 'click' AND t > v THEN t END AS qc
                          FROM o1),
                   o3 AS (SELECT *, MIN(qc) OVER w AS c
                          FROM o2
                          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                   o4 AS (SELECT *,
                                 CASE WHEN event_type = 'purchase' AND t > c THEN t END AS qp
                          FROM o3)
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN t END) AS t_view,
                     MIN(qc) AS t_click,
                     MIN(qp) AS t_purchase
              FROM o4 GROUP BY user_id""")),

    // Q34 — weekly cohort retention: users bucketed by first-activity week
    // (epoch-anchored), counted per (cohort, active) week pair. Exact-long
    // output; shuffle after the distinct collapse ∝ users × active weeks.
    Entry(
      "q34_cohort_retention",
      (s, d) => Sequence.cohortRetention(
        graft.Tables.events(s, d), "user_id", "ts",
        bucketUs = 7L * 86400 * 1000000),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
                   f AS (SELECT user_id, MIN(t) AS t0 FROM e GROUP BY user_id),
                   a AS (SELECT DISTINCT e.user_id,
                                         f.t0 // 604800000000 AS cohort_bucket,
                                         e.t // 604800000000 AS active_bucket
                         FROM e JOIN f USING (user_id))
              SELECT cohort_bucket, active_bucket,
                     COUNT(*) AS n_entities
              FROM a GROUP BY 1, 2""")),

    // Q35 — resample to a regular daily grid with forward fill (gap
    // filling for sensor/ops series): per-entity grid over its own range,
    // latest observation at-or-before each grid instant, null before the
    // first. Same-instant observations collapse to max on BOTH sides so
    // the as-of tie-break cannot diverge; the oracle uses DuckDB's native
    // ASOF LEFT JOIN against the identical grid.
    Entry(
      "q35_resample_ffill",
      (s, d) => Sequence.resampleFfill(
        graft.Tables.events(s, d), "user_id", "ts", "value",
        stepUs = 86400000000L),
      Some("""WITH e0 AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
                   e AS (SELECT user_id, t, MAX(value) AS value
                         FROM e0 GROUP BY 1, 2),
                   r AS (SELECT user_id,
                                MIN(t // 86400000000) AS b0,
                                MAX(t // 86400000000) AS b1
                         FROM e GROUP BY user_id),
                   g AS (SELECT user_id,
                                unnest(generate_series(b0, b1)) * 86400000000 AS grid_ts
                         FROM r)
              SELECT g.user_id, g.grid_ts, e.value AS value
              FROM g ASOF LEFT JOIN e
                ON g.user_id = e.user_id AND g.grid_ts >= e.t""")),

    // Q39 — pairwise correlation matrix over the fact table's numeric
    // columns (ingest diagnostic, the relationship half of q32): one
    // corpus pass computes every pair's complete-case closed-form sums;
    // the oracle replays the identical formula per pair (NOT corr(),
    // whose different accumulation float-diverges).
    Entry(
      "q39_correlation",
      (s, d) => Profiling.correlationMatrix(
        Tables.load(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        (for { i <- cols.indices; j <- cols.indices if i < j } yield {
          val (a, b) = (cols(i), cols(j))
          s"""SELECT '$a' AS col_a, '$b' AS col_b, COUNT(*) AS n_pairs,
                     ROUND(CASE WHEN COUNT(*) >= 2
                                 AND COUNT(*) * SUM($a * $a) - SUM($a) * SUM($a) > 0
                                 AND COUNT(*) * SUM($b * $b) - SUM($b) * SUM($b) > 0
                           THEN (COUNT(*) * SUM($a * $b) - SUM($a) * SUM($b))
                                / sqrt((COUNT(*) * SUM($a * $a) - SUM($a) * SUM($a))
                                       * (COUNT(*) * SUM($b * $b) - SUM($b) * SUM($b)))
                           END + 1e-9, 6) AS corr
              FROM lineitem WHERE $a IS NOT NULL AND $b IS NOT NULL"""
        }).mkString(" UNION ALL ")
      }),

    // D15 — character-level near-dup pairs (Levenshtein ≤ 8 within
    // 4-char-prefix blocks, length band pre-filter): the typo/OCR-noise
    // modality the token-set dedup family misses. The oracle replays the
    // identical blocking so the candidate sets match exactly; DuckDB's
    // unbounded levenshtein agrees with Spark's thresholded form on every
    // kept pair (both are the true distance when ≤ maxDist).
    Entry(
      "d15_edit_distance",
      (s, d) => Dedup.editDistancePairs(docs(s, d), "doc_id", "text", maxDist = 8),
      Some("""WITH n AS (SELECT doc_id,
                                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   p AS (SELECT doc_id, norm, substr(norm, 1, 4) AS pfx,
                                length(norm) AS len
                         FROM n)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     levenshtein(a.norm, b.norm) AS dist
              FROM p a JOIN p b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
              WHERE abs(a.len - b.len) <= 8
                AND levenshtein(a.norm, b.norm) <= 8""")),

    // Q36 — per-entity least-squares trend (metric drift detection): slope
    // and intercept of value vs time-in-days, closed-form sums in ONE
    // aggregate. x is centered on the data's own min epoch (the operator's
    // conditioning contract); the oracle replays the identical formula —
    // NOT regr_slope, whose different accumulation would float-diverge.
    Entry(
      "q36_trend",
      (s, d) => {
        val e = graft.Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("value"))
        val t0 = e.agg(min("ts").as("_t0"))
        Profiling.groupTrend(
          e.crossJoin(broadcast(t0))
            .withColumn(
              "x", (col("ts") - col("_t0")).cast("double") / 86400000000.0),
          Seq("user_id"), "x", "value")
      },
      Some("""WITH m AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
                   e AS (SELECT user_id,
                                (epoch_us(ts) - t0)::DOUBLE / 86400000000 AS x,
                                value AS y
                         FROM events, m),
                   a AS (SELECT user_id, COUNT(*) AS n_points,
                                SUM(x) AS sx, SUM(y) AS sy,
                                SUM(x * y) AS sxy, SUM(x * x) AS sxx
                         FROM e GROUP BY 1),
                   f AS (SELECT *, n_points::DOUBLE AS n,
                                n_points::DOUBLE * sxx - sx * sx AS denom
                         FROM a)
              SELECT user_id, n_points,
                     ROUND(CASE WHEN denom <> 0
                                THEN (n * sxy - sx * sy) / denom END + 1e-9, 6) AS slope,
                     ROUND(CASE WHEN denom <> 0
                                THEN (sy - (n * sxy - sx * sy) / denom * sx) / n END + 1e-9, 6) AS intercept
              FROM f""")),

    // Q37 — per-entity z-score outliers (anomaly screening): events more
    // than 2 sample standard deviations from their user's mean value.
    // Stats formula replayed explicitly on both sides; membership decided
    // on the ROUNDED z so the boundary cannot float-flip across engines.
    Entry(
      "q37_zscore_outliers",
      (s, d) => Profiling.zscoreOutliers(
        graft.Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("value")),
        Seq("user_id"), "value", zThreshold = 2.0),
      Some("""WITH e AS (SELECT event_id, user_id, value FROM events),
                   st AS (SELECT user_id, COUNT(*) AS n,
                                 SUM(value) AS sv, SUM(value * value) AS svv
                          FROM e GROUP BY 1),
                   s2 AS (SELECT user_id,
                                 sv / n AS mu,
                                 sqrt((svv - sv * sv / n) / (n - 1)) AS sigma
                          FROM st WHERE n > 1),
                   z AS (SELECT e.event_id, e.user_id, e.value,
                                ROUND((e.value - s2.mu) / s2.sigma + 1e-9, 6) AS z
                         FROM e JOIN s2
                           ON e.user_id IS NOT DISTINCT FROM s2.user_id
                         WHERE s2.sigma > 0)
              SELECT event_id, user_id, value, z FROM z
              WHERE abs(z) > 2.0""")),

    // Q38 — event-type transition matrix (process mining): consecutive
    // pairs per user under (ts, event_id) order, counted and
    // row-normalized. Everything after the one sorted window is
    // types²-sized. The oracle replays lead() under the identical order.
    Entry(
      "q38_transitions",
      (s, d) => Sequence.transitionCounts(
        graft.Tables.events(s, d), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                                epoch_us(ts) AS t
                         FROM events),
                   sq AS (SELECT event_type AS from_type,
                                 lead(event_type) OVER (PARTITION BY user_id
                                                        ORDER BY t, event_id) AS to_type
                          FROM e),
                   c AS (SELECT from_type, to_type, COUNT(*) AS n_transitions
                         FROM sq WHERE to_type IS NOT NULL GROUP BY 1, 2),
                   tot AS (SELECT from_type, SUM(n_transitions) AS ft
                           FROM c GROUP BY 1)
              SELECT c.from_type, c.to_type, c.n_transitions,
                     ROUND(c.n_transitions::DOUBLE / tot.ft + 1e-9, 6) AS p
              FROM c JOIN tot USING (from_type)""")),

    // T26 — sliding-window duplicated-span coverage (Lee et al. 2021 exact
    // substring dedup, the overlapping form — d08 is the chunk-boundary
    // stand-in): per doc, the fraction of its 8-token windows that occur
    // anywhere else in the corpus. Oracle replays the identical window
    // hashing in SQL.
    Entry(
      "t26_dup_spans",
      (s, d) => SpanDedup.duplicateSpanCoverage(docs(s, d), "doc_id", "text", k = 8),
      Some("""WITH n AS (SELECT doc_id,
                                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
                         FROM documents),
                   w AS (SELECT doc_id, i - 1 AS pos,
                                md5(array_to_string(t[i:i+7], ' ')) AS h
                         FROM n, LATERAL (SELECT unnest(range(1, len(n.t) - 6)) AS i) r
                         WHERE len(t) >= 8),
                   c AS (SELECT h, COUNT(*) AS cnt FROM w GROUP BY h),
                   pd AS (SELECT w.doc_id, COUNT(*) AS nw,
                                 COUNT(*) FILTER (c.cnt > 1) AS dw
                          FROM w JOIN c USING (h) GROUP BY w.doc_id)
              SELECT d.doc_id,
                     coalesce(pd.nw, 0) AS n_windows,
                     coalesce(pd.dw, 0) AS dup_windows,
                     CASE WHEN pd.nw > 0
                          THEN ROUND(pd.dw::DOUBLE / pd.nw + 1e-9, 6)
                          ELSE 0.0 END AS dup_frac
              FROM documents d LEFT JOIN pd USING (doc_id)""")),

    // T27 — duplicated-span REMOVAL keeping one occurrence: the keeper of
    // each duplicated 8-token window is its smallest (doc, offset); tokens
    // covered only by non-keeper occurrences are dropped and docs rebuilt
    // from the survivors in order. Oracle replays keeper selection, the
    // covered-offset expansion, and the ordered rebuild.
    Entry(
      "t27_strip_spans",
      (s, d) => SpanDedup.stripDuplicateSpans(docs(s, d), "doc_id", "text", k = 8),
      Some("""WITH n AS (SELECT doc_id,
                                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
                         FROM documents),
                   w AS (SELECT doc_id, i - 1 AS pos,
                                md5(array_to_string(t[i:i+7], ' ')) AS h
                         FROM n, LATERAL (SELECT unnest(range(1, len(n.t) - 6)) AS i) r
                         WHERE len(t) >= 8),
                   c AS (SELECT h, COUNT(*) AS cnt,
                                min({'d': doc_id, 'p': pos}) AS keep
                         FROM w GROUP BY h),
                   dr AS (SELECT DISTINCT w.doc_id, ix
                          FROM w JOIN c USING (h),
                               LATERAL (SELECT unnest(range(w.pos, w.pos + 8)) AS ix) r
                          WHERE c.cnt > 1
                            AND NOT (c.keep.d = w.doc_id AND c.keep.p = w.pos)),
                   tk AS (SELECT doc_id, j - 1 AS ix, t[j] AS tok
                          FROM n, LATERAL (SELECT unnest(range(1, len(n.t) + 1)) AS j) r),
                   kp AS (SELECT tk.doc_id, tk.ix, tk.tok
                          FROM tk LEFT JOIN dr
                            ON tk.doc_id = dr.doc_id AND tk.ix = dr.ix
                          WHERE dr.ix IS NULL)
              SELECT d.doc_id,
                     coalesce(string_agg(kp.tok, ' ' ORDER BY kp.ix), '') AS clean_text,
                     count(kp.ix) AS n_kept
              FROM documents d LEFT JOIN kp ON d.doc_id = kp.doc_id
              GROUP BY d.doc_id""")),

    // T28 — bigram LM mean log-probability per doc (CCNet-style perplexity
    // quality signal, one order up from t20's unigram). Model = the corpus
    // itself, MLE, no smoothing; sub-2-token docs emit (0, NULL).
    Entry(
      "t28_bigram_logprob",
      (s, d) => TextAnalysis.bigramLogProb(docs(s, d), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
                                   string_split_regex(trim(lower(text)), '\s+') AS t
                            FROM documents),
                   bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                          FROM toks, LATERAL (SELECT unnest(range(1, len(toks.t))) AS i) r
                          WHERE len(t) >= 2),
                   tf AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
                   bf AS (SELECT b, SUM(c) AS bc FROM tf GROUP BY b),
                   cf AS (SELECT split_part(b, ' ', 1) AS w1, SUM(bc) AS cc
                          FROM bf GROUP BY 1),
                   sc AS (SELECT tf.doc_id,
                                 SUM(tf.c) AS nb,
                                 SUM(tf.c * ln(bf.bc::DOUBLE / cf.cc)) AS wlp
                          FROM tf JOIN bf USING (b)
                                  JOIN cf ON split_part(tf.b, ' ', 1) = cf.w1
                          GROUP BY tf.doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
                     ROUND(sc.wlp / sc.nb + 1e-9, 6) AS avg_logprob
              FROM documents d LEFT JOIN sc USING (doc_id)""")),

    // T29 — weighted sampling without replacement (A-ES): 25 docs with
    // inclusion probability ∝ n_chars, md5-derived randomness so both
    // engines draw the identical sample. One scan + per-partition top-n;
    // no corpus shuffle.
    Entry(
      "t29_weighted_sample",
      (s, d) => TopK.weightedSampleNoReplacement(docs(s, d), "doc_id", "n_chars", n = 25),
      Some("""WITH k AS (SELECT doc_id, n_chars,
                                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT + 0.5)
                                   / 72057594037927936.0) / n_chars AS sk
                         FROM documents
                         WHERE n_chars IS NOT NULL AND n_chars > 0)
              SELECT doc_id, n_chars, ROUND(sk + 1e-9, 6) AS samp_key
              FROM k ORDER BY sk DESC, doc_id LIMIT 25""")),

    // T30 — contamination span localization: WHERE the benchmark overlap
    // sits in each training doc, as maximal contiguous token ranges covered
    // by shared 3-grams (t07's split/gram conventions; n=3 because the
    // synthetic corpus is short — production uses 13). Oracle replays the
    // positioned grams and the gaps-and-islands merge.
    Entry(
      "t30_contam_spans",
      (s, d) => {
        val documents = docs(s, d)
        TextAnalysis.contaminationSpans(
          documents.filter(col("doc_id") % 50 =!= 0),
          documents.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3)
      },
      Some("""WITH nn AS (SELECT doc_id,
                                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
                          FROM documents),
                   bench AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS gram
                             FROM nn, LATERAL (SELECT unnest(range(1, greatest(len(nn.t) - 3, 0) + 2)) AS i) r
                             WHERE doc_id % 50 = 0),
                   p AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+2], ' ') AS gram
                         FROM nn, LATERAL (SELECT unnest(range(1, len(nn.t) - 1)) AS i) r
                         WHERE doc_id % 50 <> 0 AND len(t) >= 3),
                   h AS (SELECT doc_id, pos FROM p
                         WHERE gram IN (SELECT gram FROM bench)),
                   isl AS (SELECT doc_id, pos,
                                  CASE WHEN lag(pos) OVER w IS NULL
                                            OR pos > lag(pos) OVER w + 3
                                       THEN 1 ELSE 0 END AS nw
                           FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
                   g AS (SELECT doc_id, pos,
                                SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS UNBOUNDED PRECEDING) AS grp
                         FROM isl)
              SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 2 AS span_end,
                     COUNT(*) AS n_grams
              FROM g GROUP BY doc_id, grp""")),

    // Q40 — winsorized robust stats per group: values clamped to the
    // group's exact [p05, p95] before mean/sd (heavy-tail-resistant
    // normalization stats). Cuts are q23's quantile semantics rounded to
    // 6 dp before the clamp so boundary membership is engine-portable; sd
    // from explicit sums (the q39 discipline), not stddev().
    Entry(
      "q40_winsorized",
      (s, d) => Profiling.winsorizedStats(
        Tables.load(s, d, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice", lo = 0.05, hi = 0.95),
      Some("""WITH c AS (SELECT l_returnflag,
                                ROUND(quantile_cont(l_extendedprice, 0.05) + 1e-9, 6) AS lo,
                                ROUND(quantile_cont(l_extendedprice, 0.95) + 1e-9, 6) AS hi
                         FROM lineitem WHERE l_extendedprice IS NOT NULL
                         GROUP BY l_returnflag),
                   w AS (SELECT l.l_returnflag AS l_returnflag,
                                l.l_extendedprice AS v, c.lo AS lo, c.hi AS hi,
                                LEAST(GREATEST(l.l_extendedprice, c.lo), c.hi) AS wv
                         FROM lineitem l JOIN c USING (l_returnflag)
                         WHERE l.l_extendedprice IS NOT NULL)
              SELECT l_returnflag, COUNT(*) AS n,
                     CAST(COUNT(*) FILTER (v < lo) AS BIGINT) AS n_lo,
                     CAST(COUNT(*) FILTER (v > hi) AS BIGINT) AS n_hi,
                     ROUND(SUM(wv) / COUNT(*) + 1e-9, 6) AS w_mean,
                     CASE WHEN COUNT(*) > 1
                          THEN ROUND(sqrt((SUM(wv * wv) - SUM(wv) * SUM(wv) / COUNT(*))
                                          / (COUNT(*) - 1)) + 1e-9, 6)
                     END AS w_sd
              FROM w GROUP BY l_returnflag""")),

    // T31 — Zipf-law fit of the vocabulary (OLS of ln freq vs ln rank):
    // the natural-text-vs-synthetic fingerprint. Ranks are a distributed
    // prefix sum on our side; the oracle's row_number() is DuckDB's
    // single-node luxury. Same closed-form sums, same rounding.
    Entry(
      "t31_zipf_fit",
      (s, d) => TextAnalysis.zipfFit(docs(s, d), "text"),
      Some("""WITH tf AS (SELECT t AS w, COUNT(*) AS c
                          FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                                FROM documents)
                          GROUP BY t),
                   r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM tf),
                   p AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y, c FROM r),
                   a AS (SELECT COUNT(*) AS n_types, CAST(SUM(c) AS BIGINT) AS n_tokens,
                                SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                                SUM(x * x) AS sxx, SUM(y * y) AS syy
                         FROM p)
              SELECT n_types, n_tokens,
                     ROUND(-(n_types * sxy - sx * sy) / (n_types * sxx - sx * sx) + 1e-9, 6) AS alpha,
                     ROUND((sy - ((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx)) * sx)
                           / n_types + 1e-9, 6) AS intercept,
                     ROUND((n_types * sxy - sx * sy) * (n_types * sxy - sx * sy)
                           / ((n_types * sxx - sx * sx) * (n_types * syy - sy * sy)) + 1e-9, 6) AS r2
              FROM a""")),

    // D16 — duplicate-cluster size histogram over d06's component
    // assignment: the corpus-duplication monitoring table. The oracle
    // reuses d06's recursive-CTE components and folds twice.
    Entry(
      "d16_cluster_sizes",
      (s, d) => {
        val documents = docs(s, d)
        Dedup.clusterSizeHistogram(
          Dedup.connectedComponents(
            documents.select("doc_id"), "doc_id",
            Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
              .select("a_id", "b_id"),
            "a_id", "b_id"),
          "cluster_id")
      },
      Some("""WITH RECURSIVE
                n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                      FROM documents),
                t AS (SELECT doc_id,
                             list_distinct([substring(norm, i, 5)
                                            for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                      FROM n),
                p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                      FROM t a JOIN t b
                        ON a.doc_id < b.doc_id
                       AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
                      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
                e AS (SELECT a_id AS src, b_id AS dst FROM p
                      UNION SELECT b_id, a_id FROM p),
                reach(src, dst) AS (
                  SELECT src, dst FROM e
                  UNION
                  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
                m AS (SELECT src, MIN(dst) AS mn FROM reach GROUP BY src),
                comp AS (SELECT d.doc_id AS doc_id,
                                LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
                         FROM documents d LEFT JOIN m ON d.doc_id = m.src),
                sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                       FROM comp GROUP BY cluster_id)
              SELECT cluster_size, COUNT(*) AS n_clusters
              FROM sz GROUP BY cluster_size""")),

    // T32 — DSIR importance weights (target = English docs, raw = rest,
    // add-1 smoothing over the union vocabulary). Oracle replays the
    // per-(doc, token) counts → one conditional vocabulary aggregate →
    // one-row totals → per-doc log-ratio fold, LEFT-joined back so
    // token-less docs emit (0, NULL).
    Entry(
      "t32_dsir_weights",
      (s, d) => TextAnalysis.dsirWeights(
        docs(s, d), "doc_id", "text", col("lang") === "en"),
      Some("""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
                                unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                         FROM documents),
                   tf AS (SELECT doc_id, tgt, w, COUNT(*) AS c
                          FROM t GROUP BY doc_id, tgt, w),
                   f AS (SELECT w,
                                SUM(CASE WHEN tgt THEN c ELSE 0 END) AS ct,
                                SUM(CASE WHEN NOT tgt THEN c ELSE 0 END) AS cr
                         FROM tf GROUP BY w),
                   tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM f),
                   j AS (SELECT tf.doc_id, tf.c,
                                tf.c * (LN((ct + 1.0) / (nt + 1.0 * v))
                                        - LN((cr + 1.0) / (nr + 1.0 * v))) AS wlr
                         FROM tf JOIN f USING (w), tot),
                   sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                                 ROUND(SUM(wlr) + 1e-9, 6) AS lw
                          FROM j GROUP BY doc_id)
              SELECT d.doc_id, d.lang = 'en' AS is_target,
                     COALESCE(sc.n, 0) AS n_tokens, sc.lw AS log_weight
              FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""")),

    // D17 — soft-dedup sampling weights over exact normalized-text
    // clusters (alpha=1: each cluster contributes one doc's worth of
    // total weight). The operator is assignment-agnostic; the query uses
    // the q18 hash clusters so the weight math — not the pair generation
    // benched via d02/d16 — is what this entry measures.
    Entry(
      "d17_dup_weight",
      (s, d) => Dedup.duplicationWeights(
        docs(s, d).select(
          col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("cluster")),
        "doc_id", "cluster"),
      Some("""WITH a AS (SELECT doc_id,
                                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS cluster
                         FROM documents),
                   sz AS (SELECT cluster, COUNT(*) AS cluster_size
                          FROM a GROUP BY cluster)
              SELECT a.doc_id, a.cluster, sz.cluster_size,
                     ROUND(POW(sz.cluster_size, -1.0) + 1e-9, 6) AS weight
              FROM a JOIN sz ON a.cluster IS NOT DISTINCT FROM sz.cluster""")),

    // C05 — calibration/reliability bins for the c04 score/label pair
    // (n_chars as the "classifier" score, is-English as the label): does
    // the score's magnitude track the empirical positive rate? Oracle
    // replays the equal-width binning with identical IEEE-double edge
    // arithmetic.
    Entry(
      "c05_calibration",
      (s, d) => Profiling.calibrationBins(
        docs(s, d).withColumn("is_en", col("lang") === "en"),
        "n_chars", "is_en", nBins = 10),
      Some("""WITH sc AS (SELECT CAST(n_chars AS DOUBLE) AS s, lang = 'en' AS lbl
                          FROM documents WHERE n_chars IS NOT NULL),
                   b AS (SELECT MIN(s) AS mn, MAX(s) AS mx,
                                (MAX(s) - MIN(s)) / 10.0 AS wd
                         FROM sc),
                   binned AS (SELECT CASE WHEN mx = mn THEN 0
                                          ELSE CAST(LEAST(FLOOR((s - mn) / wd), 9) AS INTEGER)
                                     END AS bin,
                                     s, lbl, mn, wd
                              FROM sc, b),
                   g AS (SELECT bin, mn, wd, COUNT(*) AS n,
                                COUNT(*) FILTER (lbl) AS pos,
                                COUNT(*) FILTER (NOT lbl) AS neg,
                                AVG(s) AS ms
                         FROM binned GROUP BY bin, mn, wd)
              SELECT bin, ROUND(mn + bin * wd + 1e-9, 6) AS bin_lo,
                     ROUND(mn + (bin + 1) * wd + 1e-9, 6) AS bin_hi,
                     n, ROUND(ms + 1e-9, 6) AS mean_score,
                     CASE WHEN pos + neg > 0
                          THEN ROUND(pos / CAST(pos + neg AS DOUBLE) + 1e-9, 6)
                     END AS pos_rate
              FROM g""")),

    // S15 — exact maximum-inner-product top-5 of vec_id=0 (the retrieval
    // objective when magnitude carries signal; cosine is q19). The
    // norm-augmentation reduction that turns the whole cosine ANN stack
    // into a MIPS index is spec-covered (approximate path, no oracle).
    Entry(
      "s15_mips",
      (s, d) => Similarity.bruteForceMipsTopK(
        embs(s, d), "vec_id", "embedding", 0L, 5),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                         FROM embeddings WHERE vec_id = 0),
                   sims AS (SELECT e.vec_id AS vec_id,
                                   list_inner_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS ip
                            FROM embeddings e, q WHERE e.vec_id <> 0),
                   top AS (SELECT vec_id, ip FROM sims
                           ORDER BY ip DESC, vec_id LIMIT 5)
              SELECT vec_id, ROUND(ip, 6) AS sim FROM top""")),

    // C06 — end-to-end train-mix builder: soft-dedup weights (d17) ×
    // per-token DSIR tilt (t32, exp(lw/n) — the geometric-mean-per-token
    // form keeps doc length from compounding the exponent) → per-doc
    // effective token mass → per-source temperature mixture (t23 math,
    // α=0.5). Per-doc masses are 6-dp-rounded then summed as DECIMAL so
    // the per-source fold is EXACT and order-independent on both engines
    // (double summation order across 25k docs would drift past the 6-dp
    // compare). Null-text docs carry no token evidence and are excluded
    // from the mix (dsir n_tokens=0).
    Entry(
      "c06_trainmix",
      (s, d) => {
        val documents = docs(s, d)
        val dup = Dedup.duplicationWeights(
          documents.select(
            col("doc_id"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("cluster")),
          "doc_id", "cluster")
        val dsir = TextAnalysis.dsirWeights(
          documents, "doc_id", "text", col("lang") === "en")
        val eff = documents.select("doc_id", "source")
          .join(dup.select("doc_id", "weight"), Seq("doc_id"))
          .join(
            dsir.filter(col("n_tokens") > 0)
              .select("doc_id", "n_tokens", "log_weight"),
            Seq("doc_id"))
          .select(
            col("source"), col("n_tokens"),
            graft.operators.stableRound(
              col("n_tokens") * col("weight") *
                exp(col("log_weight") / col("n_tokens")), 6)
              .cast("decimal(20,6)").as("eff"))
        val g = eff.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("n_tokens"),
          sum("eff").as("_mass"))
        TopK.temperatureFromMass(g, col("_mass"), alpha = 0.5).select(
          col("source"), col("n_docs"), col("n_tokens"),
          graft.operators.stableRound(col("_mass").cast("double"), 4)
            .as("eff_mass"),
          col("p"), col("q"), col("boost"))
      },
      Some("""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
                                unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                         FROM documents),
                   tf AS (SELECT doc_id, tgt, w, COUNT(*) AS c
                          FROM t GROUP BY doc_id, tgt, w),
                   f AS (SELECT w,
                                SUM(CASE WHEN tgt THEN c ELSE 0 END) AS ct,
                                SUM(CASE WHEN NOT tgt THEN c ELSE 0 END) AS cr
                         FROM tf GROUP BY w),
                   tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM f),
                   j AS (SELECT tf.doc_id, tf.c,
                                tf.c * (LN((ct + 1.0) / (nt + 1.0 * v))
                                        - LN((cr + 1.0) / (nr + 1.0 * v))) AS wlr
                         FROM tf JOIN f USING (w), tot),
                   dsir AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                                   ROUND(SUM(wlr) + 1e-9, 6) AS lw
                            FROM j GROUP BY doc_id),
                   a AS (SELECT doc_id,
                                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS cluster
                         FROM documents),
                   sz AS (SELECT cluster, COUNT(*) AS cluster_size
                          FROM a GROUP BY cluster),
                   dup AS (SELECT a.doc_id,
                                  ROUND(POW(sz.cluster_size, -1.0) + 1e-9, 6) AS wt
                           FROM a JOIN sz ON a.cluster IS NOT DISTINCT FROM sz.cluster),
                   eff AS (SELECT d.source, dsir.n AS n_tokens,
                                  CAST(ROUND(dsir.n * dup.wt * EXP(dsir.lw / dsir.n) + 1e-9, 6)
                                       AS DECIMAL(20,6)) AS eff
                           FROM documents d
                           JOIN dup ON d.doc_id = dup.doc_id
                           JOIN dsir ON d.doc_id = dsir.doc_id
                           WHERE dsir.n > 0),
                   g AS (SELECT source, COUNT(*) AS n_docs,
                                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                                SUM(eff) AS mass
                         FROM eff GROUP BY source),
                   tt AS (SELECT SUM(mass) AS tot FROM g),
                   pp AS (SELECT g.*,
                                 CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
                                 POWER(CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE), 0.5) AS pa
                          FROM g, tt),
                   zz AS (SELECT SUM(pa) AS z FROM pp)
              SELECT source, n_docs, n_tokens,
                     ROUND(CAST(mass AS DOUBLE) + 1e-9, 4) AS eff_mass,
                     ROUND(p + 1e-9, 6) AS p,
                     ROUND(pa / zz.z + 1e-9, 6) AS q,
                     ROUND((pa / zz.z) / p + 1e-9, 6) AS boost
              FROM pp, zz""")),

    // S16 — filtered vector search: exact top-5 cosine neighbors of
    // vec_id=0 among label=2 rows only (pre-filter semantics — the exact
    // top-k OF the slice, never a post-filtered short list). The
    // allow-list IVF form is spec-covered (approximate path, no oracle).
    Entry(
      "s16_filtered_knn",
      (s, d) => Similarity.bruteForceTopKFiltered(
        embs(s, d), "vec_id", "embedding", 0L, 5, col("label") === 2),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                         FROM embeddings WHERE vec_id = 0),
                   sims AS (SELECT e.vec_id AS vec_id,
                                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS raw_sim
                            FROM embeddings e, q
                            WHERE e.label = 2 AND e.vec_id <> 0),
                   top AS (SELECT vec_id, raw_sim FROM sims
                           ORDER BY raw_sim DESC, vec_id LIMIT 5)
              SELECT vec_id, ROUND(raw_sim, 6) AS sim FROM top""")),

    // T33 — per-source midrank percentile normalization of a raw score
    // (n_chars): the cross-source calibration step before a global
    // quality cut. Oracle replays the distinct-value running sum and the
    // midrank formula.
    Entry(
      "t33_percentile_norm",
      (s, d) => Quantiles.percentileNormalize(
        docs(s, d).select("doc_id", "source", "n_chars"),
        Seq("source"), "n_chars"),
      Some("""WITH vc AS (SELECT source, CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS c
                          FROM documents WHERE n_chars IS NOT NULL
                          GROUP BY source, CAST(n_chars AS DOUBLE)),
                   r AS (SELECT source, v, c,
                                SUM(c) OVER (PARTITION BY source ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb,
                                SUM(c) OVER (PARTITION BY source) AS n
                         FROM vc)
              SELECT d.doc_id, d.source, d.n_chars,
                     ROUND((cb + 0.5 * c) / n + 1e-9, 6) AS pct
              FROM documents d
              LEFT JOIN r ON d.source IS NOT DISTINCT FROM r.source
                         AND CAST(d.n_chars AS DOUBLE) = r.v""")),

    // T34 — leakage-safe split: hash the duplicate CLUSTER, not the doc,
    // so every member of a near-dup cluster lands in the SAME split —
    // closing the train→test leakage path a per-doc split leaves open
    // (two near-copies straddling the boundary). Pure composition:
    // q18's cluster key through t06's deterministic split; the
    // cluster-coherence property is spec-pinned.
    Entry(
      "t34_leakage_split",
      (s, d) => TextAnalysis.deterministicSplit(
        docs(s, d).select(
          col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("cluster")),
        "cluster"),
      Some("""WITH a AS (SELECT doc_id,
                                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS cluster
                         FROM documents),
                   b AS (SELECT doc_id, cluster,
                                ('0x' || substr(md5(cluster), 1, 14))::UBIGINT::BIGINT % 100 AS bucket
                         FROM a)
              SELECT doc_id, cluster, bucket,
                     CASE WHEN bucket < 90 THEN 'train'
                          WHEN bucket < 95 THEN 'validation'
                          ELSE 'test' END AS split
              FROM b""")),

    // S17 — BM25 through the materialized inverted index (build-once/
    // probe-many lexical retrieval; s08 is the one-shot scan form). Same
    // scoring contract, so the oracle is s08's formulation with this
    // query's terms.
    Entry(
      "s17_bm25_index",
      (s, d) => TextAnalysis.probeBm25(
        TextAnalysis.buildBm25Index(docs(s, d), "doc_id", "text"),
        queryTerms = Seq("table", "sort"), k = 10),
      Some("""WITH p AS (
                SELECT doc_id,
                       CAST(len(toks) AS DOUBLE) AS dl,
                       CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) AS tf0,
                       CAST(len(list_filter(toks, x -> x = 'sort')) AS DOUBLE) AS tf1
                FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
              g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                           SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
                           SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1
                    FROM p),
              sc AS (SELECT doc_id,
                       ROUND(
                         ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + 1e-9, 6) AS bm25
                     FROM p, g)
              SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
              ORDER BY bm25 DESC, doc_id LIMIT 10""")),

    // C07 — hybrid retrieval via reciprocal-rank fusion: s08's lexical
    // BM25 top-10 fused with q19's dense cosine top-10 over the paired
    // id space (doc_id ≡ vec_id in the synthetic corpus), RRF c=60.
    // Ranks derive from the 6-dp-rounded retriever scores (ties on id) so
    // both engines rank identical decimals; the fused fold is k-sized.
    Entry(
      "c07_rrf_fusion",
      (s, d) => {
        // rank each k-bounded retriever list via the windowless sorted-
        // struct collapse — the constant-group perGroup spelling constant-
        // folds its partition away and trips WindowExec's unpartitioned
        // warning (benign at 10 rows, but the logs stay clean)
        val lexRanked = TopK.rankBounded(
            TextAnalysis.bm25TopK(
              docs(s, d), "doc_id", "text",
              queryTerms = Seq("vector", "merge", "scan"), k = 10),
            "doc_id", "bm25")
          .select(col("doc_id"), col("rank"))
        val denseRanked = TopK.rankBounded(
            Similarity.bruteForceTopK(
              embs(s, d), "vec_id", "embedding", 0L, 10),
            "vec_id", "sim")
          .select(col("vec_id").as("doc_id"), col("rank"))
        TopK.reciprocalRankFusion(
          Seq(lexRanked, denseRanked), "doc_id", "rank", k = 10)
      },
      Some("""WITH p AS (
                SELECT doc_id,
                       CAST(len(toks) AS DOUBLE) AS dl,
                       CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf0,
                       CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tf1,
                       CAST(len(list_filter(toks, x -> x = 'scan')) AS DOUBLE) AS tf2
                FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
              g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                           SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
                           SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
                           SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
                    FROM p),
              sc AS (SELECT doc_id,
                       ROUND(
                         ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + 1e-9, 6) AS bm25
                     FROM p, g),
              lex AS (SELECT doc_id,
                             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
                      FROM (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
                            ORDER BY bm25 DESC, doc_id LIMIT 10)),
              q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                    FROM embeddings WHERE vec_id = 0),
              sims AS (SELECT e.vec_id AS vec_id,
                              list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS raw_sim
                       FROM embeddings e, q WHERE e.vec_id <> 0),
              dense AS (SELECT vec_id AS doc_id,
                               row_number() OVER (ORDER BY ROUND(raw_sim, 6) DESC, vec_id) AS rk
                        FROM (SELECT vec_id, raw_sim FROM sims
                              ORDER BY raw_sim DESC, vec_id LIMIT 10)),
              u AS (SELECT doc_id, rk FROM lex
                    UNION ALL SELECT doc_id, rk FROM dense),
              f AS (SELECT doc_id, COUNT(*) AS n_lists,
                           ROUND(SUM(1.0 / (60.0 + rk)) + 1e-9, 6) AS rrf
                    FROM u GROUP BY doc_id)
              SELECT doc_id, n_lists, rrf FROM f
              ORDER BY rrf DESC, doc_id LIMIT 10""")),

    // D18 — dedup-generator evaluation: how much of the MinHash-verified
    // shingle-Jaccard pair set (d02, the recall reference) does the
    // blocked token-Jaccard generator (d04) recover, and at what
    // precision? One-row precision/recall/F1 over canonicalized pairs.
    Entry(
      "d18_dedup_eval",
      (s, d) => {
        val documents = docs(s, d)
        Dedup.pairSetMetrics(
          Dedup.ngramJaccardPairs(
            documents, "doc_id", "text",
            Seq(col("lang"), expr("n_chars div 100")), threshold = 0.5),
          Dedup.minHashLshPairs(documents, "doc_id", "text", threshold = 0.5)
            .select("a_id", "b_id"),
          "a_id", "b_id")
      },
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   sh AS (SELECT doc_id,
                                 list_distinct([substring(norm, i, 5)
                                                for i in range(1, greatest(length(norm) - 5, 0) + 2)]) AS sh
                          FROM n),
                   truth AS (SELECT a.doc_id AS _a, b.doc_id AS _b
                             FROM sh a JOIN sh b
                               ON a.doc_id < b.doc_id
                              AND least(len(a.sh), len(b.sh)) >= 0.5 * greatest(len(a.sh), len(b.sh))
                             WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                                   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
                   tk AS (SELECT doc_id, lang, n_chars // 100 AS blk,
                                 list_distinct(string_split_regex(lower(text), '\s+')) AS toks
                          FROM documents),
                   pred AS (SELECT a.doc_id AS _a, b.doc_id AS _b
                            FROM tk a JOIN tk b
                              ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
                            WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                                  / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5),
                   np AS (SELECT COUNT(*) AS n_pred FROM pred),
                   nt AS (SELECT COUNT(*) AS n_truth FROM truth),
                   nb AS (SELECT COUNT(*) AS n_both
                          FROM (SELECT * FROM pred INTERSECT SELECT * FROM truth))
              SELECT n_pred, n_truth, n_both,
                     CASE WHEN n_pred > 0
                          THEN ROUND(n_both / CAST(n_pred AS DOUBLE) + 1e-9, 6) END AS precision,
                     CASE WHEN n_truth > 0
                          THEN ROUND(n_both / CAST(n_truth AS DOUBLE) + 1e-9, 6) END AS recall,
                     CASE WHEN n_pred > 0 AND n_truth > 0 AND n_both > 0
                          THEN ROUND(2.0 * (n_both / CAST(n_pred AS DOUBLE)) * (n_both / CAST(n_truth AS DOUBLE))
                                     / (n_both / CAST(n_pred AS DOUBLE) + n_both / CAST(n_truth AS DOUBLE)) + 1e-9, 6)
                     END AS f1
              FROM np, nt, nb""")),

    // S18 — the oracled slice of the PCA moment pass: population covariance
    // of the first 8 embedding coordinates via Pca.covarianceSlice (one
    // aggregate + stack unpivot; the full-dimension fit uses the typed
    // O(d²) Gram buffer instead — same math, verified here).
    Entry(
      "s18_pca_cov",
      (s, d) => Pca.covarianceSlice(embs(s, d), "embedding", 8)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("cov")),
      Some("""WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                         WHERE embedding IS NOT NULL AND len(embedding) >= 8
                           AND len(list_filter(embedding[1:8], x -> x IS NULL)) = 0),
                   p AS (SELECT i.i AS i, j.j AS j
                         FROM generate_series(1, 8) AS i(i),
                              generate_series(1, 8) AS j(j)
                         WHERE j.j >= i.i)
              SELECT p.i AS i, p.j AS j, COUNT(*) AS n,
                     ROUND((SUM(v.v[p.i] * v.v[p.j])
                            - SUM(v.v[p.i]) * SUM(v.v[p.j]) / COUNT(*)) / COUNT(*)
                           + 1e-9, 6) AS cov
              FROM v, p GROUP BY p.i, p.j""")),

    // Q41 — declarative data-quality gate over the fact table: six
    // constraints of four plan shapes (row-level one-pass aggregate, keyed
    // uniqueness count, broadcast anti-join referential probe).
    Entry(
      "q41_expectations",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        Expectations.check(li, Seq(
          Expectations.NotNull("l_orderkey"),
          Expectations.InRange("l_discount", 0.0, 0.1),
          Expectations.AcceptedValues("l_returnflag", Seq("A", "N", "R")),
          Expectations.MatchesRegex("l_linestatus", "^[OF]$"),
          Expectations.Unique(Seq("l_orderkey", "l_linenumber")),
          Expectations.RefIntegrity(
            "l_orderkey", Tables.load(s, d, "orders"), "o_orderkey")))
      },
      Some("""WITH t AS (SELECT COUNT(*) AS total FROM lineitem),
                   v1 AS (SELECT COUNT(*) AS v FROM lineitem WHERE l_orderkey IS NULL),
                   v2 AS (SELECT COUNT(*) AS v FROM lineitem
                          WHERE l_discount IS NOT NULL
                            AND (l_discount < 0.0 OR l_discount > 0.1)),
                   v3 AS (SELECT COUNT(*) AS v FROM lineitem
                          WHERE l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A', 'N', 'R')),
                   v4 AS (SELECT COUNT(*) AS v FROM lineitem
                          WHERE l_linestatus IS NOT NULL
                            AND NOT regexp_matches(l_linestatus, '^[OF]$')),
                   v5 AS (SELECT t.total - (SELECT COUNT(*) FROM
                            (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS v
                          FROM t),
                   v6 AS (SELECT COUNT(*) AS v FROM lineitem
                          WHERE l_orderkey IS NOT NULL
                            AND l_orderkey NOT IN
                              (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
              SELECT 'not_null(l_orderkey)' AS expectation, t.total AS total,
                     v1.v AS violations, v1.v = 0 AS pass FROM t, v1
              UNION ALL
              SELECT 'in_range(l_discount, 0.0, 0.1)', t.total, v2.v, v2.v = 0 FROM t, v2
              UNION ALL
              SELECT 'accepted_values(l_returnflag)', t.total, v3.v, v3.v = 0 FROM t, v3
              UNION ALL
              SELECT 'matches_regex(l_linestatus)', t.total, v4.v, v4.v = 0 FROM t, v4
              UNION ALL
              SELECT 'unique(l_orderkey, l_linenumber)', t.total, v5.v, v5.v = 0 FROM t, v5
              UNION ALL
              SELECT 'ref_integrity(l_orderkey -> o_orderkey)', t.total, v6.v, v6.v = 0
              FROM t, v6""")),

    // Q42 — 3-iteration PageRank over the symmetrized customer↔supplier
    // trade graph (edge = some lineitem links the pair through an order) —
    // graph centrality as a per-node feature. The edge table shuffles once;
    // each iteration moves only the node-sized rank table.
    Entry(
      "q42_pagerank",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val ord = Tables.load(s, d, "orders")
        val edges = li
          .join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(
            concat(lit("c:"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s:"), col("l_suppkey").cast("string")).as("dst"))
        GraphRank.pageRank(edges, "src", "dst", iters = 3)
      },
      Some("""WITH pairs AS (SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS c,
                                    's:' || CAST(l.l_suppkey AS VARCHAR) AS s
                             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
                   e AS (SELECT c AS src, s AS dst FROM pairs
                         UNION SELECT s AS src, c AS dst FROM pairs),
                   deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
                   nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
                   r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / nn.n AS r
                          FROM deg, nn),
                   m1 AS (SELECT e.dst AS node, SUM(r0.r / deg.deg) AS m
                          FROM e JOIN r0 ON e.src = r0.node
                                 JOIN deg ON e.src = deg.src
                          GROUP BY e.dst),
                   r1 AS (SELECT d.src AS node,
                                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                                 + CAST(0.85 AS DOUBLE) * COALESCE(m1.m, 0) AS r
                          FROM deg d CROSS JOIN nn LEFT JOIN m1 ON d.src = m1.node),
                   m2 AS (SELECT e.dst AS node, SUM(r1.r / deg.deg) AS m
                          FROM e JOIN r1 ON e.src = r1.node
                                 JOIN deg ON e.src = deg.src
                          GROUP BY e.dst),
                   r2 AS (SELECT d.src AS node,
                                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                                 + CAST(0.85 AS DOUBLE) * COALESCE(m2.m, 0) AS r
                          FROM deg d CROSS JOIN nn LEFT JOIN m2 ON d.src = m2.node),
                   m3 AS (SELECT e.dst AS node, SUM(r2.r / deg.deg) AS m
                          FROM e JOIN r2 ON e.src = r2.node
                                 JOIN deg ON e.src = deg.src
                          GROUP BY e.dst),
                   r3 AS (SELECT d.src AS node,
                                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                                 + CAST(0.85 AS DOUBLE) * COALESCE(m3.m, 0) AS r
                          FROM deg d CROSS JOIN nn LEFT JOIN m3 ON d.src = m3.node)
              SELECT r3.node AS node, ROUND(r3.r * nn.n + 1e-9, 6) AS rank_norm
              FROM r3, nn""")),

    // T35 — the oracled slice of BPE tokenizer induction: round-0 adjacent
    // character-pair counts over the word-frequency table (min count 5).
    // The iterative learner (t36) starts from exactly this aggregate.
    Entry(
      "t35_bpe_pairs",
      (s, d) => TextAnalysis.bpePairCounts(docs(s, d), "text", 5L),
      Some("""WITH wf AS (SELECT w, COUNT(*) AS n
                          FROM (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
                                FROM documents WHERE text IS NOT NULL)
                          WHERE length(w) > 0 GROUP BY w),
                   p AS (SELECT UNNEST([{'l': substring(w, i, 1), 'r': substring(w, i + 1, 1)}
                                        for i in range(1, length(w))]) AS pr, n
                         FROM wf WHERE length(w) >= 2)
              SELECT pr.l AS sym_l, pr.r AS sym_r, CAST(SUM(n) AS BIGINT) AS cnt
              FROM p GROUP BY pr.l, pr.r HAVING SUM(n) >= 5""")),

    // T36 — BPE merge learning (8 merges, char-level start). The iterative
    // argmax + greedy re-segmentation loop IS SQL-expressible for a FIXED
    // merge budget: 8 UNROLLED rounds, each one pair-count aggregate over
    // the current segmentation → deterministic argmax (cnt desc, l, r;
    // min-count 2) → ONE greedy left-to-right application of just that
    // pair via the t37 even-run arithmetic (no fixpoint needed — prior
    // merges are already materialized in the segmentation). Early stop
    // cascades naturally: an empty `top` round leaves the segmentation
    // unchanged and emits no rank, and every later round is then empty
    // too. The SQL is GENERATED ([[bpeLearnerSql]]) — 8 mechanical CTE
    // rounds, hand-unrolling would only invite drift.
    Entry(
      "t36_bpe_merges",
      (s, d) => TextAnalysis.learnBpeMerges(docs(s, d), "text", 8),
      Some(bpeLearnerSql(numMerges = 8, minCount = 2))),

    // Q43 — keyed snapshot diff (CDC audit): which orders were added,
    // removed, or changed between two deterministic snapshot derivations of
    // the orders table. Delta-sized output; unchanged rows never leave the
    // join.
    Entry(
      "q43_snapshot_diff",
      (s, d) => {
        val base = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val before = base.where(pmod(col("o_orderkey"), lit(89)) =!= 0)
        val after = base.where(pmod(col("o_orderkey"), lit(97)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(31)) === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")))
        Compaction.snapshotDiff(before, after, Seq("o_orderkey"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
                   b AS (SELECT * FROM base WHERE o_orderkey % 89 <> 0),
                   a AS (SELECT o_orderkey,
                                CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice * 2
                                     ELSE o_totalprice END AS o_totalprice,
                                o_orderstatus
                         FROM base WHERE o_orderkey % 97 <> 0),
                   j AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                                CASE WHEN b.o_orderkey IS NULL THEN 'added'
                                     WHEN a.o_orderkey IS NULL THEN 'removed'
                                     WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                                       OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                                       THEN 'changed' END AS status
                         FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
              SELECT o_orderkey, status FROM j WHERE status IS NOT NULL""")),

    // S19 — simplified silhouette (cosine variant) of the label clustering:
    // per-cluster mean of (b−a)/max(a,b) against centroid distances — the
    // clustering-quality gate for SemDeDup/IVF partitions.
    Entry(
      "s19_silhouette",
      (s, d) => Similarity.simplifiedSilhouette(
        embs(s, d), "vec_id", "embedding", "label"),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label AS clab, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   sims AS (SELECT e.vec_id, e.label, cent.clab,
                                   list_cosine_similarity(e.v, cent.cv) AS sim
                            FROM e CROSS JOIN cent),
                   ab AS (SELECT vec_id, label,
                                 1.0 - MAX(CASE WHEN label = clab THEN sim END) AS a,
                                 1.0 - MAX(CASE WHEN label <> clab THEN sim END) AS b
                          FROM sims GROUP BY vec_id, label),
                   sil AS (SELECT label,
                                  CASE WHEN a IS NULL OR b IS NULL THEN NULL
                                       WHEN greatest(a, b) = 0 THEN 0.0
                                       ELSE (b - a) / greatest(a, b) END AS s
                           FROM ab)
              SELECT label, COUNT(s) AS n, ROUND(AVG(s) + 1e-9, 6) AS mean_sil
              FROM sil GROUP BY label""")),

    // Q44 — k-anonymity audit over customer quasi-identifiers
    // (nation × market segment), k = 10: one keyed count + one-row fold.
    Entry(
      "q44_kanonymity",
      (s, d) => Profiling.kAnonymity(
        Tables.load(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), 10L),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS c
                         FROM customer GROUP BY 1, 2)
              SELECT CAST(10 AS BIGINT) AS k,
                     CAST(SUM(c) AS BIGINT) AS n_rows,
                     COUNT(*) AS n_groups,
                     CAST(SUM(CASE WHEN c < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
                     CAST(SUM(CASE WHEN c < 10 THEN c ELSE 0 END) AS BIGINT) AS n_risky_rows,
                     MIN(c) AS min_group_size
              FROM g""")),

    // Q45 — mutual information between return flag and line status (nats):
    // the categorical dependence check; one corpus pass builds the joint
    // pair table, everything after is pair-table-sized.
    Entry(
      "q45_mutual_info",
      (s, d) => Profiling.mutualInformation(
        Tables.load(s, d, "lineitem"), "l_returnflag", "l_linestatus"),
      Some("""WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS nxy
                         FROM lineitem GROUP BY 1, 2),
                   ma AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
                   mb AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM j GROUP BY y),
                   t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM j)
              SELECT MAX(t.n) AS n, COUNT(*) AS n_pairs,
                     ROUND(SUM(CAST(nxy AS DOUBLE) / t.n
                               * ln(CAST(nxy AS DOUBLE) * t.n
                                    / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))))
                           + 1e-9, 6) AS mi
              FROM j JOIN ma USING (x) JOIN mb USING (y) CROSS JOIN t""")),

    // S20 — exact euclidean retrieval: top-5 L2 neighbors of vec_id=0 — the
    // third metric of the retrieval family (q19 cosine, s15 MIPS), and the
    // ground truth the PCA-compression audit (s21) ranks against.
    Entry(
      "s20_l2_topk",
      (s, d) => Similarity.bruteForceL2TopK(embs(s, d), "vec_id", "embedding", 0L, 5),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                         FROM embeddings WHERE vec_id = 0),
                   ds AS (SELECT e.vec_id, list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) AS d
                          FROM embeddings e, q WHERE e.vec_id <> 0),
                   top AS (SELECT vec_id, d FROM ds ORDER BY d ASC, vec_id LIMIT 5)
              SELECT vec_id, ROUND(d, 6) AS dist FROM top""")),

    // S21 — PCA-compressed retrieval audit: recall@10 of exact L2 search in
    // 16-d PCA space vs the full 64-d space, on every 100th vector as a
    // query. Eigensolve has no SQL form → rows-only; the L2 ground truth is
    // oracled via s20 and the full-rank recall==1 invariant is spec-pinned.
    // NOTE: on THIS synthetic corpus the audit reports recall ~0.1-0.3 —
    // correct, not a defect: the testdata embeddings are near-isotropic
    // (flat spectrum, ~25% variance in 16 dims), which is precisely the
    // "your corpus does not compress; don't ship PCA-16 retrieval" answer
    // the audit exists to give. On clustered data recall is high
    // (spec-pinned in PcaSpec).
    Entry(
      "s21_pca_recall",
      (s, d) => {
        val e = embs(s, d)
        Similarity.pcaL2Recall(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          dims = 16, k = 10)
      },
      None),

    // S21b — the hash-checked invariant that closes s21's rows-only
    // asterisk: at FULL rank (dims = 64) the PCA basis is a pure rotation
    // (every Jacobi step is orthogonal), L2 distances are preserved
    // exactly, so recall@10 ≡ 1 for every query — a mathematical identity
    // the oracle can state without an eigensolve, and one a non-orthogonal
    // basis (the eigensolver's only silent failure mode) would break
    // immediately. The Spark side RUNS the whole fit→project→retrieve
    // pipeline; only the invariant is SQL-stated.
    Entry(
      "s21b_pca_fullrank_recall",
      (s, d) => {
        val e = embs(s, d)
        Similarity.pcaL2Recall(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          dims = 64, k = 10)
      },
      Some("""SELECT vec_id AS q_id, CAST(1.0 AS DOUBLE) AS recall
              FROM embeddings WHERE vec_id % 100 = 0""")),

    // S28 — Misra-Gries heavy-hitter registers: bounded-state approximate
    // top terms per language, ≤ k+1 rows per group FOREVER — the register
    // state the exact t08 pass (vocabulary-sized) cannot be on adversarial
    // vocabularies. Order-independent offset construction (exact counts
    // minus the (k+1)-th largest — a tie-invariant multiset statistic), so
    // the oracle replays two half-builds AND the mergeable-summaries merge
    // bit-for-bit; the reported (w_min, w_max) bracket carries the classic
    // additive error budget in the hash-checked contract.
    Entry(
      "s28_mg_heavy_hitters",
      (s, d) => {
        val dd = docs(s, d)
          .where(col("text").isNotNull && col("lang").isNotNull)
        val toks = dd.select(
          col("lang"), pmod(col("doc_id"), lit(2)).as("_half"),
          explode(TextAnalysis.tokens(col("text"))).as("_tok"))
        val k = 16
        val s0 = Mg.summarize(
          toks.where(col("_half") === 0), Seq("lang"), "_tok", k)
        val s1 = Mg.summarize(
          toks.where(col("_half") === 1), Seq("lang"), "_tok", k)
        Mg.estimate(Mg.merge(s0, s1, Seq("lang"), k), Seq("lang"))
      },
      Some("""WITH tok AS (SELECT lang, doc_id % 2 AS half,
                                  unnest(string_split_regex(trim(lower(text)), '\s+')) AS item
                           FROM documents
                           WHERE text IS NOT NULL AND lang IS NOT NULL),
                   langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
                   c0 AS (SELECT lang, item, COUNT(*) AS c FROM tok WHERE half = 0 GROUP BY 1, 2),
                   c1 AS (SELECT lang, item, COUNT(*) AS c FROM tok WHERE half = 1 GROUP BY 1, 2),
                   t0 AS (SELECT lang, CAST(c AS BIGINT) AS t FROM
                           (SELECT lang, c, row_number() OVER (PARTITION BY lang ORDER BY c DESC, item ASC) AS rn FROM c0)
                          WHERE rn = 17),
                   t1 AS (SELECT lang, CAST(c AS BIGINT) AS t FROM
                           (SELECT lang, c, row_number() OVER (PARTITION BY lang ORDER BY c DESC, item ASC) AS rn FROM c1)
                          WHERE rn = 17),
                   s0 AS (SELECT c0.lang, c0.item, CAST(c0.c - COALESCE(t0.t, 0) AS BIGINT) AS w
                          FROM c0 LEFT JOIN t0 USING (lang)
                          WHERE c0.c - COALESCE(t0.t, 0) > 0),
                   s1 AS (SELECT c1.lang, c1.item, CAST(c1.c - COALESCE(t1.t, 0) AS BIGINT) AS w
                          FROM c1 LEFT JOIN t1 USING (lang)
                          WHERE c1.c - COALESCE(t1.t, 0) > 0),
                   uc AS (SELECT lang, item, CAST(SUM(w) AS BIGINT) AS c
                          FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1)
                          GROUP BY 1, 2),
                   tm AS (SELECT lang, CAST(c AS BIGINT) AS t FROM
                           (SELECT lang, c, row_number() OVER (PARTITION BY lang ORDER BY c DESC, item ASC) AS rn FROM uc)
                          WHERE rn = 17),
                   err AS (SELECT langs.lang,
                                  COALESCE(t0.t, 0) + COALESCE(t1.t, 0) + COALESCE(tm.t, 0) AS e
                           FROM langs LEFT JOIN t0 USING (lang)
                             LEFT JOIN t1 USING (lang) LEFT JOIN tm USING (lang))
              SELECT uc.lang, uc.item AS item,
                     CAST(uc.c - COALESCE(tm.t, 0) AS BIGINT) AS w_min,
                     CAST(uc.c - COALESCE(tm.t, 0) + err.e AS BIGINT) AS w_max,
                     langs.n AS n, CAST(err.e AS BIGINT) AS err_budget
              FROM uc LEFT JOIN tm USING (lang)
                JOIN err ON err.lang = uc.lang
                JOIN langs ON langs.lang = uc.lang
              WHERE uc.c - COALESCE(tm.t, 0) > 0""")),

    // T45 — per-key seasonal profile: day-of-week × hour-of-day bucket
    // means/sds + residual-outlier counts — the "is this deviation just
    // Saturday?" readout between q49's rolling z-score and q69's CUSUM.
    // Values fold as exact cents, the 3σ branch is the all-integer
    // (n·v−S)² > 9(nQ−S²) form — widened to decimal(38,0) on the Spark
    // side and HUGEINT here, since the SQUARED terms outgrow BIGINT at a
    // mere ~3e5 rows/bucket — so every outlier flag is bit-replayed;
    // only the reported mean/sd touch FP (6 dp). Spark Sunday=1 vs DuckDB
    // Sunday=0 → the oracle shifts dayofweek by +1.
    Entry(
      "t45_seasonal_profile",
      (s, d) => Profiling.seasonalProfile(
        Tables.eventsWithTimestamp(s, d), Seq("event_type"), "ts_utc",
        "value", sigmaK = 3),
      Some("""WITH b AS (SELECT event_type, dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
                                CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) AS c
                         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
                   st AS (SELECT event_type, dow, hod, COUNT(*) AS n,
                                 SUM(c) AS s,
                                 SUM(CAST(c AS HUGEINT) * c) AS q
                          FROM b GROUP BY 1, 2, 3),
                   fl AS (SELECT st.event_type, st.dow, st.hod,
                                 CAST(SUM(CASE WHEN (CAST(st.n AS HUGEINT) * b.c - st.s) * (CAST(st.n AS HUGEINT) * b.c - st.s)
                                                    > 9 * (CAST(st.n AS HUGEINT) * st.q - CAST(st.s AS HUGEINT) * st.s)
                                               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
                          FROM b JOIN st USING (event_type, dow, hod)
                          GROUP BY 1, 2, 3)
              SELECT st.event_type, st.dow, st.hod, st.n,
                     ROUND(CAST(st.s AS DOUBLE) / (CAST(st.n AS DOUBLE) * 100) + 1e-9, 6) AS mean_value,
                     ROUND(sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE) / (st.n * st.n)) / 100 + 1e-9, 6) AS sd_value,
                     fl.n_outliers
              FROM st JOIN fl USING (event_type, dow, hod)""")),

    // Q75 — CUBE with grouping-id markers: the all-subtotals one-pass
    // aggregate that rounds out the §2.6-beyond family next to q25 ROLLUP
    // and q26 pivot (a CUBE answers every GROUPING SETS subset, so the
    // whole lattice is covered by this one plan). Spark expands the 2^3
    // grouping sets inside ONE Expand + hash aggregate — no multi-pass
    // union — and grouping_id() is the same bitmask as DuckDB's GROUPING().
    Entry(
      "q75_cube",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .withColumn("ship_year", year(col("l_shipdate")))
          .cube("l_returnflag", "l_linestatus", "ship_year")
          .agg(
            grouping_id().as("gid"),
            round(sum("l_quantity"), 4).as("sum_qty"),
            count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus, ship_year,
                     CAST(GROUPING(l_returnflag, l_linestatus, ship_year) AS BIGINT) AS gid,
                     ROUND(SUM(l_quantity), 4) AS sum_qty,
                     COUNT(*) AS cnt
              FROM (SELECT l_returnflag, l_linestatus,
                           year(l_shipdate) AS ship_year, l_quantity
                    FROM lineitem)
              GROUP BY CUBE(l_returnflag, l_linestatus, ship_year)""")),

    // T46 — held-out Stupid Backoff LM scoring: the frozen-LM quality
    // filter (Brants et al. 2007) t20/t28's trained-on-itself MLE cannot
    // be — scoring a corpus against its own counts never exercises
    // smoothing; here the train/score doc split makes the whole backoff
    // chain live (bigram → α·unigram → α²/N OOV floor), and the
    // n_backoff/n_oov counts put each fallback tier into the hash-checked
    // contract. Model = two train-side vocabulary aggregates; scoring =
    // one bigram explode + three vocabulary joins + a per-doc fold.
    Entry(
      "t46_stupid_backoff",
      (s, d) => {
        val documents = docs(s, d)
        TextAnalysis.stupidBackoffScore(
          documents.filter(col("doc_id") % 2 === 0),
          documents.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                            FROM documents),
                   uni AS (SELECT w, COUNT(*) AS uc
                           FROM (SELECT unnest(t) AS w FROM toks WHERE doc_id % 2 = 0)
                           GROUP BY 1),
                   tot AS (SELECT SUM(uc) AS n FROM uni),
                   bi AS (SELECT b, COUNT(*) AS bc FROM (
                            SELECT t[i] || ' ' || t[i+1] AS b
                            FROM toks, LATERAL (SELECT unnest(range(1, len(toks.t))) AS i) r
                            WHERE doc_id % 2 = 0 AND len(t) >= 2)
                          GROUP BY 1),
                   tf AS (SELECT doc_id, b, COUNT(*) AS c FROM (
                            SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                            FROM toks, LATERAL (SELECT unnest(range(1, len(toks.t))) AS i) r
                            WHERE doc_id % 2 <> 0 AND len(t) >= 2)
                          GROUP BY 1, 2),
                   j AS (SELECT tf.doc_id AS doc_id, tf.c AS c, bi.bc AS bc, u2.uc AS uc2,
                                CASE WHEN bi.bc IS NOT NULL THEN bi.bc::DOUBLE / u1.uc
                                     WHEN u2.uc IS NOT NULL THEN 0.4 * u2.uc::DOUBLE / tot.n
                                     ELSE 0.4::DOUBLE * 0.4::DOUBLE / tot.n END AS s
                         FROM tf LEFT JOIN bi USING (b)
                                 LEFT JOIN uni u1 ON split_part(tf.b, ' ', 1) = u1.w
                                 LEFT JOIN uni u2 ON split_part(tf.b, ' ', 2) = u2.w, tot)
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_transitions,
                     CAST(SUM(CASE WHEN bc IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_backoff,
                     CAST(SUM(CASE WHEN bc IS NULL AND uc2 IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
                     ROUND(SUM(c * ln(s)) / SUM(c) + 1e-9, 6) AS avg_logscore
              FROM j GROUP BY doc_id""")),

    // Q76 — Bloom-filter decontamination probe: the SIXTH sketch-register
    // family member (HLL distinct / CMS frequency / KMV set-ops / q-digest
    // quantiles / MG heavy-hitters / Bloom MEMBERSHIP) — t18's exact gram
    // decontamination re-asked against bounded state: an 8192-bit / k=3
    // filter over the benchmark slice's 3-gram set (two-half build +
    // guarded OR-merge — exactness means merge ≡ one-shot build, which the
    // oracle states by building one-shot), probed per (doc, gram) with NO
    // false negatives (bloom_hits ≥ exact_hits on every row — hash-checked)
    // and REAL false positives (8192 bits < 3×grams forces fill ~15% at
    // sf0.01, so fp_overcount is a live column, the q62 forced-collision
    // discipline). Fill/occupancy-inversion/fp-rate audit columns ride
    // along from the same registers. Probe side: one broadcast join + two
    // combiner-absorbed folds — the corpus never shuffles.
    Entry(
      "q76_bloom_decontam",
      (s, d) => {
        val grams = docs(s, d).select(
          col("doc_id"),
          explode(TextAnalysis.tokenNgrams(col("text"), 3)).as("_gram"))
        val bench = grams.filter(col("doc_id") % 50 === 0)
          .select("_gram").distinct()
        def half(r: Int) = Bloom.registers(
          bench.filter(pmod(Dedup.hash56(col("_gram")), lit(2L)) === r),
          Nil, "_gram", mBits = 8192, k = 3)
        val regs = Bloom.merge(half(0), half(1), Nil, mBits = 8192, k = 3)
        val hits = Bloom.mightContain(
          regs, grams.filter(col("doc_id") % 50 =!= 0), Nil,
          Seq("doc_id"), "_gram", mBits = 8192, k = 3)
        hits
          .join(bench.withColumn("_hit", lit(1L)), Seq("_gram"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_grams"),
            sum(when(col("might_contain"), 1L).otherwise(0L)).as("bloom_hits"),
            sum(coalesce(col("_hit"), lit(0L))).as("exact_hits"))
          .withColumn("fp_overcount", col("bloom_hits") - col("exact_hits"))
          .crossJoin(broadcast(Bloom.stats(regs, Nil, mBits = 8192, k = 3)))
      },
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
                   g AS (SELECT doc_id,
                                list_distinct([array_to_string(toks[i:i+2], ' ')
                                               for i in range(1, greatest(len(toks) - 3, 0) + 2)]) AS grams
                         FROM tk),
                   bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
                   bpos AS (SELECT ('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || gram), 1, 14))::UBIGINT::BIGINT % 8192 AS pos
                            FROM bench CROSS JOIN (SELECT unnest(range(0, 3)) AS i) ii),
                   regs AS (SELECT pos // 32 AS w,
                                   bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
                            FROM bpos GROUP BY 1),
                   tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0),
                   pp AS (SELECT doc_id, gram,
                                 ('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || gram), 1, 14))::UBIGINT::BIGINT % 8192 AS pos
                          FROM tr CROSS JOIN (SELECT unnest(range(0, 3)) AS i) ii),
                   ph AS (SELECT doc_id, gram,
                                 bool_and((COALESCE(r.bits, 0) & (1::BIGINT << CAST(pos % 32 AS INTEGER)))
                                          = (1::BIGINT << CAST(pos % 32 AS INTEGER))) AS hit
                          FROM pp LEFT JOIN regs r ON pos // 32 = r.w
                          GROUP BY doc_id, gram),
                   agg AS (SELECT ph.doc_id AS doc_id, COUNT(*) AS n_grams,
                                  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
                                  CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS exact_hits
                           FROM ph LEFT JOIN bench USING (gram)
                           GROUP BY ph.doc_id),
                   st AS (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) AS bits_set FROM regs)
              SELECT doc_id, n_grams, bloom_hits, exact_hits,
                     bloom_hits - exact_hits AS fp_overcount,
                     st.bits_set,
                     ROUND(bits_set / 8192.0 + 1e-9, 6) AS fill_ratio,
                     ROUND(CASE WHEN bits_set < 8192
                                THEN -(8192.0 / 3) * ln(1 - bits_set / 8192.0) END + 1e-9, 6) AS est_inserted,
                     ROUND(pow(bits_set / 8192.0, 3) + 1e-9, 6) AS est_fp_rate
              FROM agg, st""")),

    // Q77 — Bradley–Terry preference ranking: the RLHF preference-data
    // readout (which source wins head-to-head?) as 3 unrolled MM rounds
    // (Hunter 2004) over the item-pair frame. Trials = consecutive-doc
    // source matchups judged by n_chars (ties and same-source pairs
    // excluded — classic BT has no tie outcome); the corpus is touched
    // once (pair join + map-side-combined (winner, loser) count), every
    // MM round runs on broadcast item-sized frames — nothing collected,
    // so the fit survives 100 TB trial counts. 6 dp rounding at each
    // iteration boundary (the s23/q71 contract) makes the whole
    // trajectory — wins, games, all three rounds, the sum-1
    // normalization — hash-checked.
    Entry(
      "q77_bradley_terry",
      (s, d) => {
        val base = docs(s, d).select("doc_id", "source", "n_chars")
        val next = base.select(
          (col("doc_id") - 1).as("doc_id"),
          col("source").as("_sb"), col("n_chars").as("_cb"))
        val trials = base.join(next, Seq("doc_id"))
          .filter(col("source") =!= col("_sb") &&
            col("n_chars") =!= col("_cb"))
          .select(
            when(col("n_chars") > col("_cb"), col("source"))
              .otherwise(col("_sb")).as("winner"),
            when(col("n_chars") > col("_cb"), col("_sb"))
              .otherwise(col("source")).as("loser"))
        Experiment.bradleyTerry(trials, "winner", "loser", iters = 3)
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
                   pr AS (SELECT a.source AS sa, b.source AS sb, a.n_chars AS ca, b.n_chars AS cb
                          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                          WHERE a.source <> b.source AND a.n_chars <> b.n_chars),
                   m AS (SELECT CASE WHEN ca > cb THEN sa ELSE sb END AS winner,
                                CASE WHEN ca > cb THEN sb ELSE sa END AS loser FROM pr),
                   wl AS (SELECT winner AS i, loser AS j, COUNT(*) AS w FROM m GROUP BY 1, 2),
                   n AS (SELECT i, j, CAST(SUM(w) AS BIGINT) AS n FROM (
                           SELECT i, j, w FROM wl UNION ALL SELECT j AS i, i AS j, w FROM wl) GROUP BY 1, 2),
                   it AS (SELECT DISTINCT i FROM n),
                   wi AS (SELECT it.i, CAST(COALESCE(s.w, 0) AS BIGINT) AS wins
                          FROM it LEFT JOIN (SELECT i, SUM(w) AS w FROM wl GROUP BY 1) s USING (i)),
                   gm AS (SELECT i, CAST(SUM(n) AS BIGINT) AS games FROM n GROUP BY 1),
                   p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM it),
                   d1 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p0 pi ON n.i = pi.i JOIN p0 pj ON n.j = pj.i GROUP BY n.i),
                   p1 AS (SELECT wi.i, ROUND(wi.wins / d1.den + 1e-9, 6) AS p FROM wi JOIN d1 USING (i)),
                   d2 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p1 pi ON n.i = pi.i JOIN p1 pj ON n.j = pj.i GROUP BY n.i),
                   p2 AS (SELECT wi.i, ROUND(wi.wins / d2.den + 1e-9, 6) AS p FROM wi JOIN d2 USING (i)),
                   d3 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p2 pi ON n.i = pi.i JOIN p2 pj ON n.j = pj.i GROUP BY n.i),
                   p3 AS (SELECT wi.i, ROUND(wi.wins / d3.den + 1e-9, 6) AS p FROM wi JOIN d3 USING (i)),
                   tot AS (SELECT ROUND(SUM(p) + 1e-9, 6) AS t FROM p3)
              SELECT p3.i AS item, wi.wins AS n_wins, gm.games AS n_games,
                     ROUND(p3.p / tot.t + 1e-9, 6) AS bt_strength
              FROM p3 JOIN wi USING (i) JOIN gm USING (i), tot""")),

    // Q78 — Theil–Sen robust trend per user: q36's OLS re-asked with a
    // 29.3%-breakdown estimator (median of pairwise slopes — one corrupted
    // point can move an OLS slope arbitrarily, it moves this one not at
    // all). Pair frame is quadratic IN THE GROUP (per-user series are
    // bounded time buckets), the self-join is group-local, ranking windows
    // are group-partitioned; slopes rounded 6 dp BEFORE ranking (the t13
    // discipline) so a last-ulp division difference can't reorder the
    // median cut; both medians use the two-middle order-statistic form,
    // deterministic under ties.
    Entry(
      "q78_theil_sen",
      (s, d) => {
        val e = graft.Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("value"))
        val t0 = e.agg(min("ts").as("_t0"))
        Profiling.theilSen(
          e.crossJoin(broadcast(t0))
            .withColumn(
              "x", (col("ts") - col("_t0")).cast("double") / 86400000000.0),
          Seq("user_id"), "x", "value")
      },
      Some("""WITH m AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
                   e AS (SELECT user_id,
                                (epoch_us(ts) - t0)::DOUBLE / 86400000000 AS x,
                                value AS y
                         FROM events, m),
                   pr AS (SELECT a.user_id AS user_id,
                                 ROUND((b.y - a.y) / (b.x - a.x) + 1e-9, 6) AS s
                          FROM e a JOIN e b ON a.user_id = b.user_id AND a.x < b.x),
                   rk AS (SELECT user_id, s,
                                 row_number() OVER (PARTITION BY user_id ORDER BY s) AS r,
                                 COUNT(*) OVER (PARTITION BY user_id) AS mm
                          FROM pr),
                   sl AS (SELECT user_id, ROUND(AVG(s) + 1e-9, 6) AS ts_slope,
                                 CAST(MAX(mm) AS BIGINT) AS n_pairs
                          FROM rk WHERE r = (mm + 1) // 2 OR r = (mm + 2) // 2
                          GROUP BY user_id),
                   ic AS (SELECT e.user_id AS user_id,
                                 ROUND(e.y - sl.ts_slope * e.x + 1e-9, 6) AS i0
                          FROM e JOIN sl USING (user_id)),
                   rk2 AS (SELECT user_id, i0,
                                  row_number() OVER (PARTITION BY user_id ORDER BY i0) AS r,
                                  COUNT(*) OVER (PARTITION BY user_id) AS mm
                           FROM ic),
                   ic2 AS (SELECT user_id, ROUND(AVG(i0) + 1e-9, 6) AS ts_intercept
                           FROM rk2 WHERE r = (mm + 1) // 2 OR r = (mm + 2) // 2
                           GROUP BY user_id),
                   np AS (SELECT user_id, COUNT(*) AS n_points FROM e GROUP BY 1)
              SELECT np.user_id, np.n_points, sl.n_pairs, sl.ts_slope, ic2.ts_intercept
              FROM np JOIN sl USING (user_id) JOIN ic2 USING (user_id)""")),

    // Q79 — Mann–Kendall monotone-trend test per user: the significance
    // half of the q78 pairing (MK asks "is there a trend?", Theil–Sen
    // "how steep?") over the same group-local pair frame. S is an exact
    // integer fold, Var(S) carries the all-integer y-tie correction, z
    // gets the ±1 continuity correction, and the two-sided p replays the
    // q46-family Abramowitz–Stegun polynomial on the ROUNDED |z| — S/Var
    // hash-exact, z/p engine-portable 6 dp. Per-user timestamps are
    // distinct (the declared x precondition).
    Entry(
      "q79_mann_kendall",
      (s, d) => Profiling.mannKendall(
        graft.Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("double").as("x"),
            col("value")),
        Seq("user_id"), "x", "value"),
      Some {
        val sf = Experiment.normalSfSql("abs(z)")
        s"""WITH e AS (SELECT user_id, epoch_us(ts)::DOUBLE AS x, value AS y FROM events),
                 pr AS (SELECT a.user_id AS user_id,
                               CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
                        FROM e a JOIN e b ON a.user_id = b.user_id AND a.x < b.x),
                 st AS (SELECT user_id, CAST(SUM(sg) AS BIGINT) AS s_stat FROM pr GROUP BY 1),
                 np AS (SELECT user_id, COUNT(*) AS n_points FROM e GROUP BY 1),
                 tt AS (SELECT user_id, SUM(t * (t - 1) * (2 * t + 5)) AS tie
                        FROM (SELECT user_id, y, COUNT(*) AS t FROM e GROUP BY 1, 2)
                        GROUP BY 1),
                 v AS (SELECT np.user_id, np.n_points, st.s_stat,
                              (np.n_points * (np.n_points - 1) * (2 * np.n_points + 5) - tt.tie)::DOUBLE / 18.0 AS var_s
                       FROM np JOIN st USING (user_id) JOIN tt USING (user_id)),
                 zz AS (SELECT user_id, n_points, s_stat,
                               ROUND(var_s + 1e-9, 6) AS var_s,
                               CASE WHEN var_s > 0 THEN
                                 ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                                            WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                                            ELSE 0.0 END + 1e-9, 6)
                               END AS z
                        FROM v)
            SELECT user_id, n_points, s_stat, var_s, z,
                   CASE WHEN z IS NOT NULL THEN ROUND(2.0 * $sf + 1e-9, 6) END AS p_value
            FROM zz"""
      }),

    // Q80 — Kruskal–Wallis k-group rank test over the five event types:
    // the one-way "did ANY segment shift?" screen q59's two-group
    // Mann–Whitney cannot ask. Pooled midranks ride the distributed
    // prefix sum over the distinct-value frame (q59's machinery), the
    // tie correction is the standard Σ(t³−t)/(N³−N), and the p-value is
    // engine-portable in two declared stages: H' rounded at the stage
    // boundary, then the Wilson–Hilferty cube-root normal approximation
    // priced by the shared Abramowitz–Stegun polynomial.
    Entry(
      "q80_kruskal_wallis",
      (s, d) => Experiment.kruskalWallis(
        graft.Tables.events(s, d), "event_type", "value"),
      Some {
        val sfPos = Experiment.normalSfSql("z_wh")
        val sfNeg = Experiment.normalSfSql("-z_wh")
        s"""WITH b AS (SELECT CAST(event_type AS VARCHAR) AS g, CAST(value AS DOUBLE) AS v
           |           FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
           |     vc AS (SELECT v, COUNT(*) AS c FROM b GROUP BY v),
           |     rk AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + (c + 1) / 2.0 AS midrank
           |            FROM vc),
           |     pgv AS (SELECT g, v, COUNT(*) AS cg FROM b GROUP BY 1, 2),
           |     pg AS (SELECT g, SUM(cg) AS n, SUM(cg * rk.midrank) AS rsum
           |            FROM pgv JOIN rk USING (v) GROUP BY g),
           |     t AS (SELECT COALESCE(SUM(CASE WHEN c > 1 THEN CAST(c AS DOUBLE) * c * c - c END), 0.0) AS ties,
           |                  CAST(SUM(c) AS BIGINT) AS nn
           |           FROM vc),
           |     h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, CAST(SUM(n) AS BIGINT) AS n_total,
           |                  CASE WHEN COUNT(*) >= 2
           |                        AND (1.0 - ties / (CAST(nn AS DOUBLE) * nn * nn - nn)) > 0
           |                       THEN ROUND((12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1))
           |                                     * SUM(rsum * rsum / n)
           |                                   - 3.0 * (CAST(nn AS DOUBLE) + 1))
           |                                  / (1.0 - ties / (CAST(nn AS DOUBLE) * nn * nn - nn)) + 1e-9, 6)
           |                  END AS h_stat,
           |                  CAST(COUNT(*) - 1 AS BIGINT) AS df
           |           FROM pg, t GROUP BY ties, nn),
           |     z AS (SELECT n_groups, n_total, h_stat, df,
           |                  CASE WHEN h_stat IS NOT NULL THEN
           |                    ROUND((cbrt(h_stat / CAST(df AS DOUBLE))
           |                             - (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))))
           |                          * sqrt(9.0 * CAST(df AS DOUBLE) / 2.0) + 1e-9, 6)
           |                  END AS z_wh
           |           FROM h)
           |SELECT n_groups, n_total, h_stat, df, z_wh,
           |       CASE WHEN z_wh IS NULL THEN NULL
           |            WHEN z_wh >= 0 THEN ROUND($sfPos + 1e-9, 6)
           |            ELSE ROUND(1.0 - $sfNeg + 1e-9, 6) END AS p_approx
           |FROM z""".stripMargin
      }),

    // C10 — preference-steered training mixture: the composition that
    // closes the RLHF curation loop — q77's Bradley–Terry strengths
    // (which source WINS head-to-head?) temperature-flattened (α=0.5)
    // into mixture shares, set against each source's NATURAL token share,
    // with the resulting sampling boost per source. The q77 fit runs on
    // broadcast item frames; the token shares are one map-side-combined
    // corpus aggregate; the composition is a 20-row join. Every stage —
    // trials, MM rounds, normalization, power-scaling, boosts — replays
    // in one composed oracle.
    Entry(
      "c10_preference_mix",
      (s, d) => {
        val base = docs(s, d).select("doc_id", "source", "n_chars")
        val next = base.select(
          (col("doc_id") - 1).as("doc_id"),
          col("source").as("_sb"), col("n_chars").as("_cb"))
        val trials = base.join(next, Seq("doc_id"))
          .filter(col("source") =!= col("_sb") &&
            col("n_chars") =!= col("_cb"))
          .select(
            when(col("n_chars") > col("_cb"), col("source"))
              .otherwise(col("_sb")).as("winner"),
            when(col("n_chars") > col("_cb"), col("_sb"))
              .otherwise(col("source")).as("loser"))
        val bt = Experiment.bradleyTerry(trials, "winner", "loser", iters = 3)
          .withColumnRenamed("item", "source")
        val tok = docs(s, d).groupBy("source")
          .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
        val tot = tok.agg(sum("n_tokens").as("_tot"))
        val pa = bt.join(tok, Seq("source"))
          .crossJoin(broadcast(tot))
          .withColumn("_p", col("n_tokens").cast("double") / col("_tot"))
          .withColumn("_pa", pow(col("bt_strength"), 0.5))
        pa.crossJoin(broadcast(pa.agg(sum("_pa").as("_z"))))
          .select(
            col("source"), col("bt_strength"),
            col("n_tokens").cast("long").as("n_tokens"),
            stableRound(col("_p"), 6).as("p_natural"),
            stableRound(col("_pa") / col("_z"), 6).as("q_pref"),
            stableRound((col("_pa") / col("_z")) / col("_p"), 6).as("boost"))
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
                   pr AS (SELECT a.source AS sa, b.source AS sb, a.n_chars AS ca, b.n_chars AS cb
                          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                          WHERE a.source <> b.source AND a.n_chars <> b.n_chars),
                   m AS (SELECT CASE WHEN ca > cb THEN sa ELSE sb END AS winner,
                                CASE WHEN ca > cb THEN sb ELSE sa END AS loser FROM pr),
                   wl AS (SELECT winner AS i, loser AS j, COUNT(*) AS w FROM m GROUP BY 1, 2),
                   n AS (SELECT i, j, CAST(SUM(w) AS BIGINT) AS n FROM (
                           SELECT i, j, w FROM wl UNION ALL SELECT j AS i, i AS j, w FROM wl) GROUP BY 1, 2),
                   it AS (SELECT DISTINCT i FROM n),
                   wi AS (SELECT it.i, CAST(COALESCE(s.w, 0) AS BIGINT) AS wins
                          FROM it LEFT JOIN (SELECT i, SUM(w) AS w FROM wl GROUP BY 1) s USING (i)),
                   p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM it),
                   d1 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p0 pi ON n.i = pi.i JOIN p0 pj ON n.j = pj.i GROUP BY n.i),
                   p1 AS (SELECT wi.i, ROUND(wi.wins / d1.den + 1e-9, 6) AS p FROM wi JOIN d1 USING (i)),
                   d2 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p1 pi ON n.i = pi.i JOIN p1 pj ON n.j = pj.i GROUP BY n.i),
                   p2 AS (SELECT wi.i, ROUND(wi.wins / d2.den + 1e-9, 6) AS p FROM wi JOIN d2 USING (i)),
                   d3 AS (SELECT n.i, SUM(n.n / (pi.p + pj.p)) AS den
                          FROM n JOIN p2 pi ON n.i = pi.i JOIN p2 pj ON n.j = pj.i GROUP BY n.i),
                   p3 AS (SELECT wi.i, ROUND(wi.wins / d3.den + 1e-9, 6) AS p FROM wi JOIN d3 USING (i)),
                   bt_tot AS (SELECT ROUND(SUM(p) + 1e-9, 6) AS t FROM p3),
                   bt AS (SELECT p3.i AS source, ROUND(p3.p / bt_tot.t + 1e-9, 6) AS bt_strength
                          FROM p3, bt_tot),
                   tok AS (SELECT source,
                                  SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS nt
                           FROM documents GROUP BY source),
                   tt AS (SELECT SUM(nt) AS tot FROM tok),
                   pa AS (SELECT bt.source, bt.bt_strength, tok.nt,
                                 tok.nt / tt.tot AS p,
                                 POWER(bt.bt_strength, 0.5) AS pa
                          FROM bt JOIN tok USING (source), tt),
                   z AS (SELECT SUM(pa) AS z FROM pa)
              SELECT source, bt_strength, CAST(nt AS BIGINT) AS n_tokens,
                     ROUND(p + 1e-9, 6) AS p_natural,
                     ROUND(pa / z.z + 1e-9, 6) AS q_pref,
                     ROUND((pa / z.z) / p + 1e-9, 6) AS boost
              FROM pa, z""")),

    // Q46 — two-proportion z-test between md5-split variants (success =
    // long document): the A/B readout over the deterministic assignment the
    // split operators already provide.
    Entry(
      "q46_ab_ztest",
      (s, d) => {
        val v = docs(s, d).select(
          when(pmod(Dedup.hash56(col("doc_id").cast("string")), lit(2L)) === 0,
            "control").otherwise("treatment").as("variant"),
          (col("n_chars") > 500).as("success"))
        Experiment.abProportionZTest(v, "variant", "success", "control", "treatment")
      },
      Some("""WITH v AS (SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 2 = 0
                                     THEN 'control' ELSE 'treatment' END AS variant,
                                (n_chars > 500) AS success
                         FROM documents),
                   c AS (SELECT variant, COUNT(*) AS n,
                                CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS successes
                         FROM v GROUP BY variant),
                   w AS (SELECT MAX(CASE WHEN variant = 'control' THEN n END) AS nc,
                                MAX(CASE WHEN variant = 'control' THEN successes END) AS sc,
                                MAX(CASE WHEN variant = 'treatment' THEN n END) AS nt,
                                MAX(CASE WHEN variant = 'treatment' THEN successes END) AS st
                         FROM c),
                   z AS (SELECT CASE WHEN nc IS NOT NULL AND nt IS NOT NULL
                                      AND (sc + st) > 0 AND (sc + st) < (nc + nt)
                                     THEN ROUND((CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)
                                                / sqrt((CAST(sc + st AS DOUBLE) / (nc + nt))
                                                       * (1 - CAST(sc + st AS DOUBLE) / (nc + nt))
                                                       * (1.0 / nc + 1.0 / nt))
                                                + 1e-9, 6) END AS z
                         FROM w)
              SELECT c.variant, c.n, c.successes,
                     ROUND(CAST(c.successes AS DOUBLE) / c.n + 1e-9, 6) AS rate, z.z
              FROM c, z""")),

    // Q47 — CUPED variance reduction over per-user pre/post activity
    // (pre/post = even/odd event ids — deterministic, correlated through
    // per-user activity level; variants by md5 user split).
    Entry(
      "q47_cuped",
      (s, d) => {
        val units = Tables.load(s, d, "events")
          .groupBy(col("user_id"))
          .agg(
            sum(when(pmod(col("event_id"), lit(2L)) === 0, col("value"))
              .otherwise(0.0)).as("pre"),
            sum(when(pmod(col("event_id"), lit(2L)) === 1, col("value"))
              .otherwise(0.0)).as("post"))
          .withColumn("variant",
            when(pmod(Dedup.hash56(col("user_id").cast("string")), lit(2L)) === 0,
              "a").otherwise("b"))
        Experiment.cuped(units, "variant", "pre", "post")
      },
      Some("""WITH u AS (SELECT user_id,
                                SUM(CASE WHEN event_id % 2 = 0 THEN value ELSE 0 END) AS pre,
                                SUM(CASE WHEN event_id % 2 = 1 THEN value ELSE 0 END) AS post,
                                CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 2 = 0
                                     THEN 'a' ELSE 'b' END AS variant
                         FROM events GROUP BY user_id),
                   g AS (SELECT COUNT(*) AS n, SUM(pre) AS sx, SUM(post) AS sy,
                                SUM(pre * pre) AS sxx, SUM(post * post) AS syy,
                                SUM(pre * post) AS sxy
                         FROM u),
                   fit AS (SELECT sx / n AS mx,
                                  CASE WHEN n * sxx - sx * sx > 0
                                       THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
                                  (syy - sy * sy / n) / n AS vy,
                                  sxy / n - sx * sy / (n * n) AS cxy,
                                  (sxx - sx * sx / n) / n AS vx
                           FROM g)
              SELECT u.variant, COUNT(*) AS n,
                     ROUND(AVG(u.post) + 1e-9, 6) AS mean_post,
                     ROUND(AVG(u.post - COALESCE(fit.theta, 0) * (u.pre - fit.mx)) + 1e-9, 6) AS mean_adjusted,
                     ROUND(MAX(fit.theta) + 1e-9, 6) AS theta,
                     CASE WHEN MAX(fit.vy) > 0 AND MAX(fit.vx) > 0
                          THEN ROUND(MAX(fit.cxy) * MAX(fit.cxy) / (MAX(fit.vx) * MAX(fit.vy)) + 1e-9, 6)
                     END AS var_reduction
              FROM u, fit GROUP BY u.variant""")),

    // Q48 — leakage-safe target encoding: out-of-fold mean order price per
    // priority class, 5 md5 folds — the encoding TABLE a feature join
    // consumes.
    Entry(
      "q48_target_encode",
      (s, d) => Profiling.targetEncode(
        Tables.load(s, d, "orders"), "o_orderkey", "o_orderpriority",
        "o_totalprice", 5),
      Some("""WITH f AS (SELECT o_orderpriority AS category,
                                ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 5 AS fold,
                                o_totalprice
                         FROM orders WHERE o_totalprice IS NOT NULL),
                   pf AS (SELECT category, fold, COUNT(*) AS nf, SUM(o_totalprice) AS sf
                          FROM f GROUP BY 1, 2),
                   pc AS (SELECT category, CAST(SUM(nf) AS BIGINT) AS na, SUM(sf) AS sa
                          FROM pf GROUP BY 1)
              SELECT pf.category, pf.fold, pc.na - pf.nf AS n_oof,
                     CASE WHEN pc.na - pf.nf > 0
                          THEN ROUND((pc.sa - pf.sf) / (pc.na - pf.nf) + 1e-9, 6)
                     END AS enc
              FROM pf JOIN pc USING (category)""")),

    // D19 — near-containment pairs: short doc quoted inside a long one
    // (tiny Jaccard, high containment). Candidates via shared RARE tokens
    // (df in [2, 50]) — the prefix-filter route, since length blocking is
    // exactly wrong for containment.
    Entry(
      "d19_containment",
      (s, d) => Dedup.containmentPairs(
        docs(s, d), "doc_id", "text", threshold = 0.8, maxDf = 50L),
      Some("""WITH tk AS (SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) AS toks
                          FROM documents WHERE text IS NOT NULL),
                   tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) > 0),
                   post AS (SELECT doc_id, UNNEST(toks) AS tok FROM tk2),
                   rare AS (SELECT tok FROM post GROUP BY tok
                            HAVING COUNT(*) BETWEEN 2 AND 50),
                   cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                            FROM post a JOIN rare USING (tok)
                                 JOIN post b USING (tok)
                            WHERE a.doc_id < b.doc_id),
                   sc AS (SELECT c.a_id, c.b_id,
                                 len(list_intersect(ta.toks, tb.toks)) AS inter,
                                 len(ta.toks) AS na, len(tb.toks) AS nb
                          FROM cand c
                          JOIN tk2 ta ON ta.doc_id = c.a_id
                          JOIN tk2 tb ON tb.doc_id = c.b_id)
              SELECT a_id, b_id,
                     CASE WHEN na < nb OR (na = nb AND a_id < b_id)
                          THEN a_id ELSE b_id END AS contained_id,
                     ROUND(CAST(inter AS DOUBLE) / LEAST(na, nb) + 1e-9, 6) AS containment
              FROM sc
              WHERE CAST(inter AS DOUBLE) / LEAST(na, nb) >= 0.8""")),

    // Q51 — best information-gain split of document length against the
    // is-English label: the decision-stump cut that turns the c04 sweep
    // into one defensible keep/drop threshold.
    Entry(
      "q51_best_split",
      (s, d) => Profiling.bestSplit(
        docs(s, d).withColumn("is_en", col("lang") === "en"),
        "n_chars", "is_en"),
      Some("""WITH per AS (SELECT CAST(n_chars AS DOUBLE) AS threshold,
                                  COUNT(*) FILTER (lang = 'en') AS pos,
                                  COUNT(*) FILTER (lang <> 'en') AS neg
                           FROM documents GROUP BY 1),
                   tot AS (SELECT COUNT(*) FILTER (lang = 'en') AS p,
                                  COUNT(*) FILTER (lang <> 'en') AS n
                           FROM documents),
                   c AS (SELECT threshold,
                                CAST(SUM(pos) OVER w AS BIGINT) AS tp,
                                CAST(SUM(neg) OVER w AS BIGINT) AS fp
                         FROM per
                         WINDOW w AS (ORDER BY threshold DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                   g AS (SELECT threshold,
                                p + n - tp - fp AS n_left,
                                tp + fp AS n_right,
                                ROUND(
                                  (CASE WHEN CAST(p AS DOUBLE)/(p+n) <= 0 OR CAST(p AS DOUBLE)/(p+n) >= 1 THEN 0
                                        ELSE -((CAST(p AS DOUBLE)/(p+n)) * ln(CAST(p AS DOUBLE)/(p+n))
                                               + (1 - CAST(p AS DOUBLE)/(p+n)) * ln(1 - CAST(p AS DOUBLE)/(p+n))) END)
                                  - (CAST(tp+fp AS DOUBLE)/(p+n)) *
                                    (CASE WHEN CAST(tp AS DOUBLE)/(tp+fp) <= 0 OR CAST(tp AS DOUBLE)/(tp+fp) >= 1 THEN 0
                                          ELSE -((CAST(tp AS DOUBLE)/(tp+fp)) * ln(CAST(tp AS DOUBLE)/(tp+fp))
                                                 + (1 - CAST(tp AS DOUBLE)/(tp+fp)) * ln(1 - CAST(tp AS DOUBLE)/(tp+fp))) END)
                                  - (CASE WHEN p + n - tp - fp > 0 THEN
                                      (CAST(p+n-tp-fp AS DOUBLE)/(p+n)) *
                                      (CASE WHEN CAST(p-tp AS DOUBLE)/(p+n-tp-fp) <= 0 OR CAST(p-tp AS DOUBLE)/(p+n-tp-fp) >= 1 THEN 0
                                            ELSE -((CAST(p-tp AS DOUBLE)/(p+n-tp-fp)) * ln(CAST(p-tp AS DOUBLE)/(p+n-tp-fp))
                                                   + (1 - CAST(p-tp AS DOUBLE)/(p+n-tp-fp)) * ln(1 - CAST(p-tp AS DOUBLE)/(p+n-tp-fp))) END)
                                     ELSE 0 END)
                                  + 1e-9, 6) AS gain
                         FROM c, tot WHERE p + n > 0)
              SELECT threshold, gain, n_left, n_right
              FROM g ORDER BY gain DESC, threshold LIMIT 1""")),

    // Q49 — rolling z-score anomalies: per user, each event's value scored
    // against its own trailing week (value-RANGE frame over explicit window
    // sums — the testdata stream is ~2 events/user/day, so a week holds the
    // >= 5 points the score needs), emitting only |z| >= 2.
    Entry(
      "q49_rolling_zscore",
      (s, d) => Profiling.rollingZscore(
        Tables.events(s, d), Seq("user_id"), "ts", "value",
        windowSize = 604800000000L, zThreshold = 2.0, minCount = 5),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts,
                                CAST(value AS DOUBLE) AS value
                         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
                   w AS (SELECT user_id, ts, value,
                                COUNT(*) OVER win AS n,
                                SUM(value) OVER win AS s,
                                SUM(value * value) OVER win AS ss
                         FROM e
                         WINDOW win AS (PARTITION BY user_id ORDER BY ts
                                        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)),
                   z AS (SELECT user_id, ts, value, n,
                                CASE WHEN n >= 5 AND (ss - s * s / n) / n > 0
                                     THEN ROUND((value - s / n) / sqrt((ss - s * s / n) / n)
                                                + 1e-9, 6) END AS z
                         FROM w)
              SELECT user_id, ts, value, n AS n_window, z
              FROM z WHERE abs(z) >= 2.0""")),

    // Q50 — population stability index of the price distribution between
    // returned ('A') and current ('N') line items — the drift monitor,
    // bins anchored on the BEFORE snapshot.
    Entry(
      "q50_psi",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        Profiling.psi(
          li.where(col("l_returnflag") === "A"),
          li.where(col("l_returnflag") === "N"),
          "l_extendedprice", nBins = 10)
      },
      Some("""WITH bounds AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
                              FROM lineitem
                              WHERE l_returnflag = 'A' AND l_extendedprice IS NOT NULL),
                   bb AS (SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - mn) / ((mx - mn) / 10.0)), 0), 9) AS INT) AS bin,
                                 COUNT(*) AS cb
                          FROM lineitem, bounds
                          WHERE l_returnflag = 'A' AND l_extendedprice IS NOT NULL AND mx > mn
                          GROUP BY 1),
                   ab AS (SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - mn) / ((mx - mn) / 10.0)), 0), 9) AS INT) AS bin,
                                 COUNT(*) AS ca
                          FROM lineitem, bounds
                          WHERE l_returnflag = 'N' AND l_extendedprice IS NOT NULL AND mx > mn
                          GROUP BY 1),
                   j AS (SELECT COALESCE(bb.cb, 0) AS cb, COALESCE(ab.ca, 0) AS ca
                         FROM bb FULL OUTER JOIN ab ON bb.bin = ab.bin),
                   t AS (SELECT CAST(SUM(cb) AS BIGINT) AS tb, CAST(SUM(ca) AS BIGINT) AS ta FROM j),
                   nb AS (SELECT COUNT(*) AS n_before FROM lineitem
                          WHERE l_returnflag = 'A' AND l_extendedprice IS NOT NULL),
                   na AS (SELECT COUNT(*) AS n_after FROM lineitem
                          WHERE l_returnflag = 'N' AND l_extendedprice IS NOT NULL),
                   ps AS (SELECT CASE WHEN MAX(t.tb) > 0 AND MAX(t.ta) > 0
                                      THEN ROUND(SUM((GREATEST(CAST(ca AS DOUBLE) / t.ta, 1e-6)
                                                      - GREATEST(CAST(cb AS DOUBLE) / t.tb, 1e-6))
                                                     * ln(GREATEST(CAST(ca AS DOUBLE) / t.ta, 1e-6)
                                                          / GREATEST(CAST(cb AS DOUBLE) / t.tb, 1e-6)))
                                                 + 1e-9, 6)
                                 END AS psi
                          FROM j, t)
              SELECT nb.n_before, na.n_after, ps.psi FROM nb, na, ps""")),

    // Q52 — join-key skew report: the 10 heaviest user keys with row share
    // — the pre-join diagnostic that decides shuffle vs salt vs broadcast.
    Entry(
      "q52_key_skew",
      (s, d) => Profiling.keySkew(Tables.load(s, d, "events"), Seq("user_id"), 10),
      Some("""WITH c AS (SELECT COALESCE(regexp_replace(CAST(user_id AS VARCHAR), '§', '§§', 'g'), '§null§') AS key,
                                COUNT(*) AS cnt
                         FROM events GROUP BY 1),
                   t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
              SELECT key, cnt, ROUND(cnt / CAST(total AS DOUBLE) + 1e-9, 6) AS share
              FROM c, t ORDER BY cnt DESC, key LIMIT 10""")),

    // Q55 — Wilson score intervals for the q46 variant rates: the
    // small-n-honest confidence band (never leaves [0,1]) printed next to
    // every A/B readout.
    Entry(
      "q55_wilson",
      (s, d) => {
        val v = docs(s, d).select(
          when(pmod(Dedup.hash56(col("doc_id").cast("string")), lit(2L)) === 0,
            "control").otherwise("treatment").as("variant"),
          (col("n_chars") > 500).as("success"))
        Experiment.wilsonIntervals(v, "variant", "success")
      },
      Some("""WITH v AS (SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 2 = 0
                                     THEN 'control' ELSE 'treatment' END AS variant,
                                (n_chars > 500) AS success
                         FROM documents),
                   c AS (SELECT variant, COUNT(*) AS n,
                                CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS successes
                         FROM v WHERE success IS NOT NULL GROUP BY variant),
                   w AS (SELECT variant, n, successes,
                                CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                                1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE) AS denom
                         FROM c)
              SELECT variant, n, successes,
                     ROUND(p + 1e-9, 6) AS rate,
                     ROUND((p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * CAST(n AS DOUBLE))) / denom
                           - (CAST(1.96 AS DOUBLE) / denom) * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                                   + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           + 1e-9, 6) AS lo,
                     ROUND((p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * CAST(n AS DOUBLE))) / denom
                           + (CAST(1.96 AS DOUBLE) / denom) * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                                   + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           + 1e-9, 6) AS hi
              FROM w""")),

    // Q53 — Cohen's kappa between the cheap stopword language heuristic
    // (t01) and the gold label: chance-corrected agreement — the honest
    // readout where raw accuracy flatters any predictor on a skewed corpus.
    Entry(
      "q53_cohens_kappa",
      (s, d) => Profiling.cohensKappa(
        docs(s, d).select(
          col("lang").as("gold"),
          TextAnalysis.langIdHeuristic(col("text")).as("pred")),
        "gold", "pred"),
      Some("""WITH pr AS (SELECT lang AS x,
                                 CASE WHEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                                t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
                                           / len(string_split_regex(trim(lower(text)), '\s+')) >= 0.1
                                      THEN 'en' ELSE 'unk' END AS y
                          FROM documents),
                   j AS (SELECT x, y, COUNT(*) AS nxy FROM pr GROUP BY 1, 2),
                   ma AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
                   mb AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM j GROUP BY y),
                   t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM j),
                   po AS (SELECT CAST(COALESCE(SUM(CASE WHEN x IS NOT DISTINCT FROM y THEN nxy END), 0) AS DOUBLE)
                                 / MAX(t.n) AS po
                          FROM j, t),
                   pe AS (SELECT COALESCE(SUM(CAST(nx AS DOUBLE) * ny
                                              / (CAST(n AS DOUBLE) * n)), 0.0) AS pe
                          FROM ma JOIN mb ON ma.x IS NOT DISTINCT FROM mb.y
                               CROSS JOIN t)
              SELECT t.n AS n, ROUND(po.po + 1e-9, 6) AS po,
                     ROUND(pe.pe + 1e-9, 6) AS pe,
                     CASE WHEN pe.pe < 1.0
                          THEN ROUND((po.po - pe.pe) / (1 - pe.pe) + 1e-9, 6)
                     END AS kappa
              FROM t, po, pe""")),

    // Q54 — per-source document cap ("no source dominates the mix"): at
    // most 15 docs per source (the sf0.01 corpus has 25 per source — the cap binds), picked by md5 order — an unbiased,
    // rerun-stable draw. Pure composition of the skew-safe two-pass
    // per-group top-k (TopK.perGroup) over the deterministic hash.
    Entry(
      "q54_source_cap",
      (s, d) => TopK.perGroup(
        docs(s, d).select(col("doc_id"), col("source"),
          Dedup.hash56(col("doc_id").cast("string")).as("_h")),
        Seq("source"), Seq(col("_h").asc, col("doc_id").asc), 15)
        .select(col("source"), col("rank").cast("long").as("rank"), col("doc_id")),
      Some("""WITH h AS (SELECT doc_id, source,
                                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS hh
                         FROM documents),
                   r AS (SELECT source, doc_id,
                                row_number() OVER (PARTITION BY source
                                                   ORDER BY hh, doc_id) AS rank
                         FROM h)
              SELECT source, rank, doc_id FROM r WHERE rank <= 15""")),

    // T37 — BPE ENCODING with a fixed rank-ordered merge table: per-doc BPE
    // token count, the number t14's packing actually budgets against. The
    // table is a spec constant (two rank CHAINS — t+h→th→the, i+n→in→ind —
    // exercise the lowest-rank-first loop), which is what makes the encoder
    // fully oracle-able: a FIXED merge list is a bounded fixpoint, mirrored
    // in DuckDB as a recursive CTE over (word, symbol-list) that each step
    // picks the lowest-rank adjacent pair present and applies it greedily
    // left-to-right (the leftmost-skip run semantics — matched(i) ⇔ raw
    // match at i with an EVEN run of raw matches before it — reduces the
    // kernel's sequential j+=2 scan to per-position list arithmetic; rows
    // exit the recursion when no table pair remains). The LEARNED-merges
    // composition (t36 → encode) stays spec-pinned in BpeSpec; the learner
    // itself is oracled separately via the unrolled-round form
    // ([[bpeLearnerSql]]).
    Entry(
      "t37_bpe_encode",
      (s, d) => TextAnalysis.encodeBpeTokenCount(
        docs(s, d), "doc_id", "text", fixedBpeMerges),
      Some("""WITH RECURSIVE
                mg(rk, l, r) AS (SELECT * FROM (VALUES
                  (0,'t','h'),(1,'th','e'),(2,'i','n'),(3,'in','d'),
                  (4,'e','r'),(5,'a','n'),(6,'r','e'),(7,'s','c')) v(rk,l,r)),
                toks AS (SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
                         FROM documents WHERE text IS NOT NULL),
                wc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks
                       WHERE length(w) > 0 GROUP BY doc_id, w),
                wf AS (SELECT DISTINCT w FROM wc),
                enc AS (
                  SELECT w, [substring(w, i, 1) for i in range(1, length(w) + 1)] AS s FROM wf
                  UNION ALL
                  SELECT w,
                         [CASE WHEN m[i] THEN s[i] || s[i + 1] ELSE s[i] END
                          for i in range(1, len(s) + 1)
                          if i = 1 OR NOT coalesce(m[i - 1], FALSE)] AS s
                  FROM (
                    SELECT w, s,
                           [raw[i] AND ((i - 1 - coalesce(list_max([j for j in range(1, i) if NOT raw[j]]), 0)) % 2 = 0)
                            for i in range(1, len(s))] AS m
                    FROM (
                      SELECT t0.w, t0.s, [t0.s[i] = mg.l AND t0.s[i + 1] = mg.r for i in range(1, len(t0.s))] AS raw
                      FROM (
                        SELECT w, s,
                               (SELECT min(rk) FROM mg
                                WHERE list_contains([s[i] || chr(1) || s[i + 1] for i in range(1, len(s))],
                                                    l || chr(1) || r)) AS brk
                        FROM enc) t0
                      JOIN mg ON mg.rk = t0.brk
                    ) t1
                  ) t2
                ),
                fin AS (
                  SELECT w, len(s) AS k FROM enc
                  WHERE (SELECT min(rk) FROM mg
                         WHERE list_contains([s[i] || chr(1) || s[i + 1] for i in range(1, len(s))],
                                             l || chr(1) || r)) IS NULL
                )
              SELECT d.doc_id, CAST(COALESCE(SUM(wc.cnt * fin.k), 0) AS BIGINT) AS n_bpe_tokens
              FROM documents d
              LEFT JOIN wc ON wc.doc_id = d.doc_id
              LEFT JOIN fin ON fin.w = wc.w
              GROUP BY d.doc_id""")),

    // T38 — blocklist tagging: which banned terms appear as whole tokens,
    // plus the keep/drop verdict. The term list is a plan literal → one
    // shuffle-free map pass; matches emitted sorted for a deterministic
    // engine-comparable readout.
    Entry(
      "t38_blocklist",
      (s, d) => TextAnalysis.blocklistTag(
        docs(s, d), "doc_id", "text", Seq("slow", "dup", "crash")),
      Some("""WITH m AS (SELECT doc_id,
                                list_sort(list_filter(
                                  list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                                  t -> t IN ('slow', 'dup', 'crash'))) AS mt
                         FROM documents)
              SELECT doc_id,
                     COALESCE(len(mt), 0) AS n_matched,
                     COALESCE(array_to_string(mt, ','), '') AS matched_csv,
                     COALESCE(len(mt), 0) > 0 AS blocked
              FROM m""")),

    // T39 — per-doc character profile (code-point count, distinct chars,
    // Shannon entropy in bits): the gibberish detector. Spark side is the
    // shuffle-free CharStats kernel; the oracle rebuilds the histogram
    // relationally with the same cancellation-light entropy form
    // log2(n) − Σ k·log2(k) / n.
    Entry(
      "t39_char_entropy",
      (s, d) => TextAnalysis.charProfile(docs(s, d), "doc_id", "text"),
      Some("""WITH ch AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '(?s).')) AS c
                          FROM documents),
                   h AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
                   t AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
                                COUNT(*) AS nd,
                                ROUND(log2(CAST(SUM(k) AS DOUBLE))
                                      - SUM(k * log2(CAST(k AS DOUBLE))) / SUM(k)
                                      + 1e-9, 6) AS ent
                         FROM h GROUP BY doc_id)
              SELECT d.doc_id,
                     COALESCE(t.n, 0) AS n_chars_counted,
                     COALESCE(t.nd, 0) AS n_distinct_chars,
                     t.ent AS entropy_bits
              FROM documents d LEFT JOIN t ON d.doc_id = t.doc_id""")),

    // T40 — lexical diversity (type-token ratio + hapax ratio): the
    // repetitive-template detector complementing t39's char entropy. One
    // (doc, token) postings aggregate — the t13 tf-idf shuffle shape.
    Entry(
      "t40_ttr",
      (s, d) => TextAnalysis.lexicalDiversity(docs(s, d), "doc_id", "text"),
      Some("""WITH tk AS (SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
                          FROM documents WHERE text IS NOT NULL),
                   c AS (SELECT doc_id, w, COUNT(*) AS k FROM tk
                         WHERE length(w) > 0 GROUP BY doc_id, w),
                   a AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
                                CAST(COUNT(*) AS BIGINT) AS n_types,
                                CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
                         FROM c GROUP BY doc_id)
              SELECT d.doc_id,
                     COALESCE(a.n_tokens, 0) AS n_tokens,
                     COALESCE(a.n_types, 0) AS n_types,
                     COALESCE(a.n_hapax, 0) AS n_hapax,
                     ROUND(CAST(a.n_types AS DOUBLE) / a.n_tokens + 1e-9, 6) AS ttr,
                     ROUND(CAST(a.n_hapax AS DOUBLE) / a.n_types + 1e-9, 6) AS hapax_ratio
              FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id""")),

    // Q56 — Jensen–Shannon divergence between the language mixes of two
    // sources: the symmetric, bounded drift readout next to q50's PSI
    // (JSD handles support mismatch exactly — 0·log 0 = 0 — where PSI
    // needs an epsilon floor).
    Entry(
      "q56_jsd",
      (s, d) => {
        val dd = docs(s, d)
        Profiling.jsDivergence(
          dd.where(col("source") === "src0"),
          dd.where(col("source") === "src1"), "lang")
      },
      Some("""WITH ca AS (SELECT lang AS cat, COUNT(*) AS ca FROM documents
                          WHERE source = 'src0' GROUP BY 1),
                   cb AS (SELECT lang AS cat, COUNT(*) AS cb FROM documents
                          WHERE source = 'src1' GROUP BY 1),
                   j AS (SELECT COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
                         FROM ca FULL OUTER JOIN cb ON ca.cat IS NOT DISTINCT FROM cb.cat),
                   t AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb,
                                CAST(COUNT(*) AS BIGINT) AS ncat FROM j),
                   s AS (SELECT CAST(ca AS DOUBLE) / t.ta AS p,
                                CAST(cb AS DOUBLE) / t.tb AS q FROM j, t)
              SELECT t.ta AS n_a, t.tb AS n_b, t.ncat AS n_categories,
                     CASE WHEN t.ta > 0 AND t.tb > 0 THEN
                       ROUND(SUM(CASE WHEN p > 0 THEN p * log2(p / ((p + q) / 2.0)) ELSE 0 END * 0.5
                               + CASE WHEN q > 0 THEN q * log2(q / ((p + q) / 2.0)) ELSE 0 END * 0.5)
                             + 1e-9, 6)
                     END AS jsd_bits
              FROM s, t GROUP BY t.ta, t.tb, t.ncat""")),

    // T41 — Unicode NFC normalization: the pre-hash canonical-form cleaning
    // pass. The synthetic corpus is ASCII (changed = false everywhere, the
    // fast path); the combining-character semantics are spec-pinned in
    // SimilarityTextSpec against composed/decomposed plants.
    Entry(
      "t41_nfc_normalize",
      (s, d) => TextAnalysis.normalizeText(docs(s, d), "doc_id", "text"),
      Some("""SELECT doc_id,
                     nfc_normalize(text) AS text_norm,
                     (text IS DISTINCT FROM nfc_normalize(text)) AS changed
              FROM documents""")),

    // Q57 — chi-squared independence of lang × source (with Cramér's V):
    // the significance companion to q45's mutual information over the same
    // pair machinery, expectation summed over the FULL r×c grid.
    Entry(
      "q57_chi2",
      (s, d) => Profiling.chiSquared(docs(s, d), "lang", "source"),
      Some("""WITH j AS (SELECT lang AS x, source AS y, COUNT(*) AS nxy
                         FROM documents GROUP BY 1, 2),
                   ma AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
                   mb AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM j GROUP BY y),
                   t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM j),
                   g AS (SELECT ma.nx, mb.ny, t.n, COALESCE(j.nxy, 0) AS o
                         FROM ma CROSS JOIN mb CROSS JOIN t
                         LEFT JOIN j ON j.x IS NOT DISTINCT FROM ma.x
                                    AND j.y IS NOT DISTINCT FROM mb.y),
                   s AS (SELECT MAX(n) AS n,
                                SUM(pow(o - CAST(nx AS DOUBLE) * ny / n, 2)
                                    / (CAST(nx AS DOUBLE) * ny / n)) AS chi2
                         FROM g),
                   rc AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS r,
                                 (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS c)
              SELECT COALESCE(s.n, 0) AS n, rc.r, rc.c,
                     GREATEST(rc.r - 1, 0) * GREATEST(rc.c - 1, 0) AS dof,
                     ROUND(s.chi2 + 1e-9, 6) AS chi2,
                     CASE WHEN rc.r > 1 AND rc.c > 1 AND s.n > 0
                          THEN ROUND(sqrt(s.chi2 / (s.n * LEAST(rc.r - 1, rc.c - 1)))
                                     + 1e-9, 6)
                     END AS cramers_v
              FROM s, rc""")),

    // Q58 — KS statistic of the c04 score/label pair: max |TPR − FPR| with
    // its attaining threshold, rounded BEFORE the argmax (the q51
    // engine-portable tie-break convention; lowest threshold wins).
    Entry(
      "q58_ks",
      (s, d) => Profiling.ksStatistic(
        docs(s, d).withColumn("is_en", col("lang") === "en"),
        "n_chars", "is_en"),
      Some("""WITH per AS (SELECT CAST(n_chars AS DOUBLE) AS threshold,
                                  COUNT(*) FILTER (lang = 'en') AS pos,
                                  COUNT(*) FILTER (lang <> 'en') AS neg
                           FROM documents GROUP BY 1),
                   tot AS (SELECT COUNT(*) FILTER (lang = 'en') AS p,
                                  COUNT(*) FILTER (lang <> 'en') AS n
                           FROM documents),
                   c AS (SELECT threshold,
                                CAST(SUM(pos) OVER (ORDER BY threshold DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
                                CAST(SUM(neg) OVER (ORDER BY threshold DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
                         FROM per),
                   k AS (SELECT threshold,
                                ROUND(abs(tp::DOUBLE / p - fp::DOUBLE / n) + 1e-9, 6) AS ks
                         FROM c, tot WHERE p > 0 AND n > 0)
              SELECT ks, threshold AS at_threshold
              FROM k ORDER BY ks DESC, threshold LIMIT 1""")),

    // S22 — exact phrase search (scan form, constant phrase): adjacency
    // counted as per-row HOFs over the token array inside the scan stage —
    // the bm25TopK philosophy; the positional-index probe form is
    // spec-pinned to identical results in SimilarityTextSpec.
    Entry(
      "s22_phrase_search",
      (s, d) => TextAnalysis.phraseCount(
        docs(s, d), "doc_id", "text", Seq("hash", "join")),
      Some("""WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                          FROM documents WHERE text IS NOT NULL),
                   m AS (SELECT doc_id,
                                len([i for i in range(1, len(t))
                                     if t[i] = 'hash' AND t[i + 1] = 'join']) AS n
                         FROM tk)
              SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
              FROM m WHERE n > 0""")),

    // C08 — text-hygiene gate composition: NFC normalize → blocklist drop →
    // char-entropy + lexical-diversity quality cut, each stage individually
    // oracled (t41/t38/t39/t40), the composition pinned end-to-end. The
    // cuts are on the 6dp-ROUNDED stage outputs (the c01 discipline) so
    // the keep set is bit-reproducible across engines; thresholds bind at
    // ~p25 of this corpus's distributions.
    Entry(
      "c08_hygiene_gate",
      (s, d) => {
        val normed = TextAnalysis.normalizeText(docs(s, d), "doc_id", "text")
          .select(col("doc_id"), col("text_norm").as("text"))
        val unblocked = TextAnalysis.blocklistTag(
            normed, "doc_id", "text", Seq("dup", "crash"))
          .where(!col("blocked")).select("doc_id")
        val pool = normed.join(unblocked, Seq("doc_id"))
        val ent = TextAnalysis.charProfile(pool, "doc_id", "text")
          .select("doc_id", "entropy_bits")
        val lex = TextAnalysis.lexicalDiversity(pool, "doc_id", "text")
          .select("doc_id", "n_tokens", "ttr")
        ent.join(lex, Seq("doc_id"))
          .where(col("entropy_bits") >= 4.05 && col("ttr") >= 0.35)
          .select("doc_id", "entropy_bits", "ttr", "n_tokens")
      },
      Some("""WITH nn AS (SELECT doc_id, nfc_normalize(text) AS text FROM documents),
                   bl AS (SELECT doc_id FROM nn
                          WHERE NOT COALESCE(len(list_filter(
                                  list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                                  t -> t IN ('dup', 'crash'))), 0) > 0),
                   pool AS (SELECT nn.* FROM nn JOIN bl USING (doc_id)),
                   ch AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '(?s).')) AS c
                          FROM pool),
                   h AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
                   e AS (SELECT doc_id,
                                ROUND(log2(CAST(SUM(k) AS DOUBLE))
                                      - SUM(k * log2(CAST(k AS DOUBLE))) / SUM(k)
                                      + 1e-9, 6) AS entropy_bits
                         FROM h GROUP BY doc_id),
                   tk AS (SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
                          FROM pool WHERE text IS NOT NULL),
                   c2 AS (SELECT doc_id, w, COUNT(*) AS k FROM tk
                          WHERE length(w) > 0 GROUP BY doc_id, w),
                   l AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
                                ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(k) + 1e-9, 6) AS ttr
                         FROM c2 GROUP BY doc_id)
              SELECT e.doc_id, e.entropy_bits, l.ttr, l.n_tokens
              FROM e JOIN l USING (doc_id)
              WHERE e.entropy_bits >= 4.05 AND l.ttr >= 0.35""")),

    // Q59 — Mann–Whitney U on doc length across the q55 md5 variant split:
    // the nonparametric A/B readout a heavy-tailed metric wants (q46 is
    // rates, q47 means). Pooled midranks with tie correction; the oracle
    // replays midranks as a window over the distinct-value frame (Spark
    // uses the distributed prefix sum instead — never a global window).
    Entry(
      "q59_mannwhitney",
      (s, d) => Experiment.mannWhitneyU(
        docs(s, d).select(
          when(pmod(Dedup.hash56(col("doc_id").cast("string")), lit(2L)) === 0,
            "control").otherwise("treatment").as("variant"),
          col("n_chars")),
        "variant", "n_chars", "control", "treatment"),
      Some("""WITH v AS (SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 2 = 0
                                     THEN 'control' ELSE 'treatment' END AS g,
                                CAST(n_chars AS DOUBLE) AS x
                         FROM documents WHERE n_chars IS NOT NULL),
                   vc AS (SELECT x, COUNT(*) AS c FROM v GROUP BY x),
                   r AS (SELECT x, SUM(c) OVER (ORDER BY x
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb,
                                c
                         FROM vc),
                   mr AS (SELECT x, cb + (c + 1) / 2.0 AS midrank FROM r),
                   vg AS (SELECT g, x, COUNT(*) AS cg FROM v GROUP BY g, x),
                   rg AS (SELECT g, CAST(SUM(cg) AS BIGINT) AS n,
                                 SUM(cg * mr.midrank) AS rsum
                          FROM vg JOIN mr USING (x) GROUP BY g),
                   t AS (SELECT COALESCE(SUM(CASE WHEN c > 1
                                              THEN CAST(c AS DOUBLE)*c*c - c
                                              ELSE 0 END), 0) AS ties,
                                CAST(SUM(c) AS BIGINT) AS nn
                         FROM vc),
                   w AS (SELECT MAX(CASE WHEN g = 'control' THEN n END) AS na,
                                MAX(CASE WHEN g = 'control' THEN rsum END) AS ra,
                                MAX(CASE WHEN g = 'treatment' THEN n END) AS nb
                         FROM rg)
              SELECT w.na AS n_control, w.nb AS n_treatment,
                     ROUND(w.ra - w.na * (w.na + 1) / 2.0 + 1e-9, 6) AS u_control,
                     CASE WHEN w.na IS NOT NULL AND w.nb IS NOT NULL AND t.nn > 1
                               AND (w.na * w.nb / 12.0) * ((t.nn + 1) - t.ties / (t.nn * (t.nn - 1.0))) > 0
                          THEN ROUND((w.ra - w.na * (w.na + 1) / 2.0 - w.na * w.nb / 2.0)
                                     / sqrt((w.na * w.nb / 12.0)
                                            * ((t.nn + 1) - t.ties / (t.nn * (t.nn - 1.0))))
                                     + 1e-9, 6)
                     END AS z,
                     CASE WHEN w.na IS NOT NULL AND w.nb IS NOT NULL AND w.na * w.nb > 0
                          THEN ROUND(1.0 - 2.0 * (w.ra - w.na * (w.na + 1) / 2.0)
                                     / (w.na * w.nb) + 1e-9, 6)
                     END AS rank_biserial
              FROM w, t""")),

    // S23 — full k-means (Lloyd) fit over the embeddings: md5-seeded cells
    // refined by two hard E-steps (6dp-rounded centroids and cosines, ties
    // to the lowest cell). The oracle unrolls both rounds — seed mod,
    // per-cell means, argmax — exactly; per-vector labels make the whole
    // trajectory hash-checked, not just the final sizes.
    Entry(
      "s23_kmeans",
      (s, d) => Similarity.kmeansClusters(
        embs(s, d), "vec_id", "embedding", k = 4, iters = 2),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   a0 AS (SELECT vec_id, v,
                                 ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4 AS cell
                          FROM e),
                   c1 AS (SELECT cell, list(m ORDER BY i) AS c
                          FROM (SELECT cell, i, ROUND(avg(v[i]) + 1e-9, 6) AS m
                                FROM a0, (SELECT unnest(range(1, 65)) AS i) r GROUP BY 1, 2)
                          GROUP BY cell),
                   a1 AS (SELECT vec_id, v, cell FROM
                           (SELECT e.vec_id, e.v, c1.cell,
                                   row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY ROUND(list_cosine_similarity(e.v, c1.c) + 1e-9, 6) DESC,
                                              c1.cell) AS rn
                            FROM e CROSS JOIN c1) WHERE rn = 1),
                   c2 AS (SELECT cell, list(m ORDER BY i) AS c
                          FROM (SELECT cell, i, ROUND(avg(v[i]) + 1e-9, 6) AS m
                                FROM a1, (SELECT unnest(range(1, 65)) AS i) r GROUP BY 1, 2)
                          GROUP BY cell)
              SELECT vec_id, cell AS cluster FROM
               (SELECT e.vec_id, c2.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY ROUND(list_cosine_similarity(e.v, c2.c) + 1e-9, 6) DESC,
                                  c2.cell) AS rn
                FROM e CROSS JOIN c2) WHERE rn = 1""")),

    // Q60 — HyperLogLog grouped distinct count (p=8) next to the exact
    // answer: the 100 TB cardinality primitive as RELATIONAL register state
    // (md5-derived buckets/ranks, integer-scaled harmonic fold — exact,
    // order-independent), so the oracle replays registers AND estimate
    // bit-for-bit. rel_err makes the sketch's accuracy part of the
    // hash-checked contract.
    Entry(
      "q60_hll_distinct",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val keys = Seq("l_returnflag", "l_linestatus")
        val est = Hll.distinctSketch(li, keys, "l_partkey", p = 8)
        li.groupBy(keys.map(col): _*)
          .agg(countDistinct(col("l_partkey")).as("n_exact"))
          .join(est, keys)
          .select(
            col("l_returnflag"), col("l_linestatus"), col("n_exact"),
            col("hll_distinct"),
            stableRound(
              abs(col("hll_distinct") - col("n_exact")) / col("n_exact"), 6)
              .as("rel_err"))
      },
      Some("""WITH h AS (SELECT l_returnflag, l_linestatus,
                                ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM lineitem WHERE l_partkey IS NOT NULL),
                   regs AS (SELECT l_returnflag, l_linestatus, h >> 48 AS b,
                                   MAX(49 - length(regexp_replace(bin(h & ((1::BIGINT << 48) - 1)), '^0+', ''))) AS r
                            FROM h GROUP BY 1, 2, 3),
                   f AS (SELECT l_returnflag, l_linestatus,
                                COUNT(*) AS ne,
                                SUM(1::BIGINT << (49 - r)) AS s
                         FROM regs GROUP BY 1, 2),
                   est AS (SELECT l_returnflag, l_linestatus,
                                  CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256 * 562949953421312
                                    / CAST((256 - ne) * 562949953421312 + s AS DOUBLE) AS e0,
                                  256 - ne AS v
                           FROM f),
                   ee AS (SELECT l_returnflag, l_linestatus,
                                 ROUND(CASE WHEN e0 <= 640.0 AND v > 0
                                            THEN 256.0 * ln(256 / CAST(v AS DOUBLE))
                                            ELSE e0 END + 1e-9, 6) AS hll_distinct
                          FROM est),
                   x AS (SELECT l_returnflag, l_linestatus,
                                COUNT(DISTINCT l_partkey) AS n_exact
                         FROM lineitem GROUP BY 1, 2)
              SELECT x.l_returnflag, x.l_linestatus, x.n_exact, ee.hll_distinct,
                     ROUND(abs(ee.hll_distinct - x.n_exact) / x.n_exact + 1e-9, 6) AS rel_err
              FROM ee JOIN x USING (l_returnflag, l_linestatus)""")),

    // Q61 — Z-order (Morton) layout key over (l_partkey, l_suppkey): the
    // multi-dimensional clustering key a 100 TB lake sorts files by so
    // footer min/max stats prune on EITHER column. All-integer bucket +
    // interleave arithmetic; the oracle is GENERATED from the same
    // dims/bits (Layout.zValueSql), so Spark and DuckDB unroll identical
    // shift/mask terms.
    Entry(
      "q61_zorder",
      (s, d) => Layout.withZValue(
        Tables.load(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits = 8)
        .select("l_orderkey", "l_linenumber", "z_value"),
      Some(s"""SELECT l_orderkey, l_linenumber, z_value FROM (
                 ${Layout.zValueSql("lineitem", Seq("l_partkey", "l_suppkey"), 8)}
               )""")),

    // Q62 — count-min sketch point estimates (depth=3, width=64) next to
    // the exact per-supplier counts: the 100 TB heavy-hitter primitive as
    // RELATIONAL register state (md5-derived "row:value" buckets, integer
    // counts end to end), so the oracle replays registers AND every
    // min-across-rows estimate bit-for-bit. width 64 < 100 suppliers
    // forces collisions, so the hash-checked contract includes real
    // overcounts — and the CMS guarantee that they are never UNDER.
    Entry(
      "q62_cms_counts",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val regs = Cms.registers(li, Nil, "l_suppkey", depth = 3, width = 64)
        val exact = li.where(col("l_suppkey").isNotNull)
          .groupBy("l_suppkey").agg(count(lit(1)).as("n_exact"))
        Cms.estimate(regs, exact, Nil, "l_suppkey", depth = 3, width = 64)
          .join(exact, Seq("l_suppkey"))
          .select(
            col("l_suppkey"), col("n_exact"), col("cms_count"),
            (col("cms_count") - col("n_exact")).as("overcount"))
      },
      Some("""WITH r AS (SELECT rr.r AS _row,
                                ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS _bucket,
                                COUNT(*) AS cnt
                         FROM lineitem CROSS JOIN (SELECT unnest(range(0, 3)) AS r) rr
                         WHERE l_suppkey IS NOT NULL
                         GROUP BY 1, 2),
                   x AS (SELECT l_suppkey, COUNT(*) AS n_exact
                         FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
                   p AS (SELECT x.l_suppkey, rr.r AS _row,
                                ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(x.l_suppkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS _bucket
                         FROM x CROSS JOIN (SELECT unnest(range(0, 3)) AS r) rr),
                   e AS (SELECT p.l_suppkey, MIN(COALESCE(r.cnt, 0)) AS cms_count
                         FROM p LEFT JOIN r ON p._row = r._row AND p._bucket = r._bucket
                         GROUP BY 1)
              SELECT x.l_suppkey, x.n_exact, e.cms_count,
                     e.cms_count - x.n_exact AS overcount
              FROM x JOIN e USING (l_suppkey)""")),

    // S24 — product quantization ADC retrieval: per-subspace Lloyd
    // codebooks (m=2 halves, k=4 codes, 2 rounds, md5-seeded), one code
    // word per vector, and the top-10 nearest docs to vec 0 scored purely
    // from the m×k distance table over the CODES — the raw floats are
    // never touched corpus-side. The oracle unrolls the whole trajectory
    // (seed → means → argmin × 2 → codes → table → ranking) with the s23
    // rounding contract (6dp at every boundary, ties to the lowest
    // cell/id), so fit, encode AND the ADC ranking are all hash-checked.
    Entry(
      "s24_pq_adc",
      (s, d) => {
        val e = embs(s, d)
        // fit returns cents persisted; released after materializing below
        val cb = Pq.fit(e, "vec_id", "embedding", dims = 64, m = 2, k = 4,
          iters = 2)
        val codes = Pq.encode(e, "vec_id", "embedding", cb)
        val out = Pq.adcTopK(
          cb, codes.filter(col("vec_id") =!= 0L), "vec_id",
          e.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 10)
          .select("rank", "vec_id", "adc_dist2")
        val materialized = out.localCheckpoint(true)
        cb.unpersisted()
        materialized
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   sub AS (SELECT vec_id, s.s AS sub,
                                  CASE WHEN s.s = 0 THEN v[1:32] ELSE v[33:64] END AS sv
                           FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS s) s),
                   a0 AS (SELECT vec_id, sub, sv,
                                 ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4 AS cell
                          FROM sub),
                   c1 AS (SELECT sub, cell, list(m ORDER BY i) AS c
                          FROM (SELECT sub, cell, i, ROUND(avg(sv[i]) + 1e-9, 6) AS m
                                FROM a0, (SELECT unnest(range(1, 33)) AS i) r
                                GROUP BY 1, 2, 3)
                          GROUP BY sub, cell),
                   a1 AS (SELECT vec_id, sub, sv, cell FROM
                           (SELECT s0.vec_id, s0.sub, s0.sv, c1.cell,
                                   row_number() OVER (PARTITION BY s0.vec_id, s0.sub
                                     ORDER BY ROUND(list_distance(s0.sv, c1.c) + 1e-9, 6), c1.cell) AS rn
                            FROM sub s0 JOIN c1 ON c1.sub = s0.sub) WHERE rn = 1),
                   c2 AS (SELECT sub, cell, list(m ORDER BY i) AS c
                          FROM (SELECT sub, cell, i, ROUND(avg(sv[i]) + 1e-9, 6) AS m
                                FROM a1, (SELECT unnest(range(1, 33)) AS i) r
                                GROUP BY 1, 2, 3)
                          GROUP BY sub, cell),
                   codes AS (SELECT vec_id, sub, cell FROM
                              (SELECT s0.vec_id, s0.sub, c2.cell,
                                      row_number() OVER (PARTITION BY s0.vec_id, s0.sub
                                        ORDER BY ROUND(list_distance(s0.sv, c2.c) + 1e-9, 6), c2.cell) AS rn
                               FROM sub s0 JOIN c2 ON c2.sub = s0.sub) WHERE rn = 1),
                   dt AS (SELECT c2.sub, c2.cell,
                                 ROUND(list_distance(q.sv, c2.c) + 1e-9, 6) AS d
                          FROM c2 JOIN (SELECT sub, sv FROM sub WHERE vec_id = 0) q
                            ON q.sub = c2.sub),
                   sc AS (SELECT codes.vec_id, ROUND(SUM(dt.d * dt.d) + 1e-9, 6) AS adc_dist2
                          FROM codes JOIN dt ON dt.sub = codes.sub AND dt.cell = codes.cell
                          WHERE codes.vec_id <> 0
                          GROUP BY 1),
                   top AS (SELECT vec_id, adc_dist2,
                                  row_number() OVER (ORDER BY adc_dist2, vec_id) AS rank
                           FROM sc)
              SELECT rank, vec_id, adc_dist2 FROM top WHERE rank <= 10""")),

    // Q63 — KMV/theta sketch set-operation cardinalities: distinct AND
    // intersection estimates for the open-vs-fulfilled customer sets from
    // two k=128 bottom-hash sketches, next to the exact answers. The
    // sketch is an ORDER STATISTIC (k smallest md5 hashes — deterministic,
    // not sampled), every estimate one integer-ratio division, so the
    // oracle replays sketches and estimates bit-for-bit. This is the
    // set-op sketch HLL cannot be: registers union but never intersect.
    Entry(
      "q63_kmv_intersect",
      (s, d) => {
        val ord = Tables.load(s, d, "orders")
        val k = 128
        val aSide = ord.filter(col("o_orderstatus") === "O")
        val bSide = ord.filter(col("o_orderstatus") === "F")
        // the two k-row sketches feed three consumers (estimate x2,
        // intersect) — persist so the bottom-k pass runs once per side
        val sa = Kmv.sketch(aSide, Nil, "o_custkey", k).persist()
        val sb = Kmv.sketch(bSide, Nil, "o_custkey", k).persist()
        val res = aSide.agg(countDistinct("o_custkey").as("n_a_exact"))
          .crossJoin(bSide.agg(countDistinct("o_custkey").as("n_b_exact")))
          .crossJoin(
            aSide.select("o_custkey").distinct()
              .join(bSide.select("o_custkey").distinct(), "o_custkey")
              .agg(count(lit(1)).as("n_common_exact")))
          .crossJoin(Kmv.estimate(sa, Nil, k)
            .withColumnRenamed("kmv_distinct", "kmv_a"))
          .crossJoin(Kmv.estimate(sb, Nil, k)
            .withColumnRenamed("kmv_distinct", "kmv_b"))
          .crossJoin(Kmv.intersectEstimate(sa, sb, Nil, k))
          .withColumn("rel_err",
            stableRound(
              abs(col("kmv_intersect") - col("n_common_exact")) /
                col("n_common_exact"), 6))
        val materialized = res.localCheckpoint(true)
        sa.unpersist(blocking = false); sb.unpersist(blocking = false)
        materialized
      },
      Some("""WITH ha AS (SELECT DISTINCT ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,14))::UBIGINT::BIGINT AS h
                          FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL),
                   hb AS (SELECT DISTINCT ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,14))::UBIGINT::BIGINT AS h
                          FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL),
                   sa AS (SELECT h FROM ha ORDER BY h LIMIT 128),
                   sb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
                   ta AS (SELECT COUNT(*) AS n, MAX(h) AS mh FROM sa),
                   tb AS (SELECT COUNT(*) AS n, MAX(h) AS mh FROM sb),
                   ea AS (SELECT ROUND((CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                                        ELSE 127 * CAST(72057594037927936 AS DOUBLE) / mh END) + 1e-9, 6) AS kmv_a FROM ta),
                   eb AS (SELECT ROUND((CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                                        ELSE 127 * CAST(72057594037927936 AS DOUBLE) / mh END) + 1e-9, 6) AS kmv_b FROM tb),
                   co AS (SELECT COUNT(*) AS c FROM sa JOIN sb USING (h)),
                   th AS (SELECT LEAST(CASE WHEN ta.n < 128 THEN 72057594037927936 ELSE ta.mh END,
                                       CASE WHEN tb.n < 128 THEN 72057594037927936 ELSE tb.mh END) AS t FROM ta, tb),
                   ei AS (SELECT ROUND(CAST(co.c AS DOUBLE) * CAST(72057594037927936 AS DOUBLE) / CAST(th.t AS DOUBLE) + 1e-9, 6) AS kmv_intersect FROM co, th),
                   xa AS (SELECT COUNT(DISTINCT o_custkey) AS n_a_exact FROM orders WHERE o_orderstatus = 'O'),
                   xb AS (SELECT COUNT(DISTINCT o_custkey) AS n_b_exact FROM orders WHERE o_orderstatus = 'F'),
                   xc AS (SELECT COUNT(*) AS n_common_exact FROM
                           (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') a
                           JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') b USING (o_custkey))
              SELECT xa.n_a_exact, xb.n_b_exact, xc.n_common_exact, ea.kmv_a,
                     eb.kmv_b, ei.kmv_intersect,
                     ROUND(abs(ei.kmv_intersect - xc.n_common_exact) / xc.n_common_exact + 1e-9, 6) AS rel_err
              FROM xa, xb, xc, ea, eb, ei""")),

    // Q64 — hash-threshold sampled quantiles next to the exact ones: the
    // bounded-shuffle first cut at a 100 TB percentile pass. The sample is
    // a MAP-ONLY Bernoulli-by-hash filter (deterministic — the oracle
    // inlines the SAME integer threshold — mergeable, and nested across
    // rates), so the rank-selection quantile pass runs over rate × corpus
    // rows; sampled and exact p50/p95 plus their rel errors are all in the
    // hash-checked contract.
    Entry(
      "q64_sampled_quantiles",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .where(col("l_extendedprice").isNotNull)
        val key = concat(
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))
        val sample = TopK.hashSample(li, key, 0.05)
        val qs = Seq("p50" -> 0.5, "p95" -> 0.95)
        val sq = Quantiles.exactGrouped(
          sample, Seq("l_returnflag"), "l_extendedprice",
          qs.map { case (n, p) => s"${n}_sample" -> p })
        val ns = sample.groupBy("l_returnflag").agg(count(lit(1)).as("n_sample"))
        val xq = Quantiles.exactGrouped(
          li, Seq("l_returnflag"), "l_extendedprice",
          qs.map { case (n, p) => s"${n}_exact" -> p })
        val j = sq.join(ns, Seq("l_returnflag")).join(xq, Seq("l_returnflag"))
        val rounded = qs.foldLeft(j) { case (acc, (n, _)) =>
          acc.withColumn(s"${n}_sample", stableRound(col(s"${n}_sample"), 6))
            .withColumn(s"${n}_exact", stableRound(col(s"${n}_exact"), 6))
        }
        qs.foldLeft(rounded) { case (acc, (n, _)) =>
          acc.withColumn(s"${n}_rel_err",
            stableRound(
              abs(col(s"${n}_sample") - col(s"${n}_exact")) / col(s"${n}_exact"),
              6))
        }
      },
      Some(s"""WITH li AS (SELECT l_returnflag, l_orderkey, l_linenumber,
                                  CAST(l_extendedprice AS DOUBLE) AS v
                           FROM lineitem WHERE l_extendedprice IS NOT NULL),
                    sm AS (SELECT l_returnflag, v FROM li
                           WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 14))::UBIGINT::BIGINT
                                 < ${TopK.hashThreshold(0.05)}),
                    sq AS (SELECT l_returnflag,
                                  ROUND(quantile_cont(v, 0.5) + 1e-9, 6) AS p50_sample,
                                  ROUND(quantile_cont(v, 0.95) + 1e-9, 6) AS p95_sample,
                                  COUNT(*) AS n_sample
                           FROM sm GROUP BY 1),
                    xq AS (SELECT l_returnflag,
                                  ROUND(quantile_cont(v, 0.5) + 1e-9, 6) AS p50_exact,
                                  ROUND(quantile_cont(v, 0.95) + 1e-9, 6) AS p95_exact
                           FROM li GROUP BY 1)
               SELECT sq.l_returnflag, sq.p50_sample, sq.p95_sample, sq.n_sample,
                      xq.p50_exact, xq.p95_exact,
                      ROUND(abs(sq.p50_sample - xq.p50_exact) / xq.p50_exact + 1e-9, 6) AS p50_rel_err,
                      ROUND(abs(sq.p95_sample - xq.p95_exact) / xq.p95_exact + 1e-9, 6) AS p95_rel_err
               FROM sq JOIN xq USING (l_returnflag)""")),

    // Q65 — pairwise Spearman rank correlation: the monotonic-association
    // half of the q39 diagnostic (Pearson is blind to any nonlinear but
    // monotone coupling and is wrecked by heavy tails — exactly the shape
    // of pipeline measures like doc length vs quality score). Ranks are
    // exact integers (2·avgrank), produced by a per-column distinct-value
    // aggregate + DISTRIBUTED prefix sum (never a single-task global
    // window) + one keyed join back; the oracle replays the same
    // rank-then-pairwise-complete Pearson closed form.
    Entry(
      "q65_spearman",
      (s, d) => Profiling.spearmanMatrix(
        Tables.load(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val rankCtes = cols.map(c =>
          s"""r_$c AS (SELECT $c AS v,
                              CAST(2 * SUM(COUNT(*)) OVER (ORDER BY $c)
                                   - COUNT(*) + 1 AS DOUBLE) AS r
                       FROM lineitem WHERE $c IS NOT NULL GROUP BY $c)""")
          .mkString(", ")
        val joins = cols.map(c => s"LEFT JOIN r_$c ON l.$c = r_$c.v")
          .mkString(" ")
        val sel = cols.map(c => s"r_$c.r AS rk_$c").mkString(", ")
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        val pairSelects = pairs.map { case (a, b) =>
          val (x, y) = (s"rk_$a", s"rk_$b")
          val dx = s"(COUNT(*) * SUM($x * $x) - SUM($x) * SUM($x))"
          val dy = s"(COUNT(*) * SUM($y * $y) - SUM($y) * SUM($y))"
          s"""SELECT '$a' AS col_a, '$b' AS col_b, COUNT(*) AS n_pairs,
                     ROUND(CASE WHEN COUNT(*) >= 2 AND $dx > 0 AND $dy > 0
                           THEN (COUNT(*) * SUM($x * $y) - SUM($x) * SUM($y))
                                / sqrt($dx * $dy)
                           END + 1e-9, 6) AS rho
              FROM b WHERE $x IS NOT NULL AND $y IS NOT NULL"""
        }
        s"""WITH $rankCtes,
                 b AS (SELECT $sel FROM lineitem l $joins)
            ${pairSelects.mkString(" UNION ALL ")}"""
      }),

    // Q66 — multiple-testing governance: per-segment mean z-tests against
    // the corpus, then Benjamini–Hochberg q-values. Screening every
    // segment × metric at raw α manufactures false positives by
    // construction; BH is the standard step-up correction. The p-values
    // ride the Abramowitz–Stegun closed form (engine-portable arithmetic
    // — the first hash-checked p-values in the suite, where q46 had to
    // stop at z), rounded at each stage boundary so the BH ordering
    // compares identical doubles in both engines.
    Entry(
      "q66_bh_fdr",
      (s, d) => Experiment.bhAdjust(
        Experiment.meanZTests(Tables.events(s, d), "event_type", "value"),
        "group", "p"),
      Some {
        val sf = Experiment.normalSfSql("abs(z)")
        s"""WITH r0 AS (SELECT CAST(event_type AS VARCHAR) AS grp,
                               CAST(value AS DOUBLE) AS v
                        FROM events WHERE value IS NOT NULL),
                 g AS (SELECT grp, COUNT(*) AS n, SUM(v) AS s
                       FROM r0 GROUP BY grp),
                 gl AS (SELECT COUNT(*) AS n_all, SUM(v) AS s_all,
                               SUM(v * v) AS ss_all
                        FROM r0),
                 t AS (SELECT grp, n, ROUND(s / n + 1e-9, 6) AS mean,
                              CASE WHEN (ss_all - s_all * s_all / n_all) / n_all > 0
                                   THEN ROUND((s / n - s_all / n_all)
                                              / (sqrt((ss_all - s_all * s_all / n_all)
                                                      / n_all) / sqrt(n))
                                              + 1e-9, 6) END AS z
                       FROM g, gl),
                 pv AS (SELECT grp, n, mean, z,
                               CASE WHEN z IS NOT NULL
                                    THEN ROUND(2.0 * $sf + 1e-9, 6) END AS p
                        FROM t),
                 m AS (SELECT COUNT(*) AS m FROM pv WHERE p IS NOT NULL),
                 r AS (SELECT grp, p,
                              CAST(row_number() OVER (ORDER BY p, grp) AS BIGINT) AS rank
                       FROM pv WHERE p IS NOT NULL),
                 q AS (SELECT r.grp, r.rank,
                              ROUND(LEAST(MIN(r2.p * m.m / r2.rank), 1.0)
                                    + 1e-9, 6) AS q_bh
                       FROM r JOIN r r2
                         ON (r2.p > r.p OR (r2.p = r.p AND r2.grp >= r.grp)), m
                       GROUP BY r.grp, r.rank)
            SELECT pv.grp AS "group", pv.n, pv.mean, pv.z, pv.p,
                   q.rank, q.q_bh, q.q_bh <= 0.05 AS reject
            FROM pv LEFT JOIN q ON pv.grp = q.grp"""
      }),

    // T42 — duplicate-n-gram coverage (the second Gopher repetition axis):
    // t10's top-gram ratio misses documents whose repetition is spread
    // over MANY recurring phrases; coverage — the fraction of token
    // positions inside ANY bigram occurring twice in the doc — is the
    // standard complement. The keep gate compares the UNROUNDED int/int
    // ratio, exact in both engines.
    Entry(
      "t42_dup_coverage",
      (s, d) => TextAnalysis.dupNgramCoverage(
        docs(s, d), "doc_id", "text", n = 2),
      Some("""WITH nn AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                          FROM documents),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM nn),
                   g AS (SELECT doc_id, p.pos AS pos, p.gram AS gram
                         FROM (SELECT doc_id,
                                      unnest([{'pos': i - 1, 'gram': array_to_string(toks[i:i+1], ' ')}
                                              for i in range(1, greatest(len(toks) - 2, 0) + 2)]) AS p
                               FROM tk)),
                   d AS (SELECT doc_id, gram
                         FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
                         WHERE c >= 2),
                   cov AS (SELECT doc_id, COUNT(DISTINCT pp) AS cov
                           FROM (SELECT g.doc_id, unnest(range(g.pos, g.pos + 2)) AS pp
                                 FROM g JOIN d USING (doc_id, gram))
                           GROUP BY doc_id),
                   dc AS (SELECT doc_id, COUNT(*) AS n_dup FROM d GROUP BY 1),
                   b AS (SELECT doc_id, len(toks) AS n_tokens FROM tk)
              SELECT b.doc_id AS doc_id, b.n_tokens AS n_tokens,
                     COALESCE(dc.n_dup, 0) AS n_dup_grams,
                     ROUND(CAST(COALESCE(cov.cov, 0) AS DOUBLE) / b.n_tokens + 1e-9, 6) AS dup_coverage,
                     (CAST(COALESCE(cov.cov, 0) AS DOUBLE) / b.n_tokens <= 0.3) AS keep
              FROM b LEFT JOIN dc ON b.doc_id = dc.doc_id
                     LEFT JOIN cov ON b.doc_id = cov.doc_id""")),

    // Q67 — Kaplan–Meier survival for time-to-first-failure, with
    // right-censoring: the readout q34's cohort grid gets WRONG for
    // subjects still mid-observation (never-failed users are not "failure
    // at window end" — they leave the risk set as censored). The subject
    // clock runs from each user's first event to their first 'error' (or
    // the corpus max, censored). Integer-µs DIV day arithmetic end to
    // end; at-risk suffix counts and the Σln(1−d/n) log-product both ride
    // the distributed prefix sum; a full-exit step pins S to exactly 0 on
    // both engines rather than racing ln(0) semantics.
    Entry(
      "q67_survival",
      (s, d) => Experiment.kaplanMeierCurve(
        Experiment.timeToFirst(
          Tables.events(s, d), "user_id", "ts", "event_type", "error"),
        "duration_days", "observed"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                         FROM events WHERE ts IS NOT NULL),
                   u AS (SELECT user_id, min(t) AS f,
                                min(CASE WHEN event_type = 'error' THEN t END) AS fl
                         FROM e GROUP BY 1),
                   g AS (SELECT max(t) AS gmax, COUNT(DISTINCT user_id) AS n_users
                         FROM e),
                   d0 AS (SELECT (coalesce(fl, gmax) - f) // 86400000000 AS dur,
                                 CASE WHEN fl IS NOT NULL THEN 1 ELSE 0 END AS obs
                          FROM u, g),
                   pd AS (SELECT dur, COUNT(*) AS n_total,
                                 CAST(SUM(obs) AS BIGINT) AS d
                          FROM d0 GROUP BY 1),
                   o AS (SELECT dur, n_total, d,
                                CAST((SELECT n_users FROM g)
                                     - (SUM(n_total) OVER (ORDER BY dur) - n_total)
                                     AS BIGINT) AS at_risk
                         FROM pd),
                   s AS (SELECT dur, at_risk, d, n_total - d AS censored,
                                SUM(CASE WHEN d > 0 AND d < at_risk
                                         THEN ln(1 - CAST(d AS DOUBLE) / at_risk)
                                         ELSE 0 END)
                                    OVER (ORDER BY dur) AS lnsum
                         FROM o)
              SELECT dur AS duration_days, at_risk AS n_at_risk,
                     d AS n_events, censored AS n_censored,
                     CASE WHEN d = at_risk THEN 0.0
                          ELSE ROUND(exp(lnsum) + 1e-9, 6) END AS survival
              FROM s""")),

    // S26 — MMR diversified re-ranking: the retrieval-side twin of d09's
    // semantic dedup (d09 prunes near-dups from the corpus once; MMR
    // prunes them from each result list — what a RAG/few-shot selector
    // needs: k near-identical passages waste the context budget). Corpus
    // touched once for the pool; the k greedy rounds run on the pool-sized
    // frame with struct-max argmax folds, no driver collect; the oracle
    // unrolls the identical trajectory (6 dp boundaries, lowest-id ties).
    Entry(
      "s26_mmr_rerank",
      (s, d) => Similarity.mmrRerank(
        embs(s, d), "vec_id", "embedding", queryId = 0L,
        poolSize = 20, k = 5, lambda = 0.7),
      Some(Similarity.mmrSql(
        queryId = 0L, poolSize = 20, k = 5, lambda = 0.7))),

    // S25 — IVF-PQ, the FAISS-standard composition of the engine's two ANN
    // halves: label cells prune WHICH vectors to score (top-2 by
    // query→centroid L2), PQ codes shrink WHAT a score costs (ADC
    // lookup-sums over 2-int codes). s24 scans every code row; s11 prunes
    // but pays byte-per-dim residency — this is the shape that holds at
    // 100 TB. The oracle splices s24's full fit/encode/ADC trajectory with
    // s11's centroid-probe CTEs, restricted scoring joined on the probed
    // membership; every boundary 6dp, ties to lowest cell/id.
    Entry(
      "s25_ivf_pq",
      (s, d) => {
        val e = embs(s, d)
        val cb = Pq.fit(e, "vec_id", "embedding", dims = 64, m = 2, k = 4,
          iters = 2)
        val codes = Pq.encode(e, "vec_id", "embedding", cb)
        val cents = Similarity.centroids(e, "label", "embedding")
        val out = Pq.ivfPqTopK(
          cb, codes.filter(col("vec_id") =!= 0L), "vec_id",
          e.select(col("vec_id"), col("label")), "label", cents,
          e.filter(col("vec_id") === 0L), "vec_id", "embedding",
          k = 10, nProbe = 2)
          .select("rank", "vec_id", "adc_dist2")
        val materialized = out.localCheckpoint(true)
        cb.unpersisted()
        materialized
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   sub AS (SELECT vec_id, s.s AS sub,
                                  CASE WHEN s.s = 0 THEN v[1:32] ELSE v[33:64] END AS sv
                           FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS s) s),
                   a0 AS (SELECT vec_id, sub, sv,
                                 ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4 AS cell
                          FROM sub),
                   c1 AS (SELECT sub, cell, list(m ORDER BY i) AS c
                          FROM (SELECT sub, cell, i, ROUND(avg(sv[i]) + 1e-9, 6) AS m
                                FROM a0, (SELECT unnest(range(1, 33)) AS i) r
                                GROUP BY 1, 2, 3)
                          GROUP BY sub, cell),
                   a1 AS (SELECT vec_id, sub, sv, cell FROM
                           (SELECT s0.vec_id, s0.sub, s0.sv, c1.cell,
                                   row_number() OVER (PARTITION BY s0.vec_id, s0.sub
                                     ORDER BY ROUND(list_distance(s0.sv, c1.c) + 1e-9, 6), c1.cell) AS rn
                            FROM sub s0 JOIN c1 ON c1.sub = s0.sub) WHERE rn = 1),
                   c2 AS (SELECT sub, cell, list(m ORDER BY i) AS c
                          FROM (SELECT sub, cell, i, ROUND(avg(sv[i]) + 1e-9, 6) AS m
                                FROM a1, (SELECT unnest(range(1, 33)) AS i) r
                                GROUP BY 1, 2, 3)
                          GROUP BY sub, cell),
                   codes AS (SELECT vec_id, sub, cell FROM
                              (SELECT s0.vec_id, s0.sub, c2.cell,
                                      row_number() OVER (PARTITION BY s0.vec_id, s0.sub
                                        ORDER BY ROUND(list_distance(s0.sv, c2.c) + 1e-9, 6), c2.cell) AS rn
                               FROM sub s0 JOIN c2 ON c2.sub = s0.sub) WHERE rn = 1),
                   q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   probed AS (SELECT cent.label FROM cent, q
                              ORDER BY ROUND(list_distance(cv, qv) + 1e-9, 6), cent.label
                              LIMIT 2),
                   mem AS (SELECT e.vec_id FROM e JOIN probed ON e.label = probed.label),
                   dt AS (SELECT c2.sub, c2.cell,
                                 ROUND(list_distance(qs.sv, c2.c) + 1e-9, 6) AS d
                          FROM c2 JOIN (SELECT sub, sv FROM sub WHERE vec_id = 0) qs
                            ON qs.sub = c2.sub),
                   sc AS (SELECT codes.vec_id, ROUND(SUM(dt.d * dt.d) + 1e-9, 6) AS adc_dist2
                          FROM codes
                          JOIN dt ON dt.sub = codes.sub AND dt.cell = codes.cell
                          JOIN mem ON mem.vec_id = codes.vec_id
                          WHERE codes.vec_id <> 0
                          GROUP BY 1),
                   top AS (SELECT vec_id, adc_dist2,
                                  row_number() OVER (ORDER BY adc_dist2, vec_id) AS rank
                           FROM sc)
              SELECT rank, vec_id, adc_dist2 FROM top WHERE rank <= 10""")),

    // Q68 — log-rank test between two hash-split user groups on the q67
    // failure clock: THE standard "did the variant change time-to-event?"
    // readout, and what a naive mean-lifetime t-test gets wrong (censored
    // subjects must leave the risk set, not count as events). Expected
    // events and hypergeometric variance fold over the duration × group
    // grid; χ²₁'s p rides the same portable normalSf as q66, computed
    // from the 6dp-ROUNDED chi2 so both engines transform the identical
    // double.
    Entry(
      "q68_logrank",
      (s, d) => {
        val subj = Experiment.timeToFirst(
          Tables.events(s, d), "user_id", "ts", "event_type", "error")
          .withColumn("variant",
            when(pmod(Dedup.hash56(col("user_id").cast("string")),
              lit(2L)) === 0, "a").otherwise("b"))
        Experiment.logRank(
          subj, "duration_days", "observed", "variant", "a", "b")
      },
      Some {
        val sf = Experiment.normalSfSql("sqrt(x.chi2)")
        s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                       FROM events WHERE ts IS NOT NULL),
                 u AS (SELECT user_id, min(t) AS f,
                              min(CASE WHEN event_type = 'error' THEN t END) AS fl
                       FROM e GROUP BY 1),
                 g AS (SELECT max(t) AS gmax FROM e),
                 s0 AS (SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 2 = 0
                                    THEN 'a' ELSE 'b' END AS grp,
                               (coalesce(fl, gmax) - f) // 86400000000 AS dur,
                               CASE WHEN fl IS NOT NULL THEN 1 ELSE 0 END AS obs
                        FROM u, g),
                 per AS (SELECT dur, grp, COUNT(*) AS n,
                                CAST(SUM(obs) AS BIGINT) AS d
                         FROM s0 GROUP BY 1, 2),
                 grid AS (SELECT dd.dur, gg.grp,
                                 coalesce(per.n, 0) AS n, coalesce(per.d, 0) AS d
                          FROM (SELECT DISTINCT dur FROM per) dd
                          CROSS JOIN (SELECT 'a' AS grp UNION ALL SELECT 'b') gg
                          LEFT JOIN per ON per.dur = dd.dur AND per.grp = gg.grp),
                 ng AS (SELECT grp, COUNT(*) AS ng FROM s0 GROUP BY 1),
                 ar AS (SELECT grid.dur, grid.grp, grid.n, grid.d,
                               CAST(ng.ng - (SUM(grid.n) OVER (PARTITION BY grid.grp ORDER BY grid.dur ROWS UNBOUNDED PRECEDING) - grid.n) AS BIGINT) AS r
                        FROM grid JOIN ng ON ng.grp = grid.grp),
                 wide AS (SELECT dur,
                                 MAX(CASE WHEN grp = 'a' THEN r END) AS ra,
                                 MAX(CASE WHEN grp = 'b' THEN r END) AS rb,
                                 MAX(CASE WHEN grp = 'a' THEN d END) AS da,
                                 MAX(CASE WHEN grp = 'b' THEN d END) AS db
                          FROM ar GROUP BY dur),
                 terms AS (SELECT da, db, da + db AS dt, ra + rb AS nt,
                                  CAST(rb AS DOUBLE) / (ra + rb) AS pb
                           FROM wide WHERE da + db > 0 AND ra + rb > 0),
                 tt AS (SELECT da, db, dt * pb AS ee,
                               CASE WHEN nt > 1
                                    THEN dt * pb * (1 - pb) * CAST(nt - dt AS DOUBLE) / (nt - 1)
                                    ELSE 0 END AS v
                        FROM terms),
                 f AS (SELECT CAST(SUM(da) AS BIGINT) AS sda,
                              CAST(SUM(db) AS BIGINT) AS sdb,
                              SUM(ee) AS se, SUM(v) AS sv
                       FROM tt),
                 c AS (SELECT MAX(CASE WHEN grp = 'a' THEN ng END) AS n_a,
                              MAX(CASE WHEN grp = 'b' THEN ng END) AS n_b
                       FROM ng),
                 x AS (SELECT CASE WHEN sv > 0
                                   THEN ROUND((sdb - se) * (sdb - se) / sv + 1e-9, 6) END AS chi2,
                              sda, sdb, se FROM f)
            SELECT c.n_a, c.n_b, coalesce(x.sda, 0) AS events_a,
                   coalesce(x.sdb, 0) AS events_b,
                   ROUND(x.se + 1e-9, 6) AS expected_b, x.chi2,
                   CASE WHEN x.chi2 IS NOT NULL
                        THEN ROUND(2.0 * $sf + 1e-9, 6) END AS p
            FROM c, x"""
      }),

    // Q69 — CUSUM change-point per event type: the offline "WHEN did this
    // metric shift?" companion to q49's online outlier flag — the argmax
    // of |Σ(x_t − x̄)| over daily bucket means tent-peaks at a level
    // shift. Corpus pass → day-grid frame; keyed cumulative window;
    // stage-boundary rounding makes the argmax engine-replayable (ties to
    // the earliest day).
    Entry(
      "q69_cusum",
      (s, d) => Profiling.cusumChangepoint(
        Tables.events(s, d), Seq("event_type"), "ts", "value",
        bucketUs = 86400000000L),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                                CAST(value AS DOUBLE) AS v
                         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
                   b AS (SELECT event_type, day, ROUND(AVG(v) + 1e-9, 6) AS x
                         FROM e GROUP BY 1, 2),
                   m AS (SELECT event_type, AVG(x) AS xbar,
                                COUNT(*) AS n_buckets
                         FROM b GROUP BY 1),
                   s AS (SELECT b.event_type, m.n_buckets, b.day,
                                ROUND(SUM(b.x - m.xbar)
                                      OVER (PARTITION BY b.event_type ORDER BY b.day
                                            ROWS UNBOUNDED PRECEDING) + 1e-9, 6) AS cs
                         FROM b JOIN m ON b.event_type = m.event_type),
                   r AS (SELECT event_type, n_buckets, day, cs,
                                ROUND(abs(cs) + 1e-9, 6) AS ca,
                                row_number() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(abs(cs) + 1e-9, 6) DESC, day) AS rn
                         FROM s)
              SELECT event_type, n_buckets, day AS cp_bucket,
                     cs AS cusum, ca AS cusum_abs
              FROM r WHERE rn = 1""")),

    // Q70 — per-group MULTI-feature least squares with R²: q38's trend
    // generalized to the normal equations, solved IN THE PLAN by Cramer
    // over generated cofactor expansions (scalar codegen math per group
    // row — no driver solve, no iteration). Features constant-centered
    // per the conditioning contract. The oracle replays the same sums and
    // the same 3×3 Cramer closed form.
    Entry(
      "q70_linear_fit",
      (s, d) => Profiling.linearFit(
        Tables.load(s, d, "lineitem")
          .withColumn("qty_c", col("l_quantity") - 25.0)
          .withColumn("disc_c", col("l_discount") - 0.05),
        Seq("l_returnflag"), Seq("qty_c", "disc_c"), "l_extendedprice"),
      Some("""WITH e AS (SELECT l_returnflag,
                                CAST(l_quantity AS DOUBLE) - 25.0 AS x1,
                                CAST(l_discount AS DOUBLE) - 0.05 AS x2,
                                CAST(l_extendedprice AS DOUBLE) AS y
                         FROM lineitem
                         WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
                           AND l_extendedprice IS NOT NULL),
                   g AS (SELECT l_returnflag, COUNT(*) AS n,
                                SUM(x1) AS s1, SUM(x2) AS s2,
                                SUM(x1*x1) AS s11, SUM(x1*x2) AS s12,
                                SUM(x2*x2) AS s22,
                                SUM(y) AS sy, SUM(x1*y) AS s1y,
                                SUM(x2*y) AS s2y, SUM(y*y) AS syy
                         FROM e GROUP BY 1),
                   f AS (SELECT *,
                                n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                                  + s2*(s1*s12 - s11*s2) AS det,
                                sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
                                  + s2*(s1y*s12 - s11*s2y) AS det0,
                                n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
                                  + s2*(s1*s2y - s1y*s2) AS det1,
                                n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
                                  + sy*(s1*s12 - s11*s2) AS det2
                         FROM g),
                   b AS (SELECT *,
                                CASE WHEN det <> 0 AND n > 2 THEN det0/det END AS b0,
                                CASE WHEN det <> 0 AND n > 2 THEN det1/det END AS b1,
                                CASE WHEN det <> 0 AND n > 2 THEN det2/det END AS b2
                         FROM f),
                   r AS (SELECT *,
                                syy - 2*(b0*sy + b1*s1y + b2*s2y)
                                  + (b0*b0*n + b1*b1*s11 + b2*b2*s22
                                     + 2*b0*b1*s1 + 2*b0*b2*s2 + 2*b1*b2*s12) AS sse,
                                syy - sy*sy/n AS sst
                         FROM b)
              SELECT l_returnflag, n AS n_points,
                     ROUND(b0 + 1e-9, 6) AS intercept,
                     ROUND(b1 + 1e-9, 6) AS beta_qty_c,
                     ROUND(b2 + 1e-9, 6) AS beta_disc_c,
                     CASE WHEN b0 IS NOT NULL AND sst <> 0
                          THEN ROUND(1.0 - sse/sst + 1e-9, 6) END AS r2
              FROM r""")),

    // Q71 — logistic-regression curation classifier, trained by 6 in-plan
    // full-batch gradient steps (chained one-row broadcast folds — the
    // MMR/k-means iteration discipline, no driver collect) on O(1)-scaled
    // lineitem features against the return flag. 6dp rounding at every
    // coefficient boundary makes the whole trajectory engine-replayable;
    // the oracle unrolls the same 6 steps as CTEs.
    Entry(
      "q71_logistic",
      (s, d) => Classifier.logisticFit(
        Tables.load(s, d, "lineitem")
          .withColumn("qn", (col("l_quantity") - 25.0) / 25.0)
          .withColumn("dn", (col("l_discount") - 0.05) * 20.0)
          .withColumn("ret",
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0)),
        Seq("qn", "dn"), "ret", iters = 6, lr = 0.5),
      Some(logisticSql(iters = 6, lr = 0.5))),

    // Q71b — the FROZEN-model scoring path (round-15 verdict task 3):
    // q71's fit is frozen into a LogisticModel and a deterministic probe
    // slice is scored through Classifier.scoreLogistic — the exact
    // per-row (score, pred) surface a persisted model serves, hash-
    // checked row-for-row against an oracle that unrolls the same 6
    // training steps and then scores with the final coefficients.
    // Persisted-vs-direct and streaming-vs-batch parity are
    // ClassifierSpec's pins; this entry pins the scoring arithmetic.
    Entry(
      "q71b_frozen_logit_score",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .withColumn("qn", (col("l_quantity") - 25.0) / 25.0)
          .withColumn("dn", (col("l_discount") - 0.05) * 20.0)
          .withColumn("ret",
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
        // pinned: logisticModel's one-row contract check counts the frame,
        // and scoring reads it again — one evaluation, not two
        val fit = Classifier.logisticFit(li, Seq("qn", "dn"), "ret",
          iters = 6, lr = 0.5).localCheckpoint(true)
        val m = Classifier.logisticModel(fit, Seq("qn", "dn"))
        val probe = li.filter(col("l_orderkey") % 100 === 0)
          .withColumn("rid",
            col("l_orderkey") * lit(10L) + col("l_linenumber"))
        Classifier.scoreLogistic(m, probe, "rid")
      },
      Some(frozenLogitScoreSql(iters = 6, lr = 0.5))),

    // S27 — JL random-projection retrieval audit: recall@5 of exact L2
    // search in md5-derived ±1/√16 projected space (64→16, zero corpus
    // passes to build) against full-dim exact L2, every 50th vector as a
    // query — the data-independent end of the compression ladder priced
    // with the same recallAtK gate as IVF/SQ8/PCA. Projected coordinates
    // 6dp-rounded on both sides, so distances compare identical numbers.
    Entry(
      "s27_jl_recall",
      (s, d) => {
        val e = embs(s, d)
        val p = Similarity.jlProject(e, "embedding", 64, 16, "jl1")
        val exact = Similarity.bruteForceL2Batch(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, excludeSelf = true)
        val approx = Similarity.bruteForceL2Batch(
          p, "vec_id", "jl_vec",
          p.filter(col("vec_id") % 50 === 0), "vec_id", "jl_vec",
          k = 5, excludeSelf = true)
        Similarity.recallAtK(exact, approx, "vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   sgn AS (SELECT j, i,
                                  CASE WHEN ('0x' || substr(md5('jl1_' || i || '_' || j), 1, 14))::UBIGINT % 2 = 0
                                       THEN 1.0 ELSE -1.0 END AS s
                           FROM range(16) t(j), range(1, 65) u(i)),
                   p AS (SELECT vec_id, list(pj ORDER BY j) AS pv
                         FROM (SELECT e.vec_id, sgn.j,
                                      ROUND(SUM(e.v[sgn.i] * sgn.s) / sqrt(16.0) + 1e-9, 6) AS pj
                               FROM e, sgn GROUP BY e.vec_id, sgn.j)
                         GROUP BY vec_id),
                   q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
                   pq AS (SELECT vec_id AS q_id, pv AS qpv FROM p WHERE vec_id % 50 = 0),
                   ex AS (SELECT q.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY q.q_id
                                   ORDER BY list_distance(e.v, q.qv) ASC, e.vec_id) AS rk
                          FROM e, q WHERE e.vec_id <> q.q_id),
                   exact AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
                   ax AS (SELECT pq.q_id, p.vec_id,
                                 row_number() OVER (PARTITION BY pq.q_id
                                   ORDER BY list_distance(p.pv, pq.qpv) ASC, p.vec_id) AS rk
                          FROM p, pq WHERE p.vec_id <> pq.q_id),
                   approx AS (SELECT q_id, vec_id FROM ax WHERE rk <= 5)
              SELECT exact.q_id AS q_id,
                     ROUND(SUM(CASE WHEN approx.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                           / COUNT(*), 6) AS recall
              FROM exact LEFT JOIN approx
                ON exact.q_id = approx.q_id AND exact.vec_id = approx.vec_id
              GROUP BY exact.q_id""")),

    // T43 — Flesch reading-ease + FK grade: the readability quality axis
    // next to t39/t40/t42. Word/sentence/syllable counts are INTEGERS
    // (vowel-run heuristic, floored at 1/word) so the oracle is exact
    // except the two 6dp-rounded scores; per-row regex/lambda kernels,
    // zero shuffle.
    Entry(
      "t43_readability",
      (s, d) => TextAnalysis.readability(docs(s, d), "doc_id", "text"),
      Some("""WITH w AS (SELECT doc_id,
                                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                            w -> regexp_matches(w, '[a-z0-9]')) AS ws,
                                len(list_filter(regexp_split_to_array(lower(text), '[.!?]+'),
                                                s -> regexp_matches(s, '[a-z0-9]'))) AS sents
                         FROM documents WHERE text IS NOT NULL),
                   c AS (SELECT doc_id, len(ws) AS words, sents,
                                CAST(coalesce(list_sum(list_transform(ws,
                                  w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0)
                                  AS BIGINT) AS syls
                         FROM w)
              SELECT doc_id, words AS n_words, sents AS n_sentences,
                     syls AS n_syllables,
                     CASE WHEN words > 0 AND sents > 0
                          THEN ROUND(CAST('206.835' AS DOUBLE)
                                     - CAST('1.015' AS DOUBLE) * (CAST(words AS DOUBLE) / sents)
                                     - CAST('84.6' AS DOUBLE) * (CAST(syls AS DOUBLE) / words)
                                     + 1e-9, 6) END AS flesch,
                     CASE WHEN words > 0 AND sents > 0
                          THEN ROUND(CAST('0.39' AS DOUBLE) * (CAST(words AS DOUBLE) / sents)
                                     + CAST('11.8' AS DOUBLE) * (CAST(syls AS DOUBLE) / words)
                                     - CAST('15.59' AS DOUBLE) + 1e-9, 6) END AS fk_grade
              FROM c""")),

    // Q72 — Welch's unequal-variance t-test: the MEANS readout between
    // q46's rate z-test and q59's rank test. One (n, Σx, Σx²) aggregate
    // per side, closed-form t + Welch–Satterthwaite df on the one-row
    // frame; two-sided p from the 6dp-ROUNDED |t| through the same
    // portable normal polynomial as q66 (large-sample form; df emitted so
    // small-df callers can consult the exact t table).
    Entry(
      "q72_welch",
      (s, d) => Experiment.welchTTest(
        Tables.events(s, d), "event_type", "value",
        control = "click", treatment = "purchase"),
      Some {
        val sf = Experiment.normalSfSql("abs(t)")
        s"""WITH e AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                       FROM events
                       WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
                 s AS (SELECT g, COUNT(*) AS n, SUM(v) AS sv, SUM(v * v) AS sq
                       FROM e GROUP BY g),
                 w AS (SELECT MAX(CASE WHEN g = 'click' THEN n END) AS na,
                              MAX(CASE WHEN g = 'click' THEN sv END) AS sa,
                              MAX(CASE WHEN g = 'click' THEN sq END) AS qa,
                              MAX(CASE WHEN g = 'purchase' THEN n END) AS nb,
                              MAX(CASE WHEN g = 'purchase' THEN sv END) AS sb,
                              MAX(CASE WHEN g = 'purchase' THEN sq END) AS qb
                       FROM s),
                 f AS (SELECT na, nb, sa / na AS ma, sb / nb AS mb,
                              (qa - sa * sa / na) / (na - 1) AS va,
                              (qb - sb * sb / nb) / (nb - 1) AS vb
                       FROM w),
                 d AS (SELECT *, va / na + vb / nb AS se2,
                              na IS NOT NULL AND nb IS NOT NULL
                                AND na > 1 AND nb > 1
                                AND va / na + vb / nb > 0 AS ok
                       FROM f),
                 t AS (SELECT *, CASE WHEN ok THEN
                                ROUND((ma - mb) / sqrt(se2) + 1e-9, 6) END AS t
                       FROM d)
            SELECT na AS n_control, nb AS n_treatment,
                   ROUND(ma + 1e-9, 6) AS mean_control,
                   ROUND(mb + 1e-9, 6) AS mean_treatment,
                   t AS t_stat,
                   CASE WHEN ok THEN
                     ROUND(se2 * se2 / (va * va / (na * na * (na - 1))
                                        + vb * vb / (nb * nb * (nb - 1))) + 1e-9, 6)
                   END AS df,
                   CASE WHEN ok THEN ROUND(2.0 * $sf + 1e-9, 6) END AS p
            FROM t"""
      }),

    // C09 — split-conformal prediction intervals, composed end-to-end from
    // oracled stages: t34's deterministic split → q70's Cramer fit on the
    // TRAIN slice → 6dp |residuals| → q23's exact grouped quantile of the
    // CALIBRATION residuals (p=0.9; the interpolated-quantile variant of
    // the classic ceil((n+1)(1−α)) order statistic — identical to within
    // one rank position at these n) → empirical coverage on the TEST
    // slice, which lands ≈ 0.9 by the conformal guarantee. Every branch
    // (resid ≤ qhat) compares 6dp-rounded numbers on both sides.
    Entry(
      "c09_conformal",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .withColumn("qty_c", col("l_quantity") - 25.0)
          .withColumn("disc_c", col("l_discount") - 0.05)
          .withColumn("_rid",
            concat_ws("_", col("l_orderkey"), col("l_linenumber")))
        val split = TextAnalysis.deterministicSplit(li, "_rid")
        val fit = Profiling.linearFit(
          split.where(col("split") === "train"),
          Seq("l_returnflag"), Seq("qty_c", "disc_c"), "l_extendedprice")
          .select(col("l_returnflag"), col("intercept"),
            col("beta_qty_c"), col("beta_disc_c"))
        // three consumers read the residual frame (calibration quantile,
        // n_cal, test coverage) — persist it so lineitem is scanned twice
        // (fit pass + this build), not per consumer; Verify/Bench clear
        // the cache between queries
        val scored = split.join(broadcast(fit), Seq("l_returnflag"))
          .withColumn("_resid", stableRound(abs(
            col("l_extendedprice") - (col("intercept")
              + col("beta_qty_c") * col("qty_c")
              + col("beta_disc_c") * col("disc_c"))), 6))
          // every consumer reads exactly these three columns — project
          // BEFORE the persist so the cache holds 3 narrow columns, not
          // the full lineitem row (71 MB → ~5 MB cache at sf0.1; guide
          // §2.3 project-before-materialize)
          .select("l_returnflag", "split", "_resid")
          .persist()
        // materialize BEFORE the consumers: the three readers are sibling
        // stages of ONE final plan and run concurrently — against a lazy
        // persist each computed the full residual subtree itself (cache
        // blocks land once but the compute raced 3×; measured 8 concurrent
        // 3 s stages at sf0.1). One count() pins the cache first.
        scored.count()
        val qhat = Quantiles.exactGrouped(
          scored.where(col("split") === "validation"),
          Seq("l_returnflag"), "_resid", Seq("qhat" -> 0.9))
          .select(col("l_returnflag"), stableRound(col("qhat"), 6).as("qhat"))
        val nCal = scored.where(col("split") === "validation")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_cal"))
        scored.where(col("split") === "test")
          .join(broadcast(qhat), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("qhat"))
          .agg(
            count(lit(1)).as("n_test"),
            stableRound(
              avg(when(col("_resid") <= col("qhat"), 1.0).otherwise(0.0)), 6)
              .as("coverage"))
          .join(broadcast(nCal), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_cal"), col("qhat"),
            col("n_test"), col("coverage"))
      },
      Some("""WITH e AS (SELECT l_returnflag,
                                CAST(l_quantity AS DOUBLE) - 25.0 AS x1,
                                CAST(l_discount AS DOUBLE) - 0.05 AS x2,
                                CAST(l_extendedprice AS DOUBLE) AS y,
                                ('0x' || substr(md5(l_orderkey || '_' || l_linenumber), 1, 14))::UBIGINT::BIGINT % 100 AS bucket
                         FROM lineitem
                         WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
                           AND l_extendedprice IS NOT NULL),
                   sp AS (SELECT *, CASE WHEN bucket < 90 THEN 'train'
                                         WHEN bucket < 95 THEN 'validation'
                                         ELSE 'test' END AS split
                          FROM e),
                   g AS (SELECT l_returnflag, COUNT(*) AS n,
                                SUM(x1) AS s1, SUM(x2) AS s2,
                                SUM(x1*x1) AS s11, SUM(x1*x2) AS s12,
                                SUM(x2*x2) AS s22,
                                SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
                         FROM sp WHERE split = 'train' GROUP BY 1),
                   f AS (SELECT *,
                                n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                                  + s2*(s1*s12 - s11*s2) AS det,
                                sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
                                  + s2*(s1y*s12 - s11*s2y) AS det0,
                                n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
                                  + s2*(s1*s2y - s1y*s2) AS det1,
                                n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
                                  + sy*(s1*s12 - s11*s2) AS det2
                         FROM g),
                   b AS (SELECT l_returnflag,
                                ROUND(det0/det + 1e-9, 6) AS b0,
                                ROUND(det1/det + 1e-9, 6) AS b1,
                                ROUND(det2/det + 1e-9, 6) AS b2
                         FROM f WHERE det <> 0 AND n > 2),
                   r AS (SELECT sp.l_returnflag, sp.split,
                                ROUND(abs(sp.y - (b.b0 + b.b1*sp.x1 + b.b2*sp.x2)) + 1e-9, 6) AS resid
                         FROM sp JOIN b USING (l_returnflag)),
                   qh AS (SELECT l_returnflag, COUNT(*) AS n_cal,
                                 ROUND(quantile_cont(resid, 0.9) + 1e-9, 6) AS qhat
                          FROM r WHERE split = 'validation' GROUP BY 1)
              SELECT r.l_returnflag, qh.n_cal, qh.qhat,
                     COUNT(*) AS n_test,
                     ROUND(AVG(CASE WHEN r.resid <= qh.qhat THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS coverage
              FROM r JOIN qh USING (l_returnflag)
              WHERE r.split = 'test'
              GROUP BY 1, 2, 3""")),

    // Q73 — Gini concentration of customer spend per nation: the
    // inequality/governance readout next to q52's key skew and q54's
    // source caps. The unit frame (spend per customer) is the output of
    // one corpus aggregate — the input contract that keeps the keyed rank
    // window units-sized, never corpus-sized. Unit totals 6dp-rounded at
    // the stage boundary so ranks bind to identical numbers.
    Entry(
      "q73_gini",
      (s, d) => {
        val spend = Tables.load(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(stableRound(sum(col("o_totalprice")), 6).as("spend"))
        val units = Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .join(spend, col("c_custkey") === col("o_custkey"))
        Profiling.giniConcentration(units, Seq("c_nationkey"), "spend")
      },
      Some("""WITH spend AS (SELECT o_custkey,
                                    ROUND(SUM(o_totalprice) + 1e-9, 6) AS v
                             FROM orders GROUP BY 1),
                   u AS (SELECT c.c_nationkey, s.v
                         FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey),
                   r AS (SELECT c_nationkey, v,
                                CAST(row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY v ASC) AS DOUBLE) AS rk
                         FROM u WHERE v IS NOT NULL),
                   g AS (SELECT c_nationkey, COUNT(*) AS n_units,
                                SUM(v) AS t, SUM(rk * v) AS s, MIN(v) AS mn
                         FROM r GROUP BY 1)
              SELECT c_nationkey, n_units,
                     ROUND(t + 1e-9, 6) AS total,
                     CASE WHEN mn >= 0 AND t > 0
                          THEN ROUND((2.0 * s - (n_units + 1) * t)
                                     / (n_units * t) + 1e-9, 6) END AS gini
              FROM g""")),

    // T44 — OOV rate against a frozen vocabulary: the tokenizer-fit
    // readout ("does my vocab cover this corpus?") and the domain-shift
    // tripwire. Vocab = train-split tokens with frequency >= 5 (threshold,
    // not top-K — no tie-break surface); counts exact integers, so the
    // oracle is exact except the 6dp rate.
    Entry(
      "t44_oov_rate",
      (s, d) => {
        val dd = docs(s, d)
        val vocab = TextAnalysis.vocabulary(
          TextAnalysis.deterministicSplit(dd, "doc_id")
            .where(col("split") === "train"),
          "text", minCount = 5)
        TextAnalysis.oovRate(dd, "doc_id", "text", vocab)
      },
      Some("""WITH sp AS (SELECT doc_id, text,
                                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 100 AS bucket
                          FROM documents),
                   vt AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                          FROM sp WHERE bucket < 90),
                   v AS (SELECT w FROM vt GROUP BY w HAVING COUNT(*) >= 5),
                   toks AS (SELECT doc_id,
                                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                            FROM sp),
                   f AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
                   j AS (SELECT f.doc_id, f.c, v.w IS NOT NULL AS inv
                         FROM f LEFT JOIN v ON f.w = v.w)
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(SUM(CASE WHEN inv THEN 0 ELSE c END) AS BIGINT) AS n_oov,
                     ROUND(SUM(CASE WHEN inv THEN 0 ELSE c END) * 1.0 / SUM(c) + 1e-9, 6) AS oov_rate
              FROM j GROUP BY 1""")),

    // Q74 — mergeable q-digest quantile sketch: the fourth member of the
    // sketch family (HLL distinct / CMS frequency / KMV set-ops / now
    // quantiles) and the day-over-day 100 TB percentile primitive q64's
    // exact pass cannot be. The query exercises the FULL lifecycle — two
    // independent half-builds (orderkey parity), an exact-count merge, the
    // post-order estimate — and the oracle replays every compression round
    // bit-for-bit (integer registers end to end), so build, merge AND
    // estimate are all hash-checked; rank errors vs the exact quantiles put
    // the declared `bits·Σ⌊nᵢ/k⌋` slack bound in the contract.
    Entry(
      "q74_qdigest_quantiles",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val keys = Seq("l_returnflag")
        val (lo, hi, bits, k) = (900.0, 105000.0, 12, 512)
        val half0 = li.where(pmod(col("l_orderkey"), lit(2)) === 0)
        val half1 = li.where(pmod(col("l_orderkey"), lit(2)) === 1)
        val sa = QDigest.registers(half0, keys, "l_extendedprice", lo, hi, bits, k)
        val sb = QDigest.registers(half1, keys, "l_extendedprice", lo, hi, bits, k)
        // the merged sketch feeds three consumers (estimate, size, nothing
        // corpus-sized) — materialize the ≤ 3k-rows/group frame once
        val mg = QDigest.merge(sa, sb, keys, bits, k).localCheckpoint(true)
        val est = QDigest.estimate(mg, keys, bits, lo, hi,
          Seq("p50_qd" -> 0.5, "p95_qd" -> 0.95))
        val sizes = mg.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_nodes"))
        val nn = li.where(col("l_extendedprice").isNotNull)
        val exact = Quantiles.exactGrouped(nn, keys, "l_extendedprice",
          Seq("p50_exact" -> 0.5, "p95_exact" -> 0.95))
        val leaves = nn.select(col("l_returnflag"),
          QDigest.leafIndex(col("l_extendedprice"), lo, hi, bits).as("_leaf"))
        val tr = leaves
          .join(broadcast(est.select(col("l_returnflag"),
            col("p50_qd_leaf"), col("p95_qd_leaf"))), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("_leaf") <= col("p50_qd_leaf"), 1L).otherwise(0L)).as("_tr50"),
            sum(when(col("_leaf") <= col("p95_qd_leaf"), 1L).otherwise(0L)).as("_tr95"))
        est.join(sizes, "l_returnflag").join(exact, "l_returnflag")
          .join(tr, "l_returnflag")
          .select(
            col("l_returnflag"), col("n"), col("n_nodes"),
            col("p50_qd_leaf"), col("p50_qd"),
            col("p95_qd_leaf"), col("p95_qd"),
            stableRound(col("p50_exact"), 6).as("p50_exact"),
            stableRound(col("p95_exact"), 6).as("p95_exact"),
            stableRound(
              abs(col("_tr50") - ceil(lit(0.5) * col("n"))) / col("n"), 6)
              .as("p50_rank_err"),
            stableRound(
              abs(col("_tr95") - ceil(lit(0.95) * col("n"))) / col("n"), 6)
              .as("p95_rank_err"))
      },
      Some(qdigestSql)),

    // Q81 — KLL mergeable quantile sketch over UNBOUNDED reals: closes
    // q74's finite-universe contract (q-digest needs a declared [lo, hi) +
    // 2^bits cells; KLL's compactor state carries ORIGINAL values, so
    // heavy-tailed 100 TB telemetry needs no range declaration). Build:
    // one narrow corpus exchange into 4 md5 buckets, per-bucket compaction
    // stacks, one fold sweep — every compaction coin is md5-derived, so
    // the oracle replays each round bit-for-bit and the full state
    // (level, value, weight) is hash-checked. Weight conservation means
    // sum(weight) == exact row count by construction.
    Entry(
      "q81_kll_build",
      (s, d) =>
        Kll.registers(
            Tables.load(s, d, "events"), Seq("event_type"), "value",
            "event_id", buckets = 4, k = 32, rounds = 10, salt = "q81")
          .select(
            col("event_type"), col("_level").as("level"),
            col("_value").as("value"),
            expr("shiftleft(CAST(1 AS BIGINT), _level)").as("weight")),
      Some(kllBuildSql)),

    // Q81b — the KLL MERGE lifecycle: two independent half-builds
    // (event_id parity), a union+sweep merge, then decile estimates from
    // the merged sketch — the day-over-day fold shape. Total weight stays
    // the exact row count through build AND merge; estimates are original
    // data values (the sketch never averages). All hash-checked via the
    // generated replay oracle.
    Entry(
      "q81_kll_merge",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val keys = Seq("event_type")
        val sa = Kll.registers(ev.where(col("event_id") % 2 === 0), keys,
          "value", "event_id", buckets = 4, k = 32, rounds = 10, salt = "q81m")
        val sb = Kll.registers(ev.where(col("event_id") % 2 === 1), keys,
          "value", "event_id", buckets = 4, k = 32, rounds = 10, salt = "q81m")
        Kll.estimate(
          Kll.merge(sa, sb, keys, k = 32, sweepRounds = 16, salt = "q81m"),
          keys,
          Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
            "p90" -> 0.9))
      },
      Some(kllMergeSql)),

    // Q81c — the rank-error audit vs q23-exact semantics: estimate all
    // nine deciles from the sketch, then measure each reported value's
    // TRUE rank with one exact corpus aggregate next to the sketch's own
    // weight-rank. rank_err_frac puts the ≲ 4n/k worst-case (and the much
    // smaller md5-coin typical case) into the hash-checked contract the
    // way q74 pins its bits·Σ⌊nᵢ/k⌋ slack.
    Entry(
      "q81_kll_error",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val keys = Seq("event_type")
        val regs = Kll.registers(ev, keys, "value", "event_id",
          buckets = 4, k = 32, rounds = 10, salt = "q81")
          .localCheckpoint(true) // sketch-sized; feeds estimate + rank join
        val est = Kll.estimate(regs, keys,
          (1 to 9).map(i => s"d$i" -> i / 10.0))
        val long = est.select(
            col("event_type"), col("n"),
            explode(array((1 to 9).map(i =>
              struct(lit(i).as("q_ix"), col(s"d$i").as("est_value"))): _*))
              .as("_e"))
          .select(col("event_type"), col("n"), col("_e.q_ix").as("q_ix"),
            col("_e.est_value").as("est_value"))
        val withEst = Kll.estRank(regs, long, keys, "est_value")
        val exact = ev.select(col("event_type"), col("value"))
          .join(broadcast(long.select("event_type", "q_ix", "est_value")),
            Seq("event_type"))
          .groupBy("event_type", "q_ix")
          .agg(sum(when(col("value") <= col("est_value"), 1L).otherwise(0L))
            .as("exact_rank"))
        withEst.join(exact, Seq("event_type", "q_ix"))
          .select(
            col("event_type"), col("q_ix"), col("n"), col("est_value"),
            col("est_rank"), col("exact_rank"),
            abs(col("est_rank") - col("exact_rank")).as("rank_abs_err"),
            stableRound(
              abs(col("est_rank") - col("exact_rank")) / col("n"), 6)
              .as("rank_err_frac"))
      },
      Some(kllErrorSql)),

    // T47 — unigram-LM (SentencePiece-style) tokenizer induction: the
    // probabilistic sibling of BPE t35-t37 (Kudo 2018), hard-EM over the
    // SAME one-corpus-pass word-frequency frame. Every Viterbi score is an
    // integer micro-logp (round(ln p · 1e6) — the 6 dp stage boundary as
    // BIGINT), so segmentation argmaxes are exact integer comparisons and
    // the whole trajectory — seed, 3 E/M rounds, every count and
    // renormalization — replays through a generated recursive-CTE oracle
    // (forward DP carries a 4-score sliding window; backward path takes
    // the longest qualifying piece).
    Entry(
      "t47_unigram_learn",
      (s, d) => TextAnalysis.unigramLmLearn(docs(s, d), "text",
        seedMulti = 40, emRounds = 3),
      Some(unigramLearnSql(40, 3))),

    // T47b — the fixed-vocab ENCODE twin: segment every document with the
    // learned vocabulary (Viterbi once per DISTINCT word, the t37 trick);
    // per-doc piece counts and the exact BIGINT best-path score.
    Entry(
      "t47_unigram_encode",
      (s, d) => TextAnalysis.unigramLmEncode(docs(s, d), "doc_id", "text",
        seedMulti = 40, emRounds = 3),
      Some(unigramEncodeSql(40, 3))),

    // S30 — graded-relevance ranking metrics (nDCG@10, MRR@10, AP@10): the
    // retrieval-quality evaluation s12's binary recall@k cannot be (recall
    // sees neither ORDER nor GRADE — a retriever that ranks its one good
    // hit last scores the same recall). Retriever = brute-force cosine
    // top-10 per sampled query; relevance = label-derived grades (same
    // label rel 2, ring-adjacent label rel 1 — deterministic, and graded,
    // so the 2^rel gain matters). Everything after the probe is
    // (queries × k)-sized; the ideal ranking comes CLOSED-FORM from
    // per-grade counts — the corpus is never sorted for IDCG.
    Entry(
      "s30_ranking_metrics",
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") % 50 === 0)
        val retrieved = Similarity.bruteForceBatch(
          e, "vec_id", "embedding", q, "vec_id", "embedding",
          k = 10, excludeSelf = true)
        val rel = e.select(col("vec_id"), col("label"))
          .crossJoin(broadcast(
            q.select(col("vec_id").as("q_id"), col("label").as("_ql"))))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("_rel",
            when(col("label") === col("_ql"), 2L)
              .when(pmod(col("label") - col("_ql"), lit(10)).isin(1, 9), 1L))
          .where(col("_rel").isNotNull)
          .select(col("q_id"), col("vec_id"), col("_rel").as("rel"))
        Similarity.rankingMetrics(
          retrieved, rel, "q_id", "vec_id", "rank", "rel", k = 10)
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, label AS ql, v AS qv FROM e WHERE vec_id % 50 = 0),
                   rk AS (SELECT q.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
                          FROM e, q
                          WHERE e.vec_id <> q.q_id
                            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
                   ret AS (SELECT q_id, vec_id, rk FROM rk WHERE rk <= 10),
                   rel AS (SELECT q_id, vec_id, rel FROM (
                             SELECT q.q_id AS q_id, e.vec_id AS vec_id,
                                    CASE WHEN e.label = q.ql THEN 2
                                         WHEN ((e.label - q.ql) % 10 + 10) % 10 IN (1, 9) THEN 1
                                    END AS rel
                             FROM e, q WHERE e.vec_id <> q.q_id)
                           WHERE rel IS NOT NULL),
                   j AS (SELECT r.q_id, r.rk, COALESCE(rel.rel, 0) AS rel
                         FROM ret r LEFT JOIN rel
                           ON rel.q_id = r.q_id AND rel.vec_id = r.vec_id),
                   ann AS (SELECT q_id, rk, rel,
                                  SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                                    OVER (PARTITION BY q_id ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cumrel
                           FROM j),
                   pq AS (SELECT q_id,
                                 SUM((pow(2, rel) - 1) / log2(rk + 1)) AS dcg,
                                 MIN(CASE WHEN rel > 0 THEN rk END) AS fr,
                                 SUM(CASE WHEN rel > 0 THEN CAST(cumrel AS DOUBLE) / rk ELSE 0 END) AS apnum
                          FROM ann GROUP BY q_id),
                   rs AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY q_id),
                   gc AS (SELECT q_id, rel AS g, COUNT(*) AS c FROM rel GROUP BY 1, 2),
                   gi AS (SELECT q_id, g, c,
                                 COALESCE(SUM(c) OVER (PARTITION BY q_id ORDER BY g DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
                          FROM gc),
                   ip AS (SELECT q_id, g,
                                 unnest(range(CAST(bf + 1 AS BIGINT),
                                              CAST(bf + GREATEST(0, LEAST(c, 10 - bf)) + 1 AS BIGINT))) AS pos
                          FROM gi WHERE LEAST(c, 10 - bf) > 0),
                   ideal AS (SELECT q_id, SUM((pow(2, g) - 1) / log2(pos + 1)) AS idcg
                             FROM ip GROUP BY q_id)
              SELECT pq.q_id AS q_id, COALESCE(rs.n_rel, 0) AS n_rel,
                     ROUND(dcg / idcg + 1e-9, 6) AS ndcg_at_10,
                     ROUND(COALESCE(1.0 / fr, 0) + 1e-9, 6) AS mrr_at_10,
                     CASE WHEN rs.n_rel IS NOT NULL
                          THEN ROUND(apnum / CAST(LEAST(rs.n_rel, 10) AS DOUBLE) + 1e-9, 6)
                     END AS ap_at_10
              FROM pq LEFT JOIN rs USING (q_id) LEFT JOIN ideal USING (q_id)""")),

    // Q82 — lakehouse small-file compaction, identity-checked THROUGH the
    // oracle: fragment orders into 48 z-ordered small files, bin-pack them
    // back to ~target-size files preserving the z-sort contract
    // (Layout.compactFiles), then fingerprint the COMPACTED copy — exact
    // row count, bit_xor of per-row hash56, exact key/cents sums. The
    // oracle computes the same fingerprint over the ORIGINAL table, so a
    // compaction that drops, duplicates, or mutates a single row breaks
    // the hash; the file-count/layout assertions ride as pinned booleans
    // (oracle says TRUE; Spark must deliver TRUE). This is the at-rest
    // maintenance half of the 100 TB story next to Sinks.writeZOrdered.
    Entry(
      "q82_compaction_identity",
      (s, d) => {
        val src = Tables.load(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q82").toString
        // the tmp tree holds TWO full table copies — it must not outlive
        // this call (round-13 advice: Bench's warm+timed reps and the 10x
        // soak leaked one pair of copies per execution). The result is one
        // aggregate row, so it is computed EAGERLY (still inside Bench's
        // timed region — timing wraps the closure call) and returned as a
        // local frame; the finally tears the tree down even on failure.
        try {
          val fragDir = s"$tmp/frag"
          val outDir = s"$tmp/compact"
          Layout.zOrderWrite(src, Seq("o_custkey", "o_orderkey"), fragDir,
            bits = 8, numFiles = 48)
          val stats = Layout.compactFiles(
            s, fragDir, outDir, targetFileBytes = 4L << 20,
            sortCol = Some("z_value"))
          val rowHash = Dedup.hash56(concat_ws("|",
            col("o_orderkey").cast("string"),
            col("o_custkey").cast("string"),
            col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").cast("string"),
            col("o_orderdate").cast("date").cast("string"),
            col("o_orderpriority")))
          val res = s.read.parquet(outDir)
            .withColumn("_h", rowHash)
            .agg(
              count(lit(1)).as("n_rows"),
              expr("bit_xor(_h)").as("content_xor"),
              sum(col("o_orderkey")).as("orderkey_sum"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"))
            .withColumn("fewer_files",
              lit(stats.nFilesOut < stats.nFilesIn))
            .withColumn("file_count_at_target",
              lit(stats.nFilesOut <= stats.targetFiles && stats.nFilesOut >= 1L))
            .select(col("n_rows"), col("content_xor"), col("orderkey_sum"),
              col("cents_sum"), col("fewer_files"), col("file_count_at_target"))
          s.createDataFrame(
            java.util.Arrays.asList(res.collect(): _*), res.schema)
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""SELECT COUNT(*) AS n_rows,
                     bit_xor(('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
                       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||
                       o_orderpriority), 1, 14))::UBIGINT::BIGINT) AS content_xor,
                     CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
                     TRUE AS fewer_files,
                     TRUE AS file_count_at_target
              FROM orders""")),

    // Q83 — l-diversity audit, the governance pair of q44's k-anonymity
    // (k hides group SIZE; l guards against a class whose members all
    // share one sensitive value). Quasi-identifier = (order status, order
    // year); sensitive = order priority; null sensitive values form their
    // own category (the declared q44/q45 null contract) instead of
    // vanishing the way COUNT(DISTINCT) would drop them.
    Entry(
      "q83_ldiversity",
      (s, d) => Profiling.lDiversity(
        Tables.load(s, d, "orders")
          .withColumn("o_year", year(col("o_orderdate"))),
        Seq("o_orderstatus", "o_year"), "o_orderpriority", l = 5L),
      Some("""WITH g AS (SELECT o_orderstatus, year(o_orderdate) AS o_year,
                                o_orderpriority, COUNT(*) AS c
                         FROM orders GROUP BY 1, 2, 3),
                   cl AS (SELECT o_orderstatus, o_year, COUNT(*) AS d,
                                 CAST(SUM(c) AS BIGINT) AS rws
                          FROM g GROUP BY 1, 2)
              SELECT CAST(5 AS BIGINT) AS l,
                     CAST(SUM(rws) AS BIGINT) AS n_rows,
                     COUNT(*) AS n_groups,
                     CAST(SUM(CASE WHEN d < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
                     CAST(SUM(CASE WHEN d < 5 THEN rws ELSE 0 END) AS BIGINT) AS n_risky_rows,
                     MIN(d) AS min_diversity
              FROM cl""")),

    // C11 — tokenizer-aware sequence packing: t14 packs by t03's
    // whitespace count, an approximation this composition retires — the
    // REAL training-data step budgets sequences in learned-tokenizer
    // pieces. The t47 unigram vocabulary is fit, every doc is
    // Viterbi-counted (once per distinct word), and the distributed
    // prefix-sum packer deals docs into 512-PIECE sequences; the output is
    // the per-sequence fill audit (a doc straddling a boundary is budgeted
    // to its first token's sequence, so fill can exceed 1 — the declared
    // t14 contract). Oracle = the full generated unigram chain + the same
    // window prefix sum.
    Entry(
      "c11_token_packing",
      (s, d) => {
        val enc = TextAnalysis.unigramLmEncode(
          docs(s, d), "doc_id", "text", seedMulti = 40, emRounds = 3)
        Packing.packSequences(
            enc.select(col("doc_id"), col("n_pieces")),
            "doc_id", "n_pieces", maxTokens = 512)
          .groupBy("seq_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_pieces")).as("seq_tokens"))
          .withColumn("fill_ratio",
            stableRound(col("seq_tokens").cast("double") / 512.0, 6))
      },
      Some(tokenPackingSql(40, 3))),

    // Q84 — EXACT stratified train/test split: per class, exactly
    // ceil(0.8·n_class) train rows under the deterministic (md5(id), id)
    // within-class permutation — the guarantee t22's hash buckets give
    // only in expectation. Per-class rank rides ONE distributed prefix-sum
    // pass + a broadcast class-offset join, never a per-class row_number
    // window (the biggest class would serialize one task at 100 TB). The
    // output pins the exact per-(class, split) counts against the closed
    // form.
    Entry(
      "q84_stratified_split",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        Packing.stratifiedSplit(ev, "event_type", "event_id", 0.8)
          .groupBy("event_type", "split")
          .agg(count(lit(1)).as("n"))
          .join(
            broadcast(Tables.load(s, d, "events")
              .groupBy("event_type").agg(count(lit(1)).as("_tot"))),
            Seq("event_type"))
          .withColumn("expected",
            when(col("split") === "train",
              ceil(lit(0.8) * col("_tot")).cast("long"))
              .otherwise(col("_tot") - ceil(lit(0.8) * col("_tot")).cast("long")))
          .select("event_type", "split", "n", "expected")
      },
      Some("""WITH r AS (SELECT event_type,
                                row_number() OVER (PARTITION BY event_type
                                                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk,
                                COUNT(*) OVER (PARTITION BY event_type) AS n
                         FROM events),
                   sp AS (SELECT event_type, n,
                                 CASE WHEN rk <= CAST(CEIL(CAST('0.8' AS DOUBLE) * n) AS BIGINT)
                                      THEN 'train' ELSE 'test' END AS split
                          FROM r)
              SELECT event_type, split, COUNT(*) AS n,
                     CASE WHEN split = 'train'
                          THEN CAST(CEIL(CAST('0.8' AS DOUBLE) * MAX(n)) AS BIGINT)
                          ELSE MAX(n) - CAST(CEIL(CAST('0.8' AS DOUBLE) * MAX(n)) AS BIGINT)
                     END AS expected
              FROM sp GROUP BY event_type, split""")),

    // Q85 — CMS inner-product join-cardinality estimation (AGMS): the
    // plan-time shuffle-sizing readout — estimate |lineitem ⋈ orders| from
    // two KB-sized CMS register frames without touching either corpus,
    // the number that decides broadcast vs shuffle vs skew-salt before
    // any exchange is scheduled. Each hash row's Σ cntA·cntB never
    // UNDER-estimates (collisions only add); min across rows is the
    // estimate, expected excess ≤ |A|·|B|/width per row. width=4096 is
    // deliberately tight against 15k order keys so the overestimate is
    // LIVE (the q62/q76 forced-collision discipline) — over_ratio is a
    // real column, and never_underestimates is the pinned guarantee. All
    // integer registers: build, inner product, and the exact audit all
    // hash-replay.
    Entry(
      "q85_join_cardinality",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(col("o_orderkey"))
        val li = Tables.load(s, d, "lineitem").select(col("l_orderkey"))
        val sa = Cms.registers(ord, Nil, "o_orderkey", depth = 4, width = 4096)
        val sb = Cms.registers(li, Nil, "l_orderkey", depth = 4, width = 4096)
        val est = Cms.innerProduct(sa, sb, Nil)
        val exact = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("exact_join_size"))
        est.crossJoin(exact)
          .select(
            col("join_size_est"), col("exact_join_size"),
            stableRound(
              col("join_size_est").cast("double") / col("exact_join_size"), 6)
              .as("over_ratio"),
            (col("join_size_est") >= col("exact_join_size"))
              .as("never_underestimates"))
      },
      Some("""WITH ra AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c
                          FROM (SELECT rr.r AS r,
                                       ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4096 AS b
                                FROM orders, (SELECT unnest(range(0, 4)) AS r) rr
                                WHERE o_orderkey IS NOT NULL)
                          GROUP BY 1, 2),
                   rb AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c
                          FROM (SELECT rr.r AS r,
                                       ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4096 AS b
                                FROM lineitem, (SELECT unnest(range(0, 4)) AS r) rr
                                WHERE l_orderkey IS NOT NULL)
                          GROUP BY 1, 2),
                   ip AS (SELECT ra.r AS r, SUM(CAST(ra.c AS HUGEINT) * rb.c) AS p
                          FROM ra JOIN rb ON ra.r = rb.r AND ra.b = rb.b
                          GROUP BY 1),
                   sp AS (SELECT r FROM (SELECT DISTINCT r FROM ra)
                          JOIN (SELECT DISTINCT r FROM rb) USING (r)),
                   est AS (SELECT CAST(MIN(COALESCE(p, 0)) AS BIGINT) AS join_size_est
                           FROM sp LEFT JOIN ip USING (r)),
                   ex AS (SELECT COUNT(*) AS exact_join_size
                          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
              SELECT est.join_size_est, ex.exact_join_size,
                     ROUND(CAST(est.join_size_est AS DOUBLE) / ex.exact_join_size + 1e-9, 6) AS over_ratio,
                     est.join_size_est >= ex.exact_join_size AS never_underestimates
              FROM est, ex""")),

    // T48 — TF-IDF keyword extraction: top-3 characteristic terms per doc,
    // the document-side readout next to t09's BM25 (BM25 ranks documents
    // for a query; this ranks terms for a document). sklearn smooth-idf,
    // scores 6dp-rounded BEFORE ranking so tie-breaks replay (term asc);
    // top-k rides the two-pass TopK prune, never a doc-partitioned window
    // over raw tokens.
    Entry(
      "t48_tfidf_keywords",
      (s, d) => TextAnalysis.tfidfKeywords(docs(s, d), "doc_id", "text", 3),
      Some("""WITH toks AS (SELECT doc_id, w FROM (
                              SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                              FROM documents WHERE text IS NOT NULL)
                            WHERE length(w) > 0),
                   tf AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
                   dfq AS (SELECT w, COUNT(*) AS dfc FROM tf GROUP BY w),
                   n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tf),
                   sc AS (SELECT tf.doc_id, tf.w,
                                 ROUND(tf.c * (ln(CAST(n.nd + 1 AS DOUBLE) / CAST(dfc + 1 AS DOUBLE)) + 1) + 1e-9, 6) AS score
                          FROM tf JOIN dfq USING (w), n),
                   rk AS (SELECT doc_id, w, score,
                                 row_number() OVER (PARTITION BY doc_id
                                                    ORDER BY score DESC, w) AS rnk
                          FROM sc)
              SELECT doc_id, CAST(rnk AS BIGINT) AS rank, w AS term, score
              FROM rk WHERE rnk <= 3""")),

    // C12 — fusion evaluation: the composition the round-12 verdict said
    // s30 exists FOR — price c07's reciprocal-rank fusion honestly. Three
    // rankings per query (exact cosine top-10; a deliberately starved
    // nProbe=1 IVF probe; their per-query RRF fusion) all scored with the
    // same graded judgments — one table answering "is fusion better than
    // its parts, per query, in nDCG/MRR/AP?". RRF scores are 6dp-rounded
    // BEFORE re-ranking (round-then-rank); everything after the two probes
    // is (queries × k)-sized. On THIS corpus the table inverts intuition —
    // ivf1 ndcg 0.57 > exact 0.19, rrf 0.38 between — and that is the
    // honest answer, not a bug: the embeddings are near-isotropic (s21's
    // documented finding), so exact cosine barely correlates with the
    // label-derived judgments, while the nProbe=1 cell restriction (cells
    // = labels) acts as a hard label filter. Exactly the retriever-vs-
    // judgment mismatch this evaluation exists to expose.
    Entry(
      "c12_fusion_eval",
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") % 50 === 0)
        val exact = Similarity.bruteForceBatch(
            e, "vec_id", "embedding", q, "vec_id", "embedding",
            k = 10, excludeSelf = true)
          .select(col("q_id"), col("vec_id"), col("rank"))
        val approx = Similarity.probeIvf(
            Similarity.buildIvfIndex(e, "vec_id", "embedding", col("label")),
            q, "vec_id", "embedding", k = 10, nProbe = 1, excludeSelf = true,
            guardBroadcast = false)
          .select(col("q_id"), col("vec_id"), col("rank"))
        val fused = TopK.perGroup(
            exact.unionByName(approx)
              .select(col("q_id"), col("vec_id"),
                col("rank").cast("double").as("_rk"))
              .groupBy("q_id", "vec_id")
              .agg(stableRound(
                sum(lit(1.0) / (lit(60.0) + col("_rk"))), 6).as("_rrf")),
            Seq("q_id"), Seq(col("_rrf").desc, col("vec_id").asc), 10)
          .select(col("q_id"), col("vec_id"), col("rank"))
        val rel = e.select(col("vec_id"), col("label"))
          .crossJoin(broadcast(
            q.select(col("vec_id").as("q_id"), col("label").as("_ql"))))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("_rel",
            when(col("label") === col("_ql"), 2L)
              .when(pmod(col("label") - col("_ql"), lit(10)).isin(1, 9), 1L))
          .where(col("_rel").isNotNull)
          .select(col("q_id"), col("vec_id"), col("_rel").as("rel"))
          .localCheckpoint(true) // judgments feed three metric passes
        def scored(r: org.apache.spark.sql.DataFrame, src: String) =
          Similarity.rankingMetrics(
              r, rel, "q_id", "vec_id", "rank", "rel", k = 10)
            .withColumn("source", lit(src))
        scored(exact, "exact")
          .unionByName(scored(approx, "ivf1"))
          .unionByName(scored(fused, "rrf"))
          .select("source", "q_id", "n_rel", "ndcg_at_10", "mrr_at_10",
            "ap_at_10")
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   q AS (SELECT vec_id AS q_id, label AS ql, v AS qv FROM e WHERE vec_id % 50 = 0),
                   xr AS (SELECT q.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
                          FROM e, q
                          WHERE e.vec_id <> q.q_id
                            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
                   exact10 AS (SELECT q_id, vec_id, rk FROM xr WHERE rk <= 10),
                   px AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
                   cent AS (SELECT label, list(av ORDER BY pos) AS cv
                            FROM (SELECT label, pos, AVG(val) AS av FROM px GROUP BY label, pos)
                            GROUP BY label),
                   cr AS (SELECT q.q_id, cent.label,
                                 row_number() OVER (PARTITION BY q.q_id
                                                    ORDER BY list_cosine_similarity(cv, qv) DESC, cent.label) AS crk
                          FROM cent, q),
                   probed AS (SELECT q_id, label FROM cr WHERE crk <= 1),
                   ar AS (SELECT p.q_id, e.vec_id,
                                 row_number() OVER (PARTITION BY p.q_id
                                                    ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rk
                          FROM e JOIN probed p ON e.label = p.label
                                 JOIN q ON q.q_id = p.q_id
                          WHERE e.vec_id <> p.q_id
                            AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
                   approx10 AS (SELECT q_id, vec_id, rk FROM ar WHERE rk <= 10),
                   u AS (SELECT q_id, vec_id, CAST(rk AS DOUBLE) AS rk FROM exact10
                         UNION ALL SELECT q_id, vec_id, CAST(rk AS DOUBLE) AS rk FROM approx10),
                   fs AS (SELECT q_id, vec_id, ROUND(SUM(1.0 / (60.0 + rk)) + 1e-9, 6) AS rrf
                          FROM u GROUP BY 1, 2),
                   fr AS (SELECT q_id, vec_id,
                                 row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, vec_id) AS rk
                          FROM fs),
                   fused10 AS (SELECT q_id, vec_id, rk FROM fr WHERE rk <= 10),
                   ret AS (SELECT 'exact' AS src, q_id, vec_id, rk FROM exact10
                           UNION ALL SELECT 'ivf1' AS src, q_id, vec_id, rk FROM approx10
                           UNION ALL SELECT 'rrf' AS src, q_id, vec_id, rk FROM fused10),
                   rel AS (SELECT q_id, vec_id, rel FROM (
                             SELECT q.q_id AS q_id, e.vec_id AS vec_id,
                                    CASE WHEN e.label = q.ql THEN 2
                                         WHEN ((e.label - q.ql) % 10 + 10) % 10 IN (1, 9) THEN 1
                                    END AS rel
                             FROM e, q WHERE e.vec_id <> q.q_id)
                           WHERE rel IS NOT NULL),
                   j AS (SELECT r.src, r.q_id, r.rk, COALESCE(rel.rel, 0) AS rel
                         FROM ret r LEFT JOIN rel
                           ON rel.q_id = r.q_id AND rel.vec_id = r.vec_id),
                   ann AS (SELECT src, q_id, rk, rel,
                                  SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                                    OVER (PARTITION BY src, q_id ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cumrel
                           FROM j),
                   pq AS (SELECT src, q_id,
                                 SUM((pow(2, rel) - 1) / log2(rk + 1)) AS dcg,
                                 MIN(CASE WHEN rel > 0 THEN rk END) AS fr2,
                                 SUM(CASE WHEN rel > 0 THEN CAST(cumrel AS DOUBLE) / rk ELSE 0 END) AS apnum
                          FROM ann GROUP BY src, q_id),
                   rs AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY q_id),
                   gc AS (SELECT q_id, rel AS g, COUNT(*) AS c FROM rel GROUP BY 1, 2),
                   gi AS (SELECT q_id, g, c,
                                 COALESCE(SUM(c) OVER (PARTITION BY q_id ORDER BY g DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
                          FROM gc),
                   ip AS (SELECT q_id, g,
                                 unnest(range(CAST(bf + 1 AS BIGINT),
                                              CAST(bf + GREATEST(0, LEAST(c, 10 - bf)) + 1 AS BIGINT))) AS pos
                          FROM gi WHERE LEAST(c, 10 - bf) > 0),
                   ideal AS (SELECT q_id, SUM((pow(2, g) - 1) / log2(pos + 1)) AS idcg
                             FROM ip GROUP BY q_id)
              SELECT pq.src AS source, pq.q_id AS q_id, COALESCE(rs.n_rel, 0) AS n_rel,
                     ROUND(dcg / idcg + 1e-9, 6) AS ndcg_at_10,
                     ROUND(COALESCE(1.0 / fr2, 0) + 1e-9, 6) AS mrr_at_10,
                     CASE WHEN rs.n_rel IS NOT NULL
                          THEN ROUND(apnum / CAST(LEAST(rs.n_rel, 10) AS DOUBLE) + 1e-9, 6)
                     END AS ap_at_10
              FROM pq LEFT JOIN rs USING (q_id) LEFT JOIN ideal USING (q_id)""")),

    // Q86 — range-predicate SELECTIVITY estimation from the KLL sketch:
    // q81's second consumer and q85's column-range sibling — q85 sizes an
    // equi-join from CMS registers, this sizes `lo <= v < hi` filters from
    // the quantile sketch (the statistic a 100 TB planner reads instead of
    // scanning): est = rank(hi⁻) − rank(lo⁻) probed against the register
    // frame, vs one exact conditional aggregate, per event_type × three
    // band widths. Edge semantics pinned by probing at `edge − 1e-9` on
    // BOTH sides (values are 2 dp — the nudge cannot cross a representable
    // data value); err_frac reports the live rank slack.
    // T50 — Heaps-law vocabulary growth: cumulative distinct types vs
    // cumulative tokens in ingestion order — the capacity-planning curve
    // behind every vocabulary-sized structure here (BPE/unigram vocab,
    // BM25 postings, embedding tables): the curve's tail extrapolates
    // V(T) ≈ K·T^β without scanning 100 TB. New-type detection is the t49
    // first-occurrence argmin; both cumulative columns ride ONE
    // distributed prefix-sum pass.
    Entry(
      "t50_heaps_growth",
      (s, d) => TextAnalysis.heapsGrowth(docs(s, d), "doc_id", "text"),
      Some("""WITH tk AS (SELECT doc_id, w FROM (
                           SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                           FROM documents WHERE text IS NOT NULL)
                         WHERE length(w) > 0),
                   fo AS (SELECT w, MIN(doc_id) AS fd FROM tk GROUP BY w),
                   pd AS (SELECT tk.doc_id AS doc_id,
                                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                                 CAST(COUNT(DISTINCT CASE WHEN fo.fd = tk.doc_id THEN tk.w END) AS BIGINT) AS n_new_types
                          FROM tk JOIN fo USING (w) GROUP BY tk.doc_id),
                   b AS (SELECT d.doc_id AS doc_id,
                                COALESCE(pd.n_tokens, 0) AS n_tokens,
                                COALESCE(pd.n_new_types, 0) AS n_new_types
                         FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)
              SELECT doc_id, n_tokens, n_new_types,
                     CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
                     CAST(SUM(n_new_types) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types,
                     ROUND(CAST(SUM(n_new_types) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                           / CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) + 1e-9, 6) AS ttr
              FROM b""")),

    // T49 — n-gram novelty profile: per doc, the fraction of its distinct
    // 5-grams FIRST seen (by doc_id = ingestion order) in that doc — the
    // curation readout between t18's binary decontamination and d08's
    // destructive chunk dedup: a late low-novelty doc is recombined
    // boilerplate dedup missed (every gram seen before, never all
    // together). First-occurrence is an argmin aggregate, never a sort.
    Entry(
      "t49_ngram_novelty",
      (s, d) => TextAnalysis.ngramNovelty(docs(s, d), "doc_id", "text", 5),
      Some("""WITH nrm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                           FROM documents WHERE text IS NOT NULL),
                   tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM nrm),
                   g AS (SELECT doc_id,
                                list_distinct([array_to_string(toks[i:i+4], ' ')
                                               for i in range(1, greatest(len(toks) - 5, 0) + 2)]) AS grams
                         FROM tk),
                   gd AS (SELECT doc_id, unnest(grams) AS gram FROM g),
                   fo AS (SELECT gram, MIN(doc_id) AS fd FROM gd GROUP BY gram),
                   pd AS (SELECT gd.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                                 CAST(SUM(CASE WHEN fo.fd = gd.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
                          FROM gd JOIN fo USING (gram) GROUP BY gd.doc_id)
              SELECT d.doc_id, COALESCE(pd.n_grams, 0) AS n_grams,
                     COALESCE(pd.n_novel, 0) AS n_novel,
                     ROUND(CAST(pd.n_novel AS DOUBLE) / pd.n_grams + 1e-9, 6) AS novelty
              FROM documents d LEFT JOIN pd USING (doc_id)""")),

    Entry(
      "q86_range_selectivity",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val keys = Seq("event_type")
        val regs = Kll.registers(ev, keys, "value", "event_id",
            buckets = 4, k = 32, rounds = 10, salt = "q86")
          .localCheckpoint(true) // sketch-sized; probed twice + sized once
        val sparkS = s
        import sparkS.implicits._
        val bands = Seq(
          ("narrow", 100.0, 150.0), ("mid", 50.0, 300.0),
          ("wide", 0.0, 400.0)).toDF("band", "lo", "hi")
        val probes = ev.select(col("event_type")).distinct()
          .crossJoin(broadcast(bands))
        val withLo = Kll.estRank(regs,
            probes.withColumn("_p", col("lo") - lit(1e-9)), keys, "_p")
          .withColumnRenamed("est_rank", "_r_lo").drop("_p")
        val withHi = Kll.estRank(regs,
            probes.withColumn("_p", col("hi") - lit(1e-9)), keys, "_p")
          .withColumnRenamed("est_rank", "_r_hi").drop("_p")
        val est = withLo.join(withHi, Seq("event_type", "band", "lo", "hi"))
          .withColumn("est_count", col("_r_hi") - col("_r_lo"))
        val exact = ev.select(col("event_type"), col("value"))
          .crossJoin(broadcast(bands))
          .groupBy("event_type", "band")
          .agg(sum(when(
            col("value") >= col("lo") && col("value") < col("hi"), 1L)
            .otherwise(0L)).as("exact_count"))
        val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        est.join(exact, Seq("event_type", "band"))
          .join(broadcast(n), Seq("event_type"))
          .select(
            col("event_type"), col("band"), col("n"),
            col("est_count"), col("exact_count"),
            stableRound(
              abs(col("est_count") - col("exact_count")) / col("n"), 6)
              .as("err_frac"))
      },
      Some(kllSelectivitySql)),

    // Q87 — SCD Type-2 dimension historization from CDC
    // (Compaction.scd2): the history-keeping upgrade of q12's latest-wins
    // snapshot — per key the CDC log becomes half-open validity intervals
    // (effective_from, effective_to, is_current). Lineitem plays the CDC
    // log of a per-order shipment dimension: key = order, version ts =
    // ship date, CDC offset = line number (same-date ties collapse to the
    // LAST writer — the pinned tie-break), and returned lines are delete
    // tombstones (they close the prior interval at their date but open
    // none; a key whose last version is a delete keeps no current row).
    // Plan: one map-side-combined argmax per (key, date) + a lead() window
    // over the collapsed version log, partitioned by key — versions per
    // key, never fact rows, in any one partition.
    Entry(
      "q87_scd2",
      (s, d) => {
        val cdc = Tables.load(s, d, "lineitem").select(
          col("l_orderkey"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"),
          when(col("l_returnflag") === "R", lit("D")).otherwise(lit("U"))
            .as("op"))
        Compaction.scd2(cdc, Seq("l_orderkey"), "ship_date",
          Seq("l_quantity", "l_extendedprice"),
          seqCol = Some("l_linenumber"), opCol = Some("op"))
          // ISO strings for the compare only: pandas folds DuckDB DATE
          // into Timestamp, a dtype-only mismatch against Spark's date
          .select(
            col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
            col("effective_from").cast("string").as("effective_from"),
            col("effective_to").cast("string").as("effective_to"),
            col("is_current"))
      },
      Some("""WITH cdc AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS ship_date,
                                  l_linenumber, l_quantity, l_extendedprice,
                                  CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op
                           FROM lineitem),
                   w AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey, ship_date
                                     ORDER BY l_linenumber DESC, l_quantity DESC,
                                              l_extendedprice DESC, op DESC) AS rn
                         FROM cdc),
                   v AS (SELECT l_orderkey, ship_date, l_quantity, l_extendedprice, op
                         FROM w WHERE rn = 1),
                   iv AS (SELECT *, lead(ship_date) OVER (PARTITION BY l_orderkey
                                      ORDER BY ship_date) AS effective_to
                          FROM v)
              SELECT l_orderkey, l_quantity, l_extendedprice,
                     CAST(ship_date AS VARCHAR) AS effective_from,
                     CAST(effective_to AS VARCHAR) AS effective_to,
                     effective_to IS NULL AS is_current
              FROM iv WHERE op <> 'D'""")),

    // Q87b — the composition pin: as-of-joining the SCD2 interval table
    // (probe: effective_from <= t < effective_to, open-ended current rows)
    // reproduces AsOfJoin.asOf row-for-row — the SAME oracle as q22/q24.
    // This works because scd2's same-timestamp tie-break (greatest payload
    // struct, no seq column) IS the as-of carry's tie-break, and the
    // intervals tile each key's timeline disjointly, so the equi-join on
    // key + range filter matches each event to at most one interval. The
    // interval probe is the warehouse-native form of the lookup: build the
    // history once, answer any number of point-in-time probes with a plain
    // join — no re-sort of the fact side per query.
    Entry(
      "q87b_scd2_asof",
      (s, d) => {
        val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
        val ord = Tables.load(s, d, "orders").select(
          col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_t"),
          col("o_orderkey"), col("o_totalprice"))
        val hist = Compaction.scd2(ord, Seq("o_custkey"), "o_t",
          Seq("o_orderkey", "o_totalprice"))
        ev.join(hist,
            ev("user_id") === hist("o_custkey") &&
              ev("ts") >= hist("effective_from") &&
              (hist("effective_to").isNull ||
                ev("ts") < hist("effective_to")),
            "left")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("o_orderkey"), col("o_totalprice"))
      },
      Some("""WITH r AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, 0 AS tag,
                                {'o_orderkey': o_orderkey, 'o_totalprice': o_totalprice} AS p,
                                CAST(NULL AS BIGINT) AS event_id
                         FROM orders),
                   l AS (SELECT user_id AS k, epoch_us(ts) AS t, 1 AS tag,
                                CAST(NULL AS STRUCT(o_orderkey BIGINT, o_totalprice DOUBLE)) AS p,
                                event_id
                         FROM events),
                   u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
                   m AS (SELECT k, t, tag, event_id,
                                last_value(p IGNORE NULLS) OVER (
                                  PARTITION BY k ORDER BY t, tag, p
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
                         FROM u)
              SELECT event_id, k AS user_id, t AS ts,
                     mp.o_orderkey AS o_orderkey, mp.o_totalprice AS o_totalprice
              FROM m WHERE tag = 1""")),

    // Q88 — file-pruning manifest + scan-pruning estimator: the
    // planner-statistics loop q85/q86 opened, closed at the FILE level.
    // Orders are dealt into 16 files by EXACT global rank over
    // (o_date, o_orderkey) — the deterministic, oracle-replayable form of
    // a clustered write's range partitioning (prefix-sum rank, never
    // sampled boundaries, never a single-task window) — and the manifest
    // holds per-file n_rows + min/max/null-count for three columns: the
    // footer-stats table a 100 TB planner probes instead of opening
    // files. Three estimator probes ride as pinned booleans: a date range
    // (Q3'95) and a date point both prune hard on the sort column; the
    // custkey point probe survives in ~every file — the honest
    // demonstration of WHY you sort by what you prune on.
    Entry(
      "q88_prune_manifest",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val man = Layout.fileManifest(ord,
          Seq(col("o_date").asc, col("o_orderkey").asc), 16,
          Seq("o_date", "o_custkey", "o_totalprice"))
        val probed = Layout.pruneEqual(
          Layout.pruneEqual(
            Layout.pruneRange(man, "o_date",
              lit("1995-07-01").cast("date"), lit("1995-10-01").cast("date"),
              "touches_q3_1995"),
            "o_date", lit("1995-09-15").cast("date"), "touches_eq_date"),
          "o_custkey", lit(777L), "touches_eq_custkey")
        probed.select(
          col("file_id"), col("n_rows"),
          col("o_date_min").cast("string").as("o_date_min"),
          col("o_date_max").cast("string").as("o_date_max"),
          col("o_date_nulls"),
          col("o_custkey_min"), col("o_custkey_max"), col("o_custkey_nulls"),
          stableRound(col("o_totalprice_min"), 6).as("o_totalprice_min"),
          stableRound(col("o_totalprice_max"), 6).as("o_totalprice_max"),
          col("o_totalprice_nulls"),
          col("touches_q3_1995"), col("touches_eq_date"),
          col("touches_eq_custkey"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, COUNT(*) AS n_rows,
                                MIN(o_date) AS dmin, MAX(o_date) AS dmax,
                                CAST(SUM(CASE WHEN o_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dnull,
                                MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
                                CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cnull,
                                MIN(o_totalprice) AS pmin, MAX(o_totalprice) AS pmax,
                                CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS pnull
                         FROM a GROUP BY file_id)
              SELECT file_id, n_rows,
                     CAST(dmin AS VARCHAR) AS o_date_min,
                     CAST(dmax AS VARCHAR) AS o_date_max,
                     dnull AS o_date_nulls,
                     cmin AS o_custkey_min, cmax AS o_custkey_max,
                     cnull AS o_custkey_nulls,
                     ROUND(pmin + 1e-9, 6) AS o_totalprice_min,
                     ROUND(pmax + 1e-9, 6) AS o_totalprice_max,
                     pnull AS o_totalprice_nulls,
                     (dmax >= DATE '1995-07-01' AND dmin < DATE '1995-10-01') AS touches_q3_1995,
                     (dmin <= DATE '1995-09-15' AND dmax >= DATE '1995-09-15') AS touches_eq_date,
                     (cmin <= 777 AND cmax >= 777) AS touches_eq_custkey
              FROM m""")),

    // Q89 — equi-depth histogram with per-bucket exact NDV
    // (Profiling.equiDepthHistogram): the optimizer-statistics table —
    // per bucket (lo, hi, n_rows, n_distinct) — that q85's CMS and q86's
    // KLL approximate. Bucket membership is by EXACT GLOBAL RANK over
    // (value, orderkey, linenumber) — the q88 prefix-sum rank, never an
    // interpolated value cut — so ties at a boundary split
    // deterministically and the oracle's row_number() replays the
    // assignment bit-for-bit. l_quantity (50 distinct integer-valued
    // doubles over 60k rows) makes the NDV column meaningful: heavy tie
    // runs cross bucket boundaries and the histogram must price them.
    Entry(
      "q89_histogram_stats",
      (s, d) => Profiling.equiDepthHistogram(
          Tables.load(s, d, "lineitem"), "l_quantity",
          Seq("l_orderkey", "l_linenumber"), nBuckets = 16)
        .select(col("bucket"),
          stableRound(col("lo"), 6).as("lo"),
          stableRound(col("hi"), 6).as("hi"),
          col("n_rows"), col("n_distinct")),
      Some(q89HistSql + """
              SELECT bucket, ROUND(MIN(v) + 1e-9, 6) AS lo,
                     ROUND(MAX(v) + 1e-9, 6) AS hi,
                     COUNT(*) AS n_rows, COUNT(DISTINCT v) AS n_distinct
              FROM a GROUP BY bucket""")),

    // Q89b — the estimator audit: equality-predicate selectivity from the
    // histogram alone (est = Σ n_rows/n_distinct over buckets whose
    // [lo, hi] contains the probe — the uniform-within-bucket NDV rule
    // every CBO uses, summed when a tie run crosses a boundary) priced
    // against the exact per-value count. The histogram is 16 rows, so
    // probing is a broadcast range join against the 50-row probe frame —
    // zero corpus cost at estimate time, which is the point of statistics.
    Entry(
      "q89b_eq_selectivity",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .filter(col("l_quantity").isNotNull)
        val hist = Profiling.equiDepthHistogram(li, "l_quantity",
          Seq("l_orderkey", "l_linenumber"), nBuckets = 16)
        val probes = li.select(col("l_quantity").cast("double").as("v"))
          .distinct()
        val exact = li
          .groupBy(col("l_quantity").cast("double").as("v"))
          .agg(count(lit(1)).as("exact_rows"))
        Profiling.histEqualitySelectivity(hist, probes, "v")
          .join(exact, Seq("v"))
          .select(col("v"), col("est_rows"), col("exact_rows"),
            stableRound(
              abs(col("est_rows") - col("exact_rows")) / col("exact_rows"),
              6).as("err_frac"))
      },
      Some(q89HistSql + """ ,
                   h AS (SELECT bucket, MIN(v) AS lo, MAX(v) AS hi,
                                COUNT(*) AS n_rows, COUNT(DISTINCT v) AS n_distinct
                         FROM a GROUP BY bucket),
                   p AS (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS v
                         FROM lineitem WHERE l_quantity IS NOT NULL),
                   e AS (SELECT p.v,
                                ROUND(COALESCE(SUM(h.n_rows / CAST(h.n_distinct AS DOUBLE)), 0) + 1e-9, 6) AS est_rows
                         FROM p LEFT JOIN h ON p.v >= h.lo AND p.v <= h.hi
                         GROUP BY p.v),
                   x AS (SELECT CAST(l_quantity AS DOUBLE) AS v, COUNT(*) AS exact_rows
                         FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1)
              SELECT e.v, e.est_rows, x.exact_rows,
                     ROUND(ABS(e.est_rows - x.exact_rows) / x.exact_rows + 1e-9, 6) AS err_frac
              FROM e JOIN x USING (v)""")),

    // Q91 — multi-dimensional pruning: the q88 manifest over a Z-ORDERED
    // file assignment. q88 demonstrated the single-sort limit honestly
    // (its custkey point probe survived ~every date-sorted file); here
    // files are dealt by exact global rank over (z_value(o_day,
    // o_custkey), o_orderkey), so each file covers a box chain in
    // (day, custkey) space and BOTH probes prune: touch_day × touch_cust
    // shrinks the multi-predicate scan to the box intersection — the
    // layout decision a 100 TB lake makes when queries filter on two
    // dims. Z-value, rank, stats, and all three verdict booleans are
    // hash-checked (the oracle unrolls the same interleave terms via
    // the generated zValueSql).
    Entry(
      "q91_zorder_manifest",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_day"))
        val z = Layout.withZValue(ord, Seq("o_day", "o_custkey"), bits = 8)
        val man = Layout.fileManifest(z,
          Seq(col("z_value").asc, col("o_orderkey").asc), 16,
          Seq("o_day", "o_custkey"))
        Layout.pruneRange(
          Layout.pruneRange(man, "o_day", lit(9312), lit(9404), "touch_day"),
          "o_custkey", lit(0L), lit(500L), "touch_cust")
          .withColumn("touches_both", col("touch_day") && col("touch_cust"))
      },
      Some(s"""WITH ob AS (SELECT o_orderkey, o_custkey,
                                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_day
                           FROM orders),
                   z AS (${Layout.zValueSql("ob", Seq("o_day", "o_custkey"), 8)}),
                   r AS (SELECT *, row_number() OVER (ORDER BY z_value, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM z),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, COUNT(*) AS n_rows,
                                MIN(o_day) AS dmin, MAX(o_day) AS dmax,
                                CAST(SUM(CASE WHEN o_day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dnull,
                                MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
                                CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cnull
                         FROM a GROUP BY file_id)
              SELECT file_id, n_rows,
                     dmin AS o_day_min, dmax AS o_day_max, dnull AS o_day_nulls,
                     cmin AS o_custkey_min, cmax AS o_custkey_max,
                     cnull AS o_custkey_nulls,
                     COALESCE(dmax >= 9312 AND dmin < 9404, FALSE) AS touch_day,
                     COALESCE(cmax >= 0 AND cmin < 500, FALSE) AS touch_cust,
                     (COALESCE(dmax >= 9312 AND dmin < 9404, FALSE)
                      AND COALESCE(cmax >= 0 AND cmin < 500, FALSE)) AS touches_both
              FROM m""")),

    // Q92 — 2-D Hilbert curve index (Layout.withHilbertValue over the
    // HilbertIndex native kernel): the locality-preserving alternative to
    // q61's Z interleave — consecutive Hilbert indices are always grid
    // NEIGHBORS where the Z curve jumps across the plane at power-of-two
    // boundaries. Same bucketing contract as z (q61's columns, for
    // comparability); the oracle is the GENERATED bits-level CTE chain
    // (Layout.hilbertSql), replaying the same reflect/swap walk in pure
    // integer SQL — hash-exact against the codegen'd kernel loop.
    Entry(
      "q92_hilbert",
      (s, d) => Layout.withHilbertValue(
        Tables.load(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits = 8)
        .select("l_orderkey", "l_linenumber", "h_value"),
      Some(s"""SELECT l_orderkey, l_linenumber, h_value FROM (
                 ${Layout.hilbertSql("lineitem", "l_partkey", "l_suppkey", 8,
                   Seq("l_orderkey", "l_linenumber"))}
               )""")),

    // Q92b — the measured locality verdict: deal orders into 16 files by
    // exact global rank under BOTH curves over the same (o_day, o_custkey)
    // buckets, and compare the per-file bounding-box areas a pruning
    // manifest would carry. Smaller total area = tighter boxes = fewer
    // files touched by any box predicate — the number that decides which
    // curve a 100 TB lake sorts by. Both chains hash-checked end to end
    // (generated z + hilbert SQL, prefix-sum rank, manifest fold).
    Entry(
      "q92b_layout_quality",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_day"))
        def quality(vdf: org.apache.spark.sql.DataFrame, vCol: String,
            name: String): org.apache.spark.sql.DataFrame =
          Layout.fileManifest(vdf,
            Seq(col(vCol).asc, col("o_orderkey").asc), 16,
            Seq("o_day", "o_custkey"))
            .withColumn("_area",
              (col("o_day_max") - col("o_day_min") + 1) *
                (col("o_custkey_max") - col("o_custkey_min") + 1))
            .agg(sum(col("_area")).as("total_area"),
              max(col("_area")).as("max_area"))
            .select(lit(name).as("layout"),
              col("total_area").cast("long").as("total_area"),
              col("max_area").cast("long").as("max_area"))
        quality(Layout.withZValue(ord, Seq("o_day", "o_custkey"), 8),
          "z_value", "zorder")
          .unionByName(quality(
            Layout.withHilbertValue(ord, Seq("o_day", "o_custkey"), 8),
            "h_value", "hilbert"))
      },
      Some(s"""WITH ob AS (SELECT o_orderkey, o_custkey,
                                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_day
                           FROM orders),
                   zc AS (SELECT o_orderkey, o_custkey, o_day, z_value AS v FROM (
                            ${Layout.zValueSql("ob", Seq("o_day", "o_custkey"), 8)})),
                   hc AS (SELECT o_orderkey, o_custkey, o_day, h_value AS v FROM (
                            ${Layout.hilbertSql("ob", "o_day", "o_custkey", 8,
                              Seq("o_orderkey", "o_custkey", "o_day"))})),
                   u AS (SELECT 'zorder' AS layout, * FROM zc
                         UNION ALL SELECT 'hilbert' AS layout, * FROM hc),
                   r AS (SELECT *, row_number() OVER (PARTITION BY layout
                                     ORDER BY v, o_orderkey) AS rn,
                                COUNT(*) OVER (PARTITION BY layout) AS n
                         FROM u),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT layout, file_id,
                                (MAX(o_day) - MIN(o_day) + 1)
                                  * (MAX(o_custkey) - MIN(o_custkey) + 1) AS area
                         FROM a GROUP BY layout, file_id)
              SELECT layout, CAST(SUM(area) AS BIGINT) AS total_area,
                     CAST(MAX(area) AS BIGINT) AS max_area
              FROM m GROUP BY layout""")),

    // Q93 — sketch-served distinct-count CUBE (Hll.rollup): the finest
    // (status, priority) cells' HLL registers are built ONCE from the
    // corpus; every coarser level — by status, by priority, grand total —
    // is derived by max-merging the register frame (cells × 256 rows),
    // never re-scanning. This is the serving shape of a 100 TB BI layer:
    // store fine-cell sketches, answer any rollup by merge. Each of the
    // 4 levels carries its exact countDistinct audit + rel_err; "ALL"
    // marks rolled dimensions. Registers, merges, and the integer-scaled
    // harmonic estimates all replay bit-for-bit in the oracle.
    Entry(
      "q93_hll_cube",
      (s, d) => {
        val ord = Tables.load(s, d, "orders")
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val fine = Hll.registers(ord, keys, "o_custkey", p = 8)
          .localCheckpoint(true) // cells × 256 rows; read by all 4 levels
        def level(ks: Seq[String]): org.apache.spark.sql.DataFrame = {
          val est = Hll.estimate(
            if (ks == keys) fine else Hll.rollup(fine, ks), ks, 8)
          val exact = ord.filter(col("o_custkey").isNotNull)
            .groupBy(ks.map(col): _*)
            .agg(countDistinct(col("o_custkey")).as("n_exact"))
          val j = if (ks.isEmpty) est.crossJoin(exact) else est.join(exact, ks)
          j.select(
            (if (ks.contains("o_orderstatus")) col("o_orderstatus")
             else lit("ALL")).as("o_orderstatus"),
            (if (ks.contains("o_orderpriority")) col("o_orderpriority")
             else lit("ALL")).as("o_orderpriority"),
            col("n_exact"), col("hll_distinct"),
            stableRound(
              abs(col("hll_distinct") - col("n_exact")) / col("n_exact"), 6)
              .as("rel_err"))
        }
        level(keys)
          .unionByName(level(Seq("o_orderstatus")))
          .unionByName(level(Seq("o_orderpriority")))
          .unionByName(level(Nil))
      },
      Some("""WITH h AS (SELECT o_orderstatus, o_orderpriority,
                                ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   regs AS (SELECT o_orderstatus, o_orderpriority, h >> 48 AS b,
                                   MAX(49 - length(regexp_replace(bin(h & ((1::BIGINT << 48) - 1)), '^0+', ''))) AS r
                            FROM h GROUP BY 1, 2, 3),
                   ru AS (SELECT o_orderstatus AS st, o_orderpriority AS pr, b, r FROM regs
                          UNION ALL
                          SELECT o_orderstatus, 'ALL', b, MAX(r) FROM regs GROUP BY o_orderstatus, b
                          UNION ALL
                          SELECT 'ALL', o_orderpriority, b, MAX(r) FROM regs GROUP BY o_orderpriority, b
                          UNION ALL
                          SELECT 'ALL', 'ALL', b, MAX(r) FROM regs GROUP BY b),
                   f AS (SELECT st, pr, COUNT(*) AS ne,
                                SUM(1::BIGINT << (49 - r)) AS s
                         FROM ru GROUP BY st, pr),
                   est AS (SELECT st, pr,
                                  CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256 * 562949953421312
                                    / CAST((256 - ne) * 562949953421312 + s AS DOUBLE) AS e0,
                                  256 - ne AS v
                           FROM f),
                   ee AS (SELECT st, pr,
                                 ROUND(CASE WHEN e0 <= 640.0 AND v > 0
                                            THEN 256.0 * ln(256 / CAST(v AS DOUBLE))
                                            ELSE e0 END + 1e-9, 6) AS hll_distinct
                          FROM est),
                   x AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                COUNT(DISTINCT o_custkey) AS n_exact
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2
                         UNION ALL
                         SELECT o_orderstatus, 'ALL', COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_orderstatus
                         UNION ALL
                         SELECT 'ALL', o_orderpriority, COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_orderpriority
                         UNION ALL
                         SELECT 'ALL', 'ALL', COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL)
              SELECT x.st AS o_orderstatus, x.pr AS o_orderpriority,
                     x.n_exact, ee.hll_distinct,
                     ROUND(abs(ee.hll_distinct - x.n_exact) / x.n_exact + 1e-9, 6) AS rel_err
              FROM ee JOIN x USING (st, pr)""")),

    // Q94 — KMV distinct-count CUBE (Kmv.rollup): q93's twin for the
    // SET-OPERATION sketch — the same finest-cells-once, coarser-levels-
    // by-merge serving shape, but with bottom-k samples, whose rollup
    // (distinct union re-truncated to k smallest) is EXACTLY the sketch
    // built directly at the coarse level. A lake keeps both: HLL for the
    // cheapest distinct counts, KMV where levels must also answer
    // intersections (q63). Four levels, exact audits, "ALL" marks rolled
    // dims; samples and estimates replay bit-for-bit.
    Entry(
      "q94_kmv_cube",
      (s, d) => {
        val ord = Tables.load(s, d, "orders")
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val k = 128
        val fine = Kmv.sketch(ord, keys, "o_custkey", k)
          .localCheckpoint(true) // cells × k rows; read by all 4 levels
        def level(ks: Seq[String]): org.apache.spark.sql.DataFrame = {
          val est = Kmv.estimate(
            if (ks == keys) fine else Kmv.rollup(fine, ks, k), ks, k)
          val exact = ord.filter(col("o_custkey").isNotNull)
            .groupBy(ks.map(col): _*)
            .agg(countDistinct(col("o_custkey")).as("n_exact"))
          val j = if (ks.isEmpty) est.crossJoin(exact) else est.join(exact, ks)
          j.select(
            (if (ks.contains("o_orderstatus")) col("o_orderstatus")
             else lit("ALL")).as("o_orderstatus"),
            (if (ks.contains("o_orderpriority")) col("o_orderpriority")
             else lit("ALL")).as("o_orderpriority"),
            col("n_exact"), col("kmv_distinct"),
            stableRound(
              abs(col("kmv_distinct") - col("n_exact")) / col("n_exact"), 6)
              .as("rel_err"))
        }
        level(keys)
          .unionByName(level(Seq("o_orderstatus")))
          .unionByName(level(Seq("o_orderpriority")))
          .unionByName(level(Nil))
      },
      Some("""WITH h AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   hd AS (SELECT DISTINCT st, pr, h FROM h),
                   lv AS (SELECT st, pr, h FROM hd
                          UNION ALL SELECT st, 'ALL', h FROM (SELECT DISTINCT st, h FROM hd)
                          UNION ALL SELECT 'ALL', pr, h FROM (SELECT DISTINCT pr, h FROM hd)
                          UNION ALL SELECT 'ALL', 'ALL', h FROM (SELECT DISTINCT h FROM hd)),
                   sk AS (SELECT st, pr, h FROM
                            (SELECT st, pr, h,
                                    row_number() OVER (PARTITION BY st, pr ORDER BY h) AS rk
                             FROM lv) WHERE rk <= 128),
                   t AS (SELECT st, pr, COUNT(*) AS n, MAX(h) AS th FROM sk GROUP BY st, pr),
                   e AS (SELECT st, pr,
                                ROUND((CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                                       ELSE 127 * CAST(72057594037927936 AS DOUBLE) / th END) + 1e-9, 6) AS kmv_distinct
                         FROM t),
                   x AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                COUNT(DISTINCT o_custkey) AS n_exact
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2
                         UNION ALL
                         SELECT o_orderstatus, 'ALL', COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_orderstatus
                         UNION ALL
                         SELECT 'ALL', o_orderpriority, COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_orderpriority
                         UNION ALL
                         SELECT 'ALL', 'ALL', COUNT(DISTINCT o_custkey)
                         FROM orders WHERE o_custkey IS NOT NULL)
              SELECT x.st AS o_orderstatus, x.pr AS o_orderpriority,
                     x.n_exact, e.kmv_distinct,
                     ROUND(abs(e.kmv_distinct - x.n_exact) / x.n_exact + 1e-9, 6) AS rel_err
              FROM e JOIN x USING (st, pr)""")),

    // Q95 — KLL quantile CUBE (Kll.rollup): the trilogy's third member —
    // q93 serves distincts (HLL max-merge), q94 set ops (KMV bottom-k),
    // q95 QUANTILES: the finest (status, priority) compactor frames are
    // built once; by-status / by-priority / grand-total sketches are
    // derived by dropping the rolled key and compaction-sweeping each
    // coarse group's combined rows — merge across all of a group's cells
    // at once, register-frame-sized work. Weight conservation keeps every
    // level's n the EXACT row count (the built-in audit); estimates are
    // original data values, coins md5-derived, so the whole cube replays
    // bit-for-bit through the generated build/rollup/estimate chains.
    Entry(
      "q95_kll_cube",
      (s, d) => {
        val ord = Tables.load(s, d, "orders")
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
        val fine = Kll.registers(ord, keys, "o_totalprice", "o_orderkey",
            buckets = 4, k = 32, rounds = 10, salt = "q95")
          .localCheckpoint(true) // sketch-sized; read by all 4 levels
        def level(ks: Seq[String]): org.apache.spark.sql.DataFrame =
          Kll.estimate(
            if (ks == keys) fine
            else Kll.rollup(fine, ks, k = 32, sweepRounds = 16, salt = "q95"),
            ks, qs)
            .select(
              (if (ks.contains("o_orderstatus")) col("o_orderstatus")
               else lit("ALL")).as("o_orderstatus"),
              (if (ks.contains("o_orderpriority")) col("o_orderpriority")
               else lit("ALL")).as("o_orderpriority"),
              col("n"), col("p50"), col("p90"))
        level(keys)
          .unionByName(level(Seq("o_orderstatus")))
          .unionByName(level(Seq("o_orderpriority")))
          .unionByName(level(Nil))
      },
      Some(q95CubeSql)),

    // Q96 — CMS frequency CUBE (Cms.rollup): the sketch-cube family's
    // fourth member — HLL distincts (q93), KMV set ops (q94), KLL
    // quantiles (q95), and here FREQUENCIES: per-cell count-min registers
    // built once, every coarser level derived by sum-folding
    // (row, bucket) counts — exactly the registers built directly at that
    // level, since the sum-fold is exact. Point estimates for custkeys
    // 1-10 at all four levels vs exact counts; width 64 keeps the q62
    // collision-honest regime, with never-undercount as the pinned
    // guarantee at every level.
    Entry(
      "q96_cms_cube",
      (s, d) => {
        val ord = Tables.load(s, d, "orders")
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val (depth, width) = (3, 64)
        val fine = Cms.registers(ord, keys, "o_custkey", depth, width)
          .localCheckpoint(true) // cells × depth × width rows; 4 readers
        def level(ks: Seq[String]): org.apache.spark.sql.DataFrame = {
          val regs = if (ks == keys) fine else Cms.rollup(fine, ks)
          val exact = ord
            .filter(col("o_custkey").isNotNull && col("o_custkey") <= 10)
            .groupBy((ks :+ "o_custkey").map(col): _*)
            .agg(count(lit(1)).as("n_exact"))
          Cms.estimate(regs, exact, ks, "o_custkey", depth, width)
            .join(exact, ks :+ "o_custkey")
            .select(
              (if (ks.contains("o_orderstatus")) col("o_orderstatus")
               else lit("ALL")).as("o_orderstatus"),
              (if (ks.contains("o_orderpriority")) col("o_orderpriority")
               else lit("ALL")).as("o_orderpriority"),
              col("o_custkey"), col("n_exact"), col("cms_count"),
              (col("cms_count") - col("n_exact")).as("overcount"))
        }
        level(keys)
          .unionByName(level(Seq("o_orderstatus")))
          .unionByName(level(Seq("o_orderpriority")))
          .unionByName(level(Nil))
      },
      Some("""WITH h0 AS (SELECT o_orderstatus AS st, o_orderpriority AS pr, o_custkey
                          FROM orders WHERE o_custkey IS NOT NULL),
                   r0 AS (SELECT st, pr, rr.r AS _row,
                                 ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS _bucket,
                                 COUNT(*) AS cnt
                          FROM h0 CROSS JOIN (SELECT unnest(range(0, 3)) AS r) rr
                          GROUP BY st, pr, rr.r, _bucket),
                   ru AS (SELECT st, pr, _row, _bucket, CAST(cnt AS BIGINT) AS cnt FROM r0
                          UNION ALL
                          SELECT st, 'ALL', _row, _bucket, CAST(SUM(cnt) AS BIGINT)
                          FROM r0 GROUP BY st, _row, _bucket
                          UNION ALL
                          SELECT 'ALL', pr, _row, _bucket, CAST(SUM(cnt) AS BIGINT)
                          FROM r0 GROUP BY pr, _row, _bucket
                          UNION ALL
                          SELECT 'ALL', 'ALL', _row, _bucket, CAST(SUM(cnt) AS BIGINT)
                          FROM r0 GROUP BY _row, _bucket),
                   x AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                o_custkey, COUNT(*) AS n_exact
                         FROM orders WHERE o_custkey IS NOT NULL AND o_custkey <= 10
                         GROUP BY 1, 2, 3
                         UNION ALL
                         SELECT o_orderstatus, 'ALL', o_custkey, COUNT(*)
                         FROM orders WHERE o_custkey IS NOT NULL AND o_custkey <= 10
                         GROUP BY o_orderstatus, o_custkey
                         UNION ALL
                         SELECT 'ALL', o_orderpriority, o_custkey, COUNT(*)
                         FROM orders WHERE o_custkey IS NOT NULL AND o_custkey <= 10
                         GROUP BY o_orderpriority, o_custkey
                         UNION ALL
                         SELECT 'ALL', 'ALL', o_custkey, COUNT(*)
                         FROM orders WHERE o_custkey IS NOT NULL AND o_custkey <= 10
                         GROUP BY o_custkey),
                   p AS (SELECT x.st, x.pr, x.o_custkey, rr.r AS _row,
                                ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(x.o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS _bucket
                         FROM x CROSS JOIN (SELECT unnest(range(0, 3)) AS r) rr),
                   e AS (SELECT p.st, p.pr, p.o_custkey,
                                MIN(COALESCE(ru.cnt, 0)) AS cms_count
                         FROM p LEFT JOIN ru USING (st, pr, _row, _bucket)
                         GROUP BY p.st, p.pr, p.o_custkey)
              SELECT x.st AS o_orderstatus, x.pr AS o_orderpriority,
                     x.o_custkey, x.n_exact, e.cms_count,
                     e.cms_count - x.n_exact AS overcount
              FROM x JOIN e USING (st, pr, o_custkey)""")),

    // Q97 — Bloom-augmented pruning manifest: q88's honest failure case
    // closed. The date-sorted manifest's min/max bounds cannot prune an
    // equality probe on the UNSORTED custkey column (q88's touches_eq_
    // custkey survives in ~every file, by design and on record); adding a
    // per-file Bloom filter over custkey (8192 bits, k=4 — ~256 BIGINT
    // words per file) prunes that same probe to the files that actually
    // contain the key plus a priced fp tail, with NO false negatives —
    // a bloom-skipped file provably holds no match, so the pruned scan
    // stays exact. Per file: min/max verdict vs bloom verdict vs ground
    // truth, all hash-checked (the md5 "i:value" lanes replay exactly).
    Entry(
      "q97_bloom_manifest",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"))
        val (mBits, k, probe) = (8192, 4, 777L)
        val asg = Layout.fileAssignments(ord,
            Seq(col("o_date").asc, col("o_orderkey").asc), 16)
          .localCheckpoint(true) // read by stats, bloom build, and truth
        val man = asg.groupBy(col("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("o_custkey")).as("_cmin"),
            max(col("o_custkey")).as("_cmax"),
            max(when(col("o_custkey") === probe, 1L).otherwise(0L))
              .as("has_true"))
        val regs = Bloom.registers(asg, Seq("file_id"), "o_custkey", mBits, k)
        val probes = asg.select("file_id").distinct()
          .withColumn("_v", lit(probe))
        val bm = Bloom.mightContain(regs, probes, Seq("file_id"), Nil,
          "_v", mBits, k)
        man.join(bm, Seq("file_id"))
          .select(col("file_id"), col("n_rows"),
            coalesce(col("_cmin") <= probe && col("_cmax") >= probe,
              lit(false)).as("touches_minmax"),
            col("might_contain").as("touches_bloom"),
            col("has_true"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, COUNT(*) AS n_rows,
                                MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
                                CAST(MAX(CASE WHEN o_custkey = 777 THEN 1 ELSE 0 END) AS BIGINT) AS has_true
                         FROM a GROUP BY file_id),
                   ins AS (SELECT a.file_id, rr.i,
                                  ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':' || CAST(a.o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 8192 AS p
                           FROM a CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rr
                           WHERE a.o_custkey IS NOT NULL),
                   bits AS (SELECT DISTINCT file_id, p FROM ins),
                   pp AS (SELECT rr.i,
                                 ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':777'), 1, 14))::UBIGINT::BIGINT % 8192 AS p
                          FROM (SELECT unnest(range(0, 4)) AS i) rr),
                   bm AS (SELECT f.file_id, COUNT(b.p) = 4 AS touches_bloom
                          FROM (SELECT DISTINCT file_id FROM a) f
                          CROSS JOIN pp
                          LEFT JOIN bits b ON b.file_id = f.file_id AND b.p = pp.p
                          GROUP BY f.file_id)
              SELECT m.file_id, m.n_rows,
                     COALESCE(m.cmin <= 777 AND m.cmax >= 777, FALSE) AS touches_minmax,
                     bm.touches_bloom, m.has_true
              FROM m JOIN bm USING (file_id)""")),

    // Q98 — manifest-driven pruned scan IN THE READ PATH (PrunedScan,
    // round-14 verdict task 1): q88 measured pruning with a tool; this
    // entry pins it as a first-class source. Orders are written under the
    // fileAssignments contract (16 one-file dirs), the manifest is
    // derived, and the Q3'95 range probe lists ONLY surviving files into
    // the parquet reader. Pinned: the scan node's own numFiles metric
    // (not a directory listing) must equal the oracle's replayed survivor
    // count, and the pruned scan's rows/sums must equal the full scan's —
    // the conservative-pruning exactness guarantee, hash-checked.
    Entry(
      "q98_pruned_scan",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q98").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          // manifest is 16 rows; consulted by survivorIds AND the scan —
          // pin it once (the q82 eager-result discipline); write ∥ fold
          val man = Layout.writeWithManifest(ord, order, 16, dir,
            Seq("o_date", "o_custkey"))
          val lo = lit("1995-07-01").cast("date")
          val hi = lit("1995-10-01").cast("date")
          val probes = Seq(graft.sources.RangeProbe("o_date", lo, hi))
          val rowPred = col("o_date") >= lo && col("o_date") < hi
          def agg3(df: org.apache.spark.sql.DataFrame) = df.where(rowPred)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val pruned = agg3(
            graft.sources.PrunedScan.prunedParquet(s, dir, man, probes))
          val p = pruned.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val f = agg3(s.read.option("basePath", dir).parquet(dir))
            .collect()(0)
          val nSurvive =
            graft.sources.PrunedScan.survivorIds(man, probes).length.toLong
          Seq((16L, nSurvive, filesRead, p.getLong(0), p.getLong(1),
            p.getLong(2),
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2),
            filesRead == nSurvive))
            .toDF("n_files_total", "files_survive", "files_read", "n_rows",
              "orderkey_sum", "cents_sum", "identical_to_full",
              "metric_matches")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_date) AS dmin, MAX(o_date) AS dmax
                         FROM a GROUP BY file_id),
                   sv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_survive FROM m
                          WHERE dmax >= DATE '1995-07-01' AND dmin < DATE '1995-10-01'),
                   q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                         FROM o
                         WHERE o_date >= DATE '1995-07-01' AND o_date < DATE '1995-10-01')
              SELECT CAST(16 AS BIGINT) AS n_files_total,
                     sv.n_survive AS files_survive,
                     sv.n_survive AS files_read,
                     q.n_rows, q.orderkey_sum, q.cents_sum,
                     TRUE AS identical_to_full,
                     TRUE AS metric_matches
              FROM sv, q""")),

    // Q98b — the Bloom-sharpened pruned scan: q97 built per-file Bloom
    // registers to close q88's unsorted-column failure case; this entry
    // wires them into the SAME read path. The custkey=777 equality probe
    // on the date-sorted layout survives min/max in every file (on
    // record in q88), but the Bloom sidecar prunes the listing to the
    // truly-containing files plus the priced fp tail — and the scan-node
    // numFiles metric must equal the oracle's replayed bloom-survivor
    // count while the row answer stays exactly the full scan's.
    Entry(
      "q98b_pruned_scan_bloom",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"))
        val (mBits, k, probe) = (8192, 4, 777L)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q98b").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          // write ∥ assignment pin, then manifest ∥ register fold — all
          // independent deterministic jobs (round-17, guide §5)
          import scala.concurrent.{Await, Future, ExecutionContext}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val wF = Future(Layout.assignedWrite(ord, order, 16, dir))
          val asg = Layout.fileAssignments(ord, order, 16)
            .localCheckpoint(true) // read by manifest and register build
          val manF = Future(asg.groupBy(col("file_id"))
            .agg(count(lit(1)).as("n_rows"),
              min(col("o_custkey")).as("o_custkey_min"),
              max(col("o_custkey")).as("o_custkey_max"),
              sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
                .as("o_custkey_nulls"))
            .localCheckpoint(true))
          val regsF = Future(graft.operators.Bloom.registers(
            asg, Seq("file_id"), "o_custkey", mBits, k)
            .localCheckpoint(true))
          val man = Await.result(manF, Duration.Inf)
          val regs = Await.result(regsF, Duration.Inf)
          Await.result(wF, Duration.Inf)
          val probes = Seq(graft.sources.EqualProbe("o_custkey", lit(probe)))
          val blooms = Map("o_custkey" ->
            graft.sources.BloomSidecar(regs, mBits, k))
          def agg2(df: org.apache.spark.sql.DataFrame) =
            df.where(col("o_custkey") === probe)
              .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ok"))
          val pruned = agg2(graft.sources.PrunedScan.prunedParquet(
            s, dir, man, probes, blooms))
          val p = pruned.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val f = agg2(s.read.option("basePath", dir).parquet(dir))
            .collect()(0)
          val nMinMax = graft.sources.PrunedScan
            .survivorIds(man, probes).length.toLong
          val nBloom = graft.sources.PrunedScan
            .survivorIds(man, probes, blooms).length.toLong
          // sums are NULL when the probe matches no row (possible at the
          // smoke SF) — carry the boxed null through so the frame matches
          // the oracle's NULL instead of throwing on getLong
          def okSum(r: org.apache.spark.sql.Row): java.lang.Long =
            if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
          Seq((16L, nMinMax, nBloom, filesRead, p.getLong(0), okSum(p),
            p.getLong(0) == f.getLong(0) &&
              java.util.Objects.equals(okSum(p), okSum(f)),
            filesRead == nBloom))
            .toDF("n_files_total", "files_survive_minmax",
              "files_survive_bloom", "files_read", "n_rows", "orderkey_sum",
              "identical_to_full", "metric_matches")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax
                         FROM a GROUP BY file_id),
                   ins AS (SELECT a.file_id, rr.i,
                                  ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':' || CAST(a.o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 8192 AS p
                           FROM a CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rr
                           WHERE a.o_custkey IS NOT NULL),
                   bits AS (SELECT DISTINCT file_id, p FROM ins),
                   pp AS (SELECT rr.i,
                                 ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':777'), 1, 14))::UBIGINT::BIGINT % 8192 AS p
                          FROM (SELECT unnest(range(0, 4)) AS i) rr),
                   bm AS (SELECT f.file_id, COUNT(b.p) = 4 AS might
                          FROM (SELECT DISTINCT file_id FROM a) f
                          CROSS JOIN pp
                          LEFT JOIN bits b ON b.file_id = f.file_id AND b.p = pp.p
                          GROUP BY f.file_id),
                   mv AS (SELECT m.file_id,
                                 COALESCE(m.cmin <= 777 AND m.cmax >= 777, FALSE) AS mm,
                                 bm.might
                          FROM m JOIN bm USING (file_id)),
                   sv AS (SELECT CAST(SUM(CASE WHEN mm THEN 1 ELSE 0 END) AS BIGINT) AS n_mm,
                                 CAST(SUM(CASE WHEN mm AND might THEN 1 ELSE 0 END) AS BIGINT) AS n_bl
                          FROM mv),
                   q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum
                         FROM o WHERE o_custkey = 777)
              SELECT CAST(16 AS BIGINT) AS n_files_total,
                     sv.n_mm AS files_survive_minmax,
                     sv.n_bl AS files_survive_bloom,
                     sv.n_bl AS files_read,
                     q.n_rows, q.orderkey_sum,
                     TRUE AS identical_to_full,
                     TRUE AS metric_matches
              FROM sv, q""")),

    // Q92c — N-DIMENSIONAL Hilbert layout (Layout.withHilbertValueN,
    // round-14 verdict task 6): q92's kernel was 2-D while z-order
    // already generalized; 3-4 layout columns is the common lake case.
    // Skilling's transpose walk as a native codegen kernel
    // (functions/HilbertN.scala), hash-checked against a GENERATED
    // DuckDB CTE chain that unrolls the same walk one (level, dim)
    // exchange/invert step per CTE — bit-identical h_value for every
    // orders row at 3 dims x 6 bits.
    Entry(
      "q92c_hilbert3",
      (s, d) => Layout.withHilbertValueN(
        Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_day"),
          floor(col("o_totalprice")).cast("long").as("o_price")),
        Seq("o_day", "o_custkey", "o_price"), bits = 6)
        .select("o_orderkey", "h_value"),
      Some(s"""WITH ob AS (SELECT o_orderkey, o_custkey,
                                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_day,
                                  CAST(FLOOR(o_totalprice) AS BIGINT) AS o_price
                           FROM orders)
               SELECT o_orderkey, h_value FROM (
                 ${Layout.hilbertSqlN("ob",
                   Seq("o_day", "o_custkey", "o_price"), 6,
                   Seq("o_orderkey"))}
               )""")),

    // Q92d — the measured 3-dim locality verdict (q92b's discipline one
    // dimension up): deal orders into 16 rank-files under 3-dim z-order
    // and 3-dim Hilbert over the same (day, custkey, price) buckets and
    // compare the per-file bounding-BOX VOLUMES a pruning manifest would
    // carry — the number that decides which curve a 3-column lake sorts
    // by. Both chains hash-checked end to end (generated z + hilbertN
    // SQL, prefix-sum rank, manifest fold).
    Entry(
      "q92d_layout_quality3",
      (s, d) => {
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_day"),
          floor(col("o_totalprice")).cast("long").as("o_price"))
        def quality(vdf: org.apache.spark.sql.DataFrame, vCol: String,
            name: String): org.apache.spark.sql.DataFrame =
          Layout.fileManifest(vdf,
            Seq(col(vCol).asc, col("o_orderkey").asc), 16,
            Seq("o_day", "o_custkey", "o_price"))
            .withColumn("_vol",
              (col("o_day_max") - col("o_day_min") + 1) *
                (col("o_custkey_max") - col("o_custkey_min") + 1) *
                (col("o_price_max") - col("o_price_min") + 1))
            .agg(sum(col("_vol")).as("total_volume"),
              max(col("_vol")).as("max_volume"))
            .select(lit(name).as("layout"),
              col("total_volume").cast("long").as("total_volume"),
              col("max_volume").cast("long").as("max_volume"))
        quality(
          Layout.withZValue(ord, Seq("o_day", "o_custkey", "o_price"), 6),
          "z_value", "zorder3")
          .unionByName(quality(
            Layout.withHilbertValueN(ord,
              Seq("o_day", "o_custkey", "o_price"), 6),
            "h_value", "hilbert3"))
      },
      Some(s"""WITH ob AS (SELECT o_orderkey, o_custkey,
                                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_day,
                                  CAST(FLOOR(o_totalprice) AS BIGINT) AS o_price
                           FROM orders),
                   zc AS (SELECT o_orderkey, o_custkey, o_day, o_price, z_value AS v FROM (
                            ${Layout.zValueSql("ob",
                              Seq("o_day", "o_custkey", "o_price"), 6)})),
                   hc AS (SELECT o_orderkey, o_custkey, o_day, o_price, h_value AS v FROM (
                            ${Layout.hilbertSqlN("ob",
                              Seq("o_day", "o_custkey", "o_price"), 6,
                              Seq("o_orderkey", "o_custkey", "o_day", "o_price"))})),
                   u AS (SELECT 'zorder3' AS layout, * FROM zc
                         UNION ALL SELECT 'hilbert3' AS layout, * FROM hc),
                   r AS (SELECT *, row_number() OVER (PARTITION BY layout
                                     ORDER BY v, o_orderkey) AS rn,
                                COUNT(*) OVER (PARTITION BY layout) AS n
                         FROM u),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT layout, file_id,
                                (MAX(o_day) - MIN(o_day) + 1)
                                  * (MAX(o_custkey) - MIN(o_custkey) + 1)
                                  * (MAX(o_price) - MIN(o_price) + 1) AS vol
                         FROM a GROUP BY layout, file_id)
              SELECT layout, CAST(SUM(vol) AS BIGINT) AS total_volume,
                     CAST(MAX(vol) AS BIGINT) AS max_volume
              FROM m GROUP BY layout""")),

    // C14 — TRAINED entity-resolution scorer (round-14 verdict task 4):
    // d20b honestly priced the hand-set field weights at precision 0.24
    // (recall 0.972). This composition LEARNS the weights instead:
    // q71's logistic GD over d20's per-field 6dp similarities against
    // the planted-truth labels, sigmoid rescore on the rounded final
    // coefficients, q51's information-gain cut on the learned score,
    // and d18's pair-set metrics at that cut — the full c09-style
    // composition, one row, hash-checked end to end. Every stage reuses
    // an individually-oracled operator; the learned cut prices
    // materially above the 0.24 baseline at the same planted truth.
    // Cost note: the bench's most expensive entry BY DESIGN — ~25
    // sequential audited sub-jobs (pair build, 24 GD stages, two sweep
    // passes, five metric aggregates), each KB-to-MB-sized; the wall is
    // stage-count x scheduling floor, not data volume, and is flat in
    // corpus size once the pair frame is built.
    Entry(
      "c14_trained_matcher",
      (s, d) => {
        val feats = Seq("p_name_edit_sim", "p_name_jaccard_sim",
          "p_brand_exact_sim", "p_size_close_sim")
        // all block candidates (threshold 0), labeled by the planting
        // rule; pair-set-sized, read by fit + sweep + metrics — pin it.
        // Blocking carries a THIRD, variant-invariant key (round-16
        // verdict task 6): the LAST name token — the planted variant
        // only damages the first token, so every truth pair still
        // co-blocks (block_recall is PRICED below and rides the
        // hash-checked row, 1.0 by construction of the plant), while
        // unrelated same-(brand, first-letter) pairs drop ~7.9×
        // (sf0.1: 1.57M -> 200k candidates; the residue shares the
        // whole name tail — the genuinely-hard near-identical names)
        val labeled = Dedup.entityPairs(
          d20Records(s, d), "p_partkey",
          Seq(col("p_brand"), substring(col("p_name"), 1, 1),
            element_at(org.apache.spark.sql.functions.split(
              trim(col("p_name")), " "), -1)),
          editFields = Seq("p_name" -> 0.4),
          jaccardFields = Seq("p_name" -> 0.2),
          exactFields = Seq("p_brand" -> 0.2),
          closeFields = Seq("p_size" -> 0.2),
          threshold = 0.0)
          .withColumn("is_match",
            col("b_id") === col("a_id") + lit(1000000L) &&
              col("a_id") % 4 === 0)
          .withColumn("y", col("is_match").cast("double"))
          // pin only what downstream reads (task 5a): ids, the
          // hand-weight score, the four features, labels — the d20
          // per-field sim/debug columns would otherwise ride through
          // every checkpoint scan below
          .select((Seq("a_id", "b_id", "score").map(col) ++
            feats.map(col) ++ Seq(col("is_match"), col("y"))): _*)
          .localCheckpoint(true)
        // LABEL-BALANCED training sample: a heavily negative candidate
        // set stalls a zero-initialized GD inside the negative prior
        // (measured: all-negative betas, accuracy == the prior,
        // precision 0.001). Keep every positive + a deterministic 1/4
        // md5 slice of negatives (~parity at sf0.01, ~10:1 at sf0.1
        // under the tightened blocking — the regime the old 1/31 slice
        // gave the 7.9×-larger candidate set); train on the sample,
        // CUT AND PRICE ON THE FULL SET — the standard
        // imbalanced-learning recipe, hash-replayable like everything.
        // pre-projected + pinned (round-15 verdict task 5a): the 24 GD
        // passes each re-scan the training frame; without this they
        // re-read labeled's checkpoint — FULL-WIDTH d20 sim/debug rows —
        // and re-apply the sampling filter 24 times. A five-column
        // checkpoint of the sampled slice makes each pass a narrow
        // ~KB-sized scan (measured: 28.3 s → single-digit wall at sf0.1,
        // same hash-checked output row)
        val train = labeled.where(col("is_match") ||
          pmod(Dedup.hash56(concat_ws(":",
            col("a_id").cast("string"), col("b_id").cast("string"))),
            lit(4L)) === 0)
          .select((feats.map(col) :+ col("y")): _*)
          // ONE partition: the slice is ~KB-sized and each GD step is a
          // full pass, so 32 near-empty tasks per step were pure job
          // floor; a single sequential sum is also the most stable
          // summation order for the 6dp-rounded trajectory
          .repartition(1)
          .localCheckpoint(true)
        val fit = Classifier.logisticFit(
          train, feats, "y", iters = 24, lr = 4.0)
          .localCheckpoint(true) // one row; read by rescore and output
        val wRow = fit.select(
          col("intercept").as("_w0") +:
            feats.zipWithIndex.map { case (f, i) =>
              col(s"beta_$f").as(s"_w${i + 1}") }: _*)
        val scored = labeled.crossJoin(broadcast(wRow))
          .withColumn("t_score", stableRound(
            lit(1.0) / (lit(1.0) + exp(-(col("_w0") +
              feats.zipWithIndex.map { case (f, i) =>
                col(s"_w${i + 1}") * col(f) }.reduce(_ + _)))), 6))
          .select("a_id", "b_id", "is_match", "t_score")
          .localCheckpoint(true) // read by sweep and predicted set
        val split = Profiling.bestSplit(scored, "t_score", "is_match")
          .localCheckpoint(true) // one row
        val predicted = scored.crossJoin(broadcast(
            split.select(col("threshold").as("_thr"))))
          .where(col("t_score") >= col("_thr"))
        val truth = Tables.load(s, d, "part")
          .filter(col("p_partkey") % 4 === 0)
          .select(col("p_partkey").as("a_id"),
            (col("p_partkey") + lit(1000000L)).as("b_id"))
        val metrics = Dedup.pairSetMetrics(predicted, truth, "a_id", "b_id")
        // the priced verdict vs the hand-weight baseline: d20's own 0.75
        // cut on the UNTRAINED score prices (base_precision, base_recall);
        // the trained score is then read at the SAME recall (highest
        // threshold keeping every baseline-recalled pair) — the
        // equal-recall precision is the apples-to-apples win
        val baseMet = Dedup.pairSetMetrics(
          labeled.where(col("score") >= 0.75), truth, "a_id", "b_id")
          .select(col("n_both").as("_bboth"), col("n_truth").as("_bnt"),
            col("precision").as("base_precision"),
            col("recall").as("base_recall"))
          .localCheckpoint(true) // one row; read by eq sweep and output
        val eq = Profiling.rocSweep(scored, "t_score", "is_match")
          .crossJoin(broadcast(baseMet))
          .where(col("tp") >= col("_bboth"))
          .orderBy(col("threshold").desc).limit(1)
          .select(
            col("threshold").as("threshold_at_base_recall"),
            stableRound(col("tp").cast("double") / (col("tp") + col("fp")),
              6).as("precision_at_base_recall"),
            stableRound(col("tp").cast("double") / col("_bnt"), 6)
              .as("recall_at_base_recall"))
        // the blocking's own priced verdict (round-16 task 6): recall
        // of the CANDIDATE set against truth — the number that says the
        // tightened key lost nothing, pinned in the same hashed row
        val candMet = Dedup.pairSetMetrics(labeled, truth, "a_id", "b_id")
          .select(col("n_pred").as("n_cand"),
            col("recall").as("block_recall"))
        fit.crossJoin(split).crossJoin(metrics)
          .crossJoin(baseMet.select("base_precision", "base_recall"))
          .crossJoin(eq)
          .crossJoin(candMet)
      },
      Some(c14Sql(iters = 24, lr = 4.0))),

    // Q99 — statistics-driven join auto-router (SkewJoin.autoJoin,
    // round-14 verdict task 2): the engine's planner statistics acting
    // as an optimizer. Three planted scenarios — a broadcastable dim, a
    // hot-key big side (every user_id % 3 == 0 collapsed onto one key,
    // ~1/3 of the corpus), and a balanced join — each routed from two
    // KB-sized frames only (an MG-64 key summary and a one-row small
    // count; no corpus pre-scan at decision time). The decision table —
    // route, the MG lower-bound top-key share, and the salt fan-out —
    // is hash-checked against an oracle that replays the MG truncation
    // (counts → 65th-largest offset → max residual weight) exactly;
    // route equivalence against the plain join is SkewJoinSpec's pin.
    Entry(
      "q99_join_router",
      (s, d) => {
        import s.implicits._
        val ev = Tables.load(s, d, "events")
        val cust = Tables.load(s, d, "customer")
        val users = ev.select(col("user_id")).distinct()
        def scenario(
            name: String, big: org.apache.spark.sql.DataFrame,
            keyCol: String, small: org.apache.spark.sql.DataFrame,
            limit: Long) = {
          val mg = SkewJoin.keyFreqSummary(big, Seq(keyCol), 64)
          val cnt = small.agg(count(lit(1)).as("n"))
          val dec = SkewJoin.decide(mg, cnt, limit,
            skewShare = 0.2, nSalts = 8)
          (name, dec.route, dec.smallRows, dec.bigRows,
            dec.topKeyShareLb, dec.nSalts.toLong)
        }
        val skewed = ev.withColumn("skew_key",
          when(pmod(col("user_id"), lit(3)) === 0, lit(-1L))
            .otherwise(col("user_id")))
        Seq(
          scenario("planted_small", ev, "user_id", cust, 10000L),
          scenario("planted_skew", skewed, "skew_key", users, 100L),
          scenario("balanced", ev, "user_id", users, 100L))
          .toDF("scenario", "route", "small_rows", "big_rows",
            "top_share", "n_salts")
          .withColumn("top_share", stableRound(col("top_share"), 6))
      },
      Some("""WITH b1 AS (SELECT CAST(user_id AS VARCHAR) AS item, COUNT(*) AS c
                          FROM events GROUP BY 1),
                   b2 AS (SELECT CAST(CASE WHEN user_id % 3 = 0 THEN -1 ELSE user_id END AS VARCHAR) AS item,
                                 COUNT(*) AS c
                          FROM events GROUP BY 1),
                   n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
                   cu AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM customer),
                   u AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
                         FROM (SELECT DISTINCT user_id FROM events)),
                   t1 AS (SELECT CAST(c AS BIGINT) AS t
                          FROM (SELECT c, row_number() OVER (ORDER BY c DESC, item ASC) AS rn FROM b1)
                          WHERE rn = 65),
                   t2 AS (SELECT CAST(c AS BIGINT) AS t
                          FROM (SELECT c, row_number() OVER (ORDER BY c DESC, item ASC) AS rn FROM b2)
                          WHERE rn = 65),
                   w1 AS (SELECT CAST(MAX(c) - COALESCE((SELECT t FROM t1), 0) AS BIGINT) AS topw FROM b1),
                   w2 AS (SELECT CAST(MAX(c) - COALESCE((SELECT t FROM t2), 0) AS BIGINT) AS topw FROM b2),
                   sc AS (SELECT 'planted_small' AS scenario, cu.cnt AS small_rows,
                                 n.n AS big_rows, w1.topw / CAST(n.n AS DOUBLE) AS share,
                                 CAST(10000 AS BIGINT) AS lim
                          FROM n, cu, w1
                          UNION ALL
                          SELECT 'planted_skew', u.cnt, n.n,
                                 w2.topw / CAST(n.n AS DOUBLE), 100
                          FROM n, u, w2
                          UNION ALL
                          SELECT 'balanced', u.cnt, n.n,
                                 w1.topw / CAST(n.n AS DOUBLE), 100
                          FROM n, u, w1)
              SELECT scenario,
                     CASE WHEN small_rows <= lim THEN 'broadcast'
                          WHEN share >= 0.2 THEN 'salted'
                          ELSE 'shuffle' END AS route,
                     small_rows, big_rows,
                     ROUND(share + 1e-9, 6) AS top_share,
                     CAST(CASE WHEN small_rows > lim AND share >= 0.2
                               THEN 8 ELSE 1 END AS BIGINT) AS n_salts
              FROM sc""")),

    // C15 — the round-15 features COMPOSED: a statistics-optimized read
    // + join pipeline whose answer must equal the naive SQL exactly.
    // Orders land under the assignedWrite contract; the Q3'95 probe
    // prunes the listing through the manifest (files_read pinned against
    // the oracle-replayed survivor count); the surviving rows join
    // customer through the auto-router, whose decision — broadcast, from
    // a one-row count and an MG key summary, no corpus pre-scan — is
    // pinned alongside. Segment revenue totals are computed ONLY from
    // the optimized path; the oracle computes them from the plain
    // table — conservative pruning + route equivalence make the two
    // identical, which is the entire point of pinning compositions.
    Entry(
      "c15_pruned_routed_join",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val cust = Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-c15").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          // write and manifest fold are independent deterministic jobs —
          // concurrent driver actions (round-17, guide §5 driver floor)
          import scala.concurrent.{Await, Future, ExecutionContext}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val wF = Future(Layout.assignedWrite(ord, order, 16, dir))
          val man = Layout.fileManifest(ord, order, 16, Seq("o_date"))
            .localCheckpoint(true)
          Await.result(wF, Duration.Inf)
          val lo = lit("1995-07-01").cast("date")
          val hi = lit("1995-10-01").cast("date")
          val probes = Seq(graft.sources.RangeProbe("o_date", lo, hi))
          // keep the pre-checkpoint frame: the scan-node metric lives on
          // ITS executed plan (the checkpointed frame is a LogicalRDD)
          val scanned = graft.sources.PrunedScan
            .prunedParquet(s, dir, man, probes)
            .where(col("o_date") >= lo && col("o_date") < hi)
            .withColumnRenamed("o_custkey", "c_custkey")
          val pruned = scanned
            .localCheckpoint(true) // read by MG stats AND the join
          // router inputs: KB-sized frames only — the MG summary of the
          // PRUNED fact side's join key, and the one-row dim count
          val mg = SkewJoin.keyFreqSummary(pruned, Seq("c_custkey"), 64)
          val cnt = cust.agg(count(lit(1)).as("n"))
          val (joined, dec) = SkewJoin.autoJoin(
            pruned, cust, Seq("c_custkey"), mg, cnt,
            broadcastRowLimit = 100000L, skewShare = 0.2, nSalts = 8)
          val agg = joined.groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"),
              sum(round(col("o_totalprice") * 100).cast("long"))
                .as("cents_sum"))
            .collect().toSeq
          val filesRead = graft.sources.PrunedScan.filesRead(scanned)
          val nSurvive = graft.sources.PrunedScan
            .survivorIds(man, probes).length.toLong
          agg.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            dec.route, filesRead, nSurvive, filesRead == nSurvive))
            .toDF("c_mktsegment", "n_orders", "cents_sum", "route",
              "files_read", "files_survive", "metric_matches")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_date) AS dmin, MAX(o_date) AS dmax
                         FROM a GROUP BY file_id),
                   sv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_survive FROM m
                          WHERE dmax >= DATE '1995-07-01' AND dmin < DATE '1995-10-01'),
                   q AS (SELECT c.c_mktsegment,
                                CAST(COUNT(*) AS BIGINT) AS n_orders,
                                CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                         FROM o JOIN customer c ON o.o_custkey = c.c_custkey
                         WHERE o.o_date >= DATE '1995-07-01' AND o.o_date < DATE '1995-10-01'
                         GROUP BY c.c_mktsegment)
              SELECT q.c_mktsegment, q.n_orders, q.cents_sum,
                     'broadcast' AS route,
                     sv.n_survive AS files_read,
                     sv.n_survive AS files_survive,
                     TRUE AS metric_matches
              FROM q, sv""")),

    // Q98c — MULTI-DIMENSIONAL layout in the read path (round-15 verdict
    // task 6): orders written under the assignedWrite contract ordered
    // by the 3-dim Hilbert value (q92c kernel, 6 bits over day/custkey/
    // price), then PRUNED READS against its manifest. One deliberate
    // deviation from the task text, stated plainly: no curve can beat a
    // dedicated single sort ON ITS OWN COLUMN (a custkey-sorted layout
    // answers a custkey point/band probe from ~1 file, always), so the
    // pin is at WORKLOAD granularity — a 3-query mini-workload (date
    // range; custkey band; their intersection) where the Hilbert
    // layout's TOTAL files touched must beat BOTH single-sort totals,
    // each single sort paying full scans on the other column's queries.
    // All nine survivor counts, the totals, the winner verdict, AND the
    // intersection answer replay in DuckDB through the generated
    // hilbertSqlN CTE (the q92d machinery) — one hash-checked row; the
    // scan-node numFiles of the combined-probe read is pinned against
    // the replayed survivor count.
    Entry(
      "q98c_hilbert_prune",
      (s, d) => {
        import s.implicits._
        val dims = Seq("o_day", "o_custkey", "o_price")
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_day"),
          floor(col("o_totalprice")).cast("long").as("o_price"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q98c").toString
        try {
          val dir = s"$tmp/orders"
          val h = Layout.withHilbertValueN(ord, dims, 6)
          val hOrder = Seq(col("h_value").asc, col("o_orderkey").asc)
          val stats = Seq("o_day", "o_custkey")
          // the layout write and the three manifest folds are independent
          // jobs over deterministic frames — run them concurrently
          // (round-17, guide §5 driver floor; results identical, each
          // fold pinned before use)
          import scala.concurrent.{Await, Future, ExecutionContext}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val wF = Future(Layout.assignedWrite(h, hOrder, 64, dir))
          val manHF = Future(Layout.fileManifest(h, hOrder, 64, stats)
            .localCheckpoint(true))
          val manDF = Future(Layout.fileManifest(ord,
            Seq(col("o_day").asc, col("o_orderkey").asc), 64, stats)
            .localCheckpoint(true))
          val manCF = Future(Layout.fileManifest(ord,
            Seq(col("o_custkey").asc, col("o_orderkey").asc), 64, stats)
            .localCheckpoint(true))
          val manH = Await.result(manHF, Duration.Inf)
          val manD = Await.result(manDF, Duration.Inf)
          val manC = Await.result(manCF, Duration.Inf)
          Await.result(wF, Duration.Inf)
          // probe constants: the day window is fixed; the custkey band is
          // [40%, 45%) of the span — integer arithmetic, replayed by the
          // oracle from the same min/max
          val dayLo = java.time.LocalDate.of(1995, 7, 1).toEpochDay
          val dayHi = java.time.LocalDate.of(1995, 10, 1).toEpochDay
          val b = ord.agg(min(col("o_custkey")).cast("long"),
            max(col("o_custkey")).cast("long")).collect()(0)
          val (cmin, cmax) = (b.getLong(0), b.getLong(1))
          val bandLo = cmin + (cmax - cmin) * 2 / 5
          val bandHi = cmin + (cmax - cmin) * 9 / 20
          val pDay = graft.sources.RangeProbe(
            "o_day", lit(dayLo), lit(dayHi))
          val pCust = graft.sources.RangeProbe(
            "o_custkey", lit(bandLo), lit(bandHi))
          def n(man: org.apache.spark.sql.DataFrame,
              ps: Seq[graft.sources.FileProbe]) =
            graft.sources.PrunedScan.survivorIds(man, ps).length.toLong
          val (h1, h2, h3) =
            (n(manH, Seq(pDay)), n(manH, Seq(pCust)), n(manH, Seq(pDay, pCust)))
          val (d1, d3) = (n(manD, Seq(pDay)), n(manD, Seq(pDay, pCust)))
          val (c2, c3) = (n(manC, Seq(pCust)), n(manC, Seq(pDay, pCust)))
          // a single sort pays a FULL scan on the other column's query
          val (hTot, dTot, cTot) =
            (h1 + h2 + h3, d1 + 64L + d3, 64L + c2 + c3)
          val rowPred = col("o_day") >= dayLo && col("o_day") < dayHi &&
            col("o_custkey") >= bandLo && col("o_custkey") < bandHi
          val pruned = graft.sources.PrunedScan
            .prunedParquet(s, dir, manH, Seq(pDay, pCust))
            .where(rowPred)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val p = pruned.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val f = ord.where(rowPred)
            .agg(count(lit(1)), sum(col("o_orderkey")),
              sum(round(col("o_totalprice") * 100).cast("long")))
            .collect()(0)
          Seq((h1, h2, h3, d1, d3, c2, c3, hTot, dTot, cTot,
            hTot < dTot && hTot < cTot,
            filesRead, filesRead == h3,
            p.getLong(0), p.getLong(1), p.getLong(2),
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2)))
            .toDF("h_day", "h_cust", "h_both", "d_day", "d_both",
              "c_cust", "c_both", "h_total", "d_total", "c_total",
              "hilbert_wins", "files_read", "metric_matches",
              "n_rows", "orderkey_sum", "cents_sum", "identical_to_full")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some(s"""WITH ob AS (SELECT o_orderkey, o_custkey,
                                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_day,
                                  CAST(FLOOR(o_totalprice) AS BIGINT) AS o_price,
                                  o_totalprice
                           FROM orders),
                   par AS (SELECT CAST(MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) * 2 // 5 AS BIGINT) AS blo,
                                  CAST(MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) * 9 // 20 AS BIGINT) AS bhi,
                                  CAST(DATE '1995-07-01' - DATE '1970-01-01' AS BIGINT) AS dlo,
                                  CAST(DATE '1995-10-01' - DATE '1970-01-01' AS BIGINT) AS dhi
                           FROM ob),
                   hv AS (SELECT o_orderkey, o_custkey, o_day, h_value AS v FROM (
                            ${Layout.hilbertSqlN("ob",
                              Seq("o_day", "o_custkey", "o_price"), 6,
                              Seq("o_orderkey", "o_custkey", "o_day"))})),
                   rh AS (SELECT *, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
                                 COUNT(*) OVER () AS n FROM hv),
                   mh AS (SELECT (rn - 1) * 64 // n AS file_id,
                                 MIN(o_day) AS dmn, MAX(o_day) AS dmx,
                                 MIN(o_custkey) AS cmn, MAX(o_custkey) AS cmx
                          FROM rh GROUP BY 1),
                   rd AS (SELECT *, row_number() OVER (ORDER BY o_day, o_orderkey) AS rn,
                                 COUNT(*) OVER () AS n FROM ob),
                   md AS (SELECT (rn - 1) * 64 // n AS file_id,
                                 MIN(o_day) AS dmn, MAX(o_day) AS dmx,
                                 MIN(o_custkey) AS cmn, MAX(o_custkey) AS cmx
                          FROM rd GROUP BY 1),
                   rc AS (SELECT *, row_number() OVER (ORDER BY o_custkey, o_orderkey) AS rn,
                                 COUNT(*) OVER () AS n FROM ob),
                   mc AS (SELECT (rn - 1) * 64 // n AS file_id,
                                 MIN(o_day) AS dmn, MAX(o_day) AS dmx,
                                 MIN(o_custkey) AS cmn, MAX(o_custkey) AS cmx
                          FROM rc GROUP BY 1),
                   cnt AS (SELECT
                     (SELECT COUNT(*) FROM mh, par WHERE dmx >= dlo AND dmn < dhi) AS h_day,
                     (SELECT COUNT(*) FROM mh, par WHERE cmx >= blo AND cmn < bhi) AS h_cust,
                     (SELECT COUNT(*) FROM mh, par WHERE dmx >= dlo AND dmn < dhi
                                                     AND cmx >= blo AND cmn < bhi) AS h_both,
                     (SELECT COUNT(*) FROM md, par WHERE dmx >= dlo AND dmn < dhi) AS d_day,
                     (SELECT COUNT(*) FROM md, par WHERE dmx >= dlo AND dmn < dhi
                                                     AND cmx >= blo AND cmn < bhi) AS d_both,
                     (SELECT COUNT(*) FROM mc, par WHERE cmx >= blo AND cmn < bhi) AS c_cust,
                     (SELECT COUNT(*) FROM mc, par WHERE dmx >= dlo AND dmn < dhi
                                                     AND cmx >= blo AND cmn < bhi) AS c_both),
                   ans AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                  CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                           FROM ob, par
                           WHERE o_day >= dlo AND o_day < dhi
                             AND o_custkey >= blo AND o_custkey < bhi)
              SELECT CAST(h_day AS BIGINT) AS h_day,
                     CAST(h_cust AS BIGINT) AS h_cust,
                     CAST(h_both AS BIGINT) AS h_both,
                     CAST(d_day AS BIGINT) AS d_day,
                     CAST(d_both AS BIGINT) AS d_both,
                     CAST(c_cust AS BIGINT) AS c_cust,
                     CAST(c_both AS BIGINT) AS c_both,
                     CAST(h_day + h_cust + h_both AS BIGINT) AS h_total,
                     CAST(d_day + 64 + d_both AS BIGINT) AS d_total,
                     CAST(64 + c_cust + c_both AS BIGINT) AS c_total,
                     (h_day + h_cust + h_both < d_day + 64 + d_both
                      AND h_day + h_cust + h_both < 64 + c_cust + c_both) AS hilbert_wins,
                     CAST(h_both AS BIGINT) AS files_read,
                     TRUE AS metric_matches,
                     ans.n_rows, ans.orderkey_sum, ans.cents_sum,
                     TRUE AS identical_to_full
              FROM cnt, ans""")),

    // Q104 — TRANSPARENT manifest pruning (round-15 verdict task 1):
    // q98's table and predicate, but NOTHING handed to the reader — the
    // table is opened through ManifestFileIndex.manifestParquet and the
    // query is a PLAIN .where(...): the index derives the file probes
    // from the query's own pushed filters (the Delta/Iceberg
    // data-skipping shape), so the scan node's numFiles metric must
    // equal the oracle-replayed survivor count with zero opt-in, and
    // the answer must stay row-for-row the full scan's. The conservatism
    // direction (an unprunable predicate reads ALL files) is
    // ManifestFileIndexSpec's pin.
    Entry(
      "q104_transparent_prune",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q104").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          val man = Layout.writeWithManifest(ord, order, 16, dir,
            Seq("o_date", "o_custkey"))
          val t = graft.sources.ManifestFileIndex.manifestParquet(
            s, dir, man)
          val lo = lit("1995-07-01").cast("date")
          val hi = lit("1995-10-01").cast("date")
          val rowPred = col("o_date") >= lo && col("o_date") < hi
          def agg3(df: org.apache.spark.sql.DataFrame) = df.where(rowPred)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val pruned = agg3(t)
          val p = pruned.collect()(0)
          // the metric from the executed plan of the PLAIN query itself
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val f = agg3(s.read.option("basePath", dir).parquet(dir))
            .collect()(0)
          val nSurvive = graft.sources.PrunedScan.survivorIds(man,
            Seq(graft.sources.RangeProbe("o_date", lo, hi))).length.toLong
          Seq((16L, nSurvive, filesRead, p.getLong(0), p.getLong(1),
            p.getLong(2),
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2),
            filesRead == nSurvive))
            .toDF("n_files_total", "files_survive", "files_read", "n_rows",
              "orderkey_sum", "cents_sum", "identical_to_full",
              "metric_matches")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_date) AS dmin, MAX(o_date) AS dmax
                         FROM a GROUP BY file_id),
                   sv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_survive FROM m
                          WHERE dmax >= DATE '1995-07-01' AND dmin < DATE '1995-10-01'),
                   q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                         FROM o
                         WHERE o_date >= DATE '1995-07-01' AND o_date < DATE '1995-10-01')
              SELECT CAST(16 AS BIGINT) AS n_files_total,
                     sv.n_survive AS files_survive,
                     sv.n_survive AS files_read,
                     q.n_rows, q.orderkey_sum, q.cents_sum,
                     TRUE AS identical_to_full,
                     TRUE AS metric_matches
              FROM sv, q""")),

    // Q105 — manifest ADOPTION (round-15 verdict task 2): the table is
    // written by a PLAIN df.write.parquet — no assignedWrite contract,
    // no file_id dirs, file split decided by Spark's range sampler — and
    // the manifest is harvested from the files' OWN FOOTERS (one
    // driver-side footer read per file, never a corpus scan), with file
    // identity derived from filenames. Because the sampler's file split
    // is not engine-replayable, the oracle hash-checks the ANSWER (must
    // equal the plain table's) while the structural pins are computed
    // in-entry from two independent paths and must come out TRUE:
    // footer stats == per-actual-file recomputation over input_file_name
    // (footer_matches_data), scan-node numFiles == the footer manifest's
    // survivor count (metric_matches), and strictly fewer files than the
    // table holds were read (pruned_strictly).
    Entry(
      "q105_footer_prune",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q105").toString
        try {
          val dir = s"$tmp/orders"
          ord.repartitionByRange(16, col("o_date"), col("o_orderkey"))
            .sortWithinPartitions("o_date", "o_orderkey")
            .write.parquet(dir)
          val man = graft.sources.FooterManifest
            .fromFooters(s, dir, Seq("o_date"))
            .localCheckpoint(true)
          val nFiles = man.count()
          // independent recomputation of the same stats FROM THE DATA,
          // keyed by the actual file each row came back from
          val byFile = s.read.parquet(dir)
            .groupBy(input_file_name().as("f"))
            .agg(count(lit(1)).as("n_rows"),
              min(col("o_date")).as("o_date_min"),
              max(col("o_date")).as("o_date_max"),
              sum(when(col("o_date").isNull, 1L).otherwise(0L))
                .as("o_date_nulls"))
            .collect()
            .map(r => new org.apache.hadoop.fs.Path(r.getString(0))
              .toUri.getPath ->
              (r.getLong(1), r.getDate(2), r.getDate(3), r.getLong(4)))
            .toMap
          val footerMatches = man
            .select("path", "n_rows", "o_date_min", "o_date_max",
              "o_date_nulls")
            .collect().forall { r =>
              byFile.get(r.getString(0)).contains(
                (r.getLong(1), r.getDate(2), r.getDate(3), r.getLong(4)))
            } && byFile.size == nFiles
          val lo = lit("1995-07-01").cast("date")
          val hi = lit("1995-10-01").cast("date")
          val probes = Seq(graft.sources.RangeProbe("o_date", lo, hi))
          val rowPred = col("o_date") >= lo && col("o_date") < hi
          val pruned = graft.sources.PrunedScan
            .prunedParquetPaths(s, dir, man, probes)
            .where(rowPred)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val p = pruned.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val nSurvive = graft.sources.PrunedScan
            .survivorIds(man, probes).length.toLong
          val f = s.read.parquet(dir).where(rowPred)
            .agg(count(lit(1)), sum(col("o_orderkey")),
              sum(round(col("o_totalprice") * 100).cast("long")))
            .collect()(0)
          Seq((p.getLong(0), p.getLong(1), p.getLong(2),
            footerMatches,
            filesRead == nSurvive,
            filesRead < nFiles,
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2)))
            .toDF("n_rows", "orderkey_sum", "cents_sum",
              "footer_matches_data", "metric_matches", "pruned_strictly",
              "identical_to_full")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
                     TRUE AS footer_matches_data,
                     TRUE AS metric_matches,
                     TRUE AS pruned_strictly,
                     TRUE AS identical_to_full
              FROM orders
              WHERE CAST(o_orderdate AS DATE) >= DATE '1995-07-01'
                AND CAST(o_orderdate AS DATE) < DATE '1995-10-01'""")),

    // Q104B — transparent pruning through a DISJUNCTION (round-16
    // verdict task 2): q104's table, but the plain .where is
    // `range-OR-range` — the second-most-common predicate shape after
    // conjunctions, which round 15's index read every file for. The
    // index now expands a translatable OR to the union of its branches'
    // survivor sets (bounded DNF), so the scan's numFiles must equal the
    // oracle-replayed SIZE OF THE UNION, and the answer must stay
    // row-for-row the full scan's. The poisoned direction (one
    // untranslatable branch reads everything) is ManifestFileIndexSpec's
    // pin.
    Entry(
      "q104b_or_prune",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q104b").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          val man = Layout.writeWithManifest(ord, order, 16, dir,
            Seq("o_date"))
          val t = graft.sources.ManifestFileIndex.manifestParquet(
            s, dir, man)
          val (lo1, hi1) = (lit("1994-02-01").cast("date"),
            lit("1994-04-01").cast("date"))
          val (lo2, hi2) = (lit("1997-06-01").cast("date"),
            lit("1997-08-01").cast("date"))
          val orPred = (col("o_date") >= lo1 && col("o_date") < hi1) ||
            (col("o_date") >= lo2 && col("o_date") < hi2)
          def agg3(df: org.apache.spark.sql.DataFrame) = df.where(orPred)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val pruned = agg3(t)
          val p = pruned.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(pruned)
          val f = agg3(s.read.option("basePath", dir).parquet(dir))
            .collect()(0)
          // the union of the branches' survivor sets, replayed explicitly
          val sv1 = graft.sources.PrunedScan.survivorIds(man,
            Seq(graft.sources.RangeProbe("o_date", lo1, hi1))).toSet
          val sv2 = graft.sources.PrunedScan.survivorIds(man,
            Seq(graft.sources.RangeProbe("o_date", lo2, hi2))).toSet
          val nUnion = (sv1 union sv2).size.toLong
          Seq((16L, nUnion, filesRead, p.getLong(0), p.getLong(1),
            p.getLong(2),
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2),
            filesRead == nUnion,
            nUnion < 16L))
            .toDF("n_files_total", "files_survive", "files_read", "n_rows",
              "orderkey_sum", "cents_sum", "identical_to_full",
              "metric_matches", "pruned_strictly")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_date) AS dmin, MAX(o_date) AS dmax
                         FROM a GROUP BY file_id),
                   sv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_survive FROM m
                          WHERE (dmax >= DATE '1994-02-01' AND dmin < DATE '1994-04-01')
                             OR (dmax >= DATE '1997-06-01' AND dmin < DATE '1997-08-01')),
                   q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                         FROM o
                         WHERE (o_date >= DATE '1994-02-01' AND o_date < DATE '1994-04-01')
                            OR (o_date >= DATE '1997-06-01' AND o_date < DATE '1997-08-01'))
              SELECT CAST(16 AS BIGINT) AS n_files_total,
                     sv.n_survive AS files_survive,
                     sv.n_survive AS files_read,
                     q.n_rows, q.orderkey_sum, q.cents_sum,
                     TRUE AS identical_to_full,
                     TRUE AS metric_matches,
                     sv.n_survive < 16 AS pruned_strictly
              FROM sv, q""")),

    // Q105B — Bloom sidecars at ADOPTION (round-16 verdict task 5):
    // q105's plain-written table (no file_id dirs, sampled split), but
    // the probe is EQUALITY ON A COLUMN THE LAYOUT DOES NOT SORT —
    // footer min/max alone cannot prune it (every file's custkey box
    // spans ~the whole domain: q97's honest failure case, reopened for
    // adopted tables). FooterManifest.bloomSidecar closes it with ONE
    // declared column-pruned data pass; the whole table then round-trips
    // through GraftTable.adopt → Sources.graftTable, so the equality
    // .where is a PLAIN filter over a path-opened table. Pins: scan
    // numFiles == the Bloom-sharpened survivor count, strictly below
    // both the file count and the min/max-only count; answer == the
    // plain reader's (hash-checked).
    Entry(
      "q105b_adopt_bloom",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q105b").toString
        try {
          val dir = s"$tmp/orders"
          ord.repartitionByRange(16, col("o_date"), col("o_orderkey"))
            .sortWithinPartitions("o_date", "o_orderkey")
            .write.parquet(dir)
          val (mBits, k) = (131072, 4)
          // the adopt (sidecar write) and the entry's own audit replay
          // (footer manifest + bloom pass further down) read only the
          // already-written data files — run adopt concurrently with the
          // probe-key lookup (round-17, guide §5 driver floor)
          import scala.concurrent.{Await, Future, ExecutionContext}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val adoptF = Future(
            graft.sources.GraftTable.adopt(s, dir, Seq("o_date", "o_custkey"),
              bloomCols = Seq(("o_custkey", mBits, k))))
          // deterministic probe key: the custkey of the minimum orderkey
          val probeKey = ord.orderBy(col("o_orderkey").asc).limit(1)
            .select(col("o_custkey").cast("long")).collect()(0).getLong(0)
          Await.result(adoptF, Duration.Inf)
          // reopen FROM THE PATH ALONE — nothing handed over
          val t = graft.sources.Sources.graftTable(s, dir)
          val q = t.where(col("o_custkey") === probeKey)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val p = q.collect()(0)
          val filesRead = graft.sources.PrunedScan.filesRead(q)
          val f = s.read.parquet(dir)
            .where(col("o_custkey") === probeKey)
            .agg(count(lit(1)), sum(col("o_orderkey")),
              sum(round(col("o_totalprice") * 100).cast("long")))
            .collect()(0)
          // replay both survivor counts from the same persisted manifest
          val man = graft.sources.FooterManifest
            .fromFooters(s, dir, Seq("o_custkey")).localCheckpoint(true)
          val nFiles = man.count()
          val probes = Seq(graft.sources.EqualProbe("o_custkey", lit(probeKey)))
          val minmaxSv = graft.sources.PrunedScan
            .survivorIds(man, probes).length.toLong
          val regs = graft.sources.FooterManifest
            .bloomSidecar(s, dir, man, "o_custkey", mBits, k)
            .localCheckpoint(true)
          val bloomSv = graft.sources.PrunedScan.survivorIds(man, probes,
            Map("o_custkey" ->
              graft.sources.BloomSidecar(regs, mBits, k))).length.toLong
          Seq((p.getLong(0), p.getLong(1), p.getLong(2),
            filesRead == bloomSv,
            bloomSv < minmaxSv,
            filesRead < nFiles,
            p.getLong(0) == f.getLong(0) && p.getLong(1) == f.getLong(1) &&
              p.getLong(2) == f.getLong(2)))
            .toDF("n_rows", "orderkey_sum", "cents_sum",
              "metric_matches", "bloom_sharpens", "pruned_strictly",
              "identical_to_full")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH pk AS (SELECT o_custkey AS ck FROM orders
                          ORDER BY o_orderkey LIMIT 1)
              SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
                     TRUE AS metric_matches,
                     TRUE AS bloom_sharpens,
                     TRUE AS pruned_strictly,
                     TRUE AS identical_to_full
              FROM orders, pk
              WHERE o_custkey = pk.ck""")),

    // Q106 — SELF-DESCRIBING graft table (round-16 verdict task 1, the
    // judge's top-next): GraftTable.write persists manifest + Bloom
    // sidecars + shapes under <dir>/_graft_manifest/, and
    // Sources.graftTable reopens the fully-pruned frame FROM THE PATH
    // ALONE — the _delta_log shape, what a second session or SQL-only
    // user needs. The entry writes, REOPENS BY PATH (zero handed-over
    // state), and pins: (a) a plain range .where reads exactly the
    // oracle-replayed survivor count (assignedWrite is deterministic, so
    // DuckDB replays it); (b) a plain equality .where on the UNSORTED
    // column is sharpened by the persisted Bloom sidecar (reads < all
    // files); (c) staleness is fail-loud — an out-of-band file refuses
    // to open until removed (GraftTableSpec pins refresh). Answers
    // hash-checked against the plain table.
    Entry(
      "q106_graft_table",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q106").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          graft.sources.GraftTable.write(s, ord, order, 16, dir,
            Seq("o_date", "o_custkey"),
            bloomCols = Seq(("o_custkey", 131072, 4)))
          val t = graft.sources.Sources.graftTable(s, dir)
          // (a) range on the sort column — survivor count replayable
          val lo = lit("1995-07-01").cast("date")
          val hi = lit("1995-10-01").cast("date")
          val rq = t.where(col("o_date") >= lo && col("o_date") < hi)
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("ok"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("ct"))
          val r = rq.collect()(0)
          val rangeFiles = graft.sources.PrunedScan.filesRead(rq)
          // (b) equality on the unsorted column — Bloom-sharpened
          val probeKey = ord.orderBy(col("o_orderkey").asc).limit(1)
            .select(col("o_custkey").cast("long")).collect()(0).getLong(0)
          val eq = t.where(col("o_custkey") === probeKey)
            .agg(count(lit(1)).as("n"))
          val eqRows = eq.collect()(0).getLong(0)
          val eqFiles = graft.sources.PrunedScan.filesRead(eq)
          // (c) fail-loud staleness: an out-of-band unit refuses to open
          Seq((0L, 0L, "1990-01-01", 0.0))
            .toDF("o_orderkey", "o_custkey", "o_date_s", "o_totalprice")
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_date_s").cast("date").as("o_date"),
              col("o_totalprice"))
            .coalesce(1).write.parquet(s"$dir/file_id=999")
          val staleDetected =
            try { graft.sources.Sources.graftTable(s, dir); false }
            catch { case e: IllegalStateException =>
              e.getMessage.contains("STALE") }
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
            s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(s"$dir/file_id=999"), true)
          val reopens = graft.sources.Sources.graftTable(s, dir)
            .where(col("o_date") >= lo && col("o_date") < hi)
          val reopenRows = reopens.count()
          val f = s.read.option("basePath", dir).parquet(dir)
            .where(col("o_date") >= lo && col("o_date") < hi)
            .agg(count(lit(1)), sum(col("o_orderkey")),
              sum(round(col("o_totalprice") * 100).cast("long")))
            .collect()(0)
          Seq((16L, rangeFiles, r.getLong(0), r.getLong(1), r.getLong(2),
            eqRows, eqFiles < 16L, staleDetected,
            reopenRows == r.getLong(0),
            r.getLong(0) == f.getLong(0) && r.getLong(1) == f.getLong(1) &&
              r.getLong(2) == f.getLong(2)))
            .toDF("n_files_total", "files_read", "n_rows", "orderkey_sum",
              "cents_sum", "eq_rows", "bloom_pruned", "stale_detected",
              "reopen_consistent", "identical_to_full")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                                CAST(o_orderdate AS DATE) AS o_date, o_totalprice
                         FROM orders),
                   r AS (SELECT *, row_number() OVER (ORDER BY o_date, o_orderkey) AS rn,
                                COUNT(*) OVER () AS n
                         FROM o),
                   a AS (SELECT *, (rn - 1) * 16 // n AS file_id FROM r),
                   m AS (SELECT file_id, MIN(o_date) AS dmin, MAX(o_date) AS dmax
                         FROM a GROUP BY file_id),
                   sv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_survive FROM m
                          WHERE dmax >= DATE '1995-07-01' AND dmin < DATE '1995-10-01'),
                   pk AS (SELECT o_custkey AS ck FROM o
                          ORDER BY o_orderkey LIMIT 1),
                   eqq AS (SELECT CAST(COUNT(*) AS BIGINT) AS eq_rows
                           FROM o, pk WHERE o.o_custkey = pk.ck),
                   q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                                CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
                                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
                         FROM o
                         WHERE o_date >= DATE '1995-07-01' AND o_date < DATE '1995-10-01')
              SELECT CAST(16 AS BIGINT) AS n_files_total,
                     sv.n_survive AS files_read,
                     q.n_rows, q.orderkey_sum, q.cents_sum,
                     eqq.eq_rows,
                     TRUE AS bloom_pruned,
                     TRUE AS stale_detected,
                     TRUE AS reopen_consistent,
                     TRUE AS identical_to_full
              FROM sv, q, eqq""")),

    // Q107 — MANIFEST-SERVED exact aggregates (round-16 verdict task 3):
    // the persisted manifest already carries exact per-file n_rows +
    // min/max/null counts, so COUNT(*)/MIN/MAX/COUNT(c) queries need no
    // scan at all — GraftTable.aggregate answers them from the sidecar
    // and returns a LITERAL row whose executed plan reads ZERO files
    // (files_read pinned), null-count-aware for MIN/MAX by SQL
    // semantics. matches_scan pins the answer against a full-scan
    // recomputation in-entry; the oracle recomputes it from the raw
    // table — the q88 estimator promoted to an exact fast path.
    Entry(
      "q107_manifest_agg",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q107").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          graft.sources.GraftTable.write(s, ord, order, 16, dir,
            Seq("o_date", "o_custkey"))
          val ans = graft.sources.GraftTable.aggregate(s, dir,
            Seq("o_date", "o_custkey"))
          val a = ans.collect()(0)
          // the executed answer's own plan: a LocalRelation — zero files
          val filesRead = graft.sources.PrunedScan.filesRead(ans)
          val f = s.read.option("basePath", dir).parquet(dir)
            .agg(count(lit(1)), min(col("o_date")), max(col("o_date")),
              min(col("o_custkey")), max(col("o_custkey")),
              count(col("o_custkey")))
            .collect()(0)
          val matches =
            a.getLong(0) == f.getLong(0) &&
              a.getDate(1) == f.getDate(1) && a.getDate(2) == f.getDate(2) &&
              a.getLong(5) == f.getLong(3) && a.getLong(6) == f.getLong(4) &&
              a.getLong(8) == f.getLong(5)
          Seq((a.getLong(0), a.getDate(1).toString, a.getDate(2).toString,
            a.getLong(5), a.getLong(6), a.getLong(7), a.getLong(8),
            filesRead, matches))
            .toDF("n_rows", "date_min", "date_max", "ck_min", "ck_max",
              "ck_nulls", "ck_count", "files_read", "matches_scan")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS date_min,
                     CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS date_max,
                     CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
                     CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
                     CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS ck_nulls,
                     CAST(COUNT(o_custkey) AS BIGINT) AS ck_count,
                     CAST(0 AS BIGINT) AS files_read,
                     TRUE AS matches_scan
              FROM orders""")),

    // Q107B — metadata-only aggregates made TRANSPARENT: q107's served
    // answers through a PLAIN spark.sql over the path-opened table — the
    // ManifestAggRewrite optimizer rule (installed automatically when a
    // manifest index is constructed) rewrites the whole-table
    // COUNT/MIN/MAX aggregate to a one-row LocalRelation, so the
    // executed plan reads ZERO files (pinned) — Spark's
    // OptimizeMetadataOnlyQuery idea extended from partition columns to
    // every manifest-covered column. Conservatism (filters / GROUP BY /
    // DISTINCT / expressions decline) is ManifestAggRewriteSpec's pin.
    Entry(
      "q107b_sql_manifest_agg",
      (s, d) => {
        import s.implicits._
        val ord = Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q107b").toString
        try {
          val dir = s"$tmp/orders"
          val order = Seq(col("o_date").asc, col("o_orderkey").asc)
          graft.sources.GraftTable.write(s, ord, order, 16, dir,
            Seq("o_date", "o_custkey"))
          graft.sources.Sources.graftTable(s, dir)
            .createOrReplaceTempView("q107b_t")
          try {
            val q = s.sql(
              """SELECT COUNT(*) AS n_rows,
                        CAST(MIN(o_date) AS STRING) AS date_min,
                        CAST(MAX(o_date) AS STRING) AS date_max,
                        MIN(o_custkey) AS ck_min,
                        MAX(o_custkey) AS ck_max,
                        COUNT(o_custkey) AS ck_count
                 FROM q107b_t""")
            val r = q.collect()(0)
            val filesRead = graft.sources.PrunedScan.filesRead(q)
            val f = s.read.option("basePath", dir).parquet(dir)
              .agg(count(lit(1)), min(col("o_date")).cast("string"),
                max(col("o_date")).cast("string"),
                min(col("o_custkey")), max(col("o_custkey")),
                count(col("o_custkey")))
              .collect()(0)
            Seq((r.getLong(0), r.getString(1), r.getString(2),
              r.getLong(3), r.getLong(4), r.getLong(5), filesRead,
              (0 until 6).forall(i => r.get(i) == f.get(i))))
              .toDF("n_rows", "date_min", "date_max", "ck_min", "ck_max",
                "ck_count", "files_read", "matches_scan")
          } finally s.catalog.dropTempView("q107b_t")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS date_min,
                     CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS date_max,
                     CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
                     CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
                     CAST(COUNT(o_custkey) AS BIGINT) AS ck_count,
                     CAST(0 AS BIGINT) AS files_read,
                     TRUE AS matches_scan
              FROM orders""")),

    // Q108 — ZERO-PASS join routing (round-16 verdict task 4): q99's
    // decision table, but the big side's MG key summary comes from the
    // PERSISTED per-file sidecar (merged by the mergeable-summaries
    // rule) and the small side's row count from its manifest — the
    // decide phase provably scans NEITHER corpus
    // (decide_corpus_files == 0, from the executed decide inputs' own
    // plans via corpusFilesRead). Routes are pinned: the MG merge error
    // budget (≤ 2n/65 across build+merge) cannot flip a 1/3-share
    // planted skew below the 0.2 threshold nor lift a <1% balanced top
    // share above it. The routed join itself runs through
    // autoJoinFromManifest and its aggregate is hash-checked against the
    // plain join.
    Entry(
      "q108_manifest_route",
      (s, d) => {
        import s.implicits._
        val ev = Tables.load(s, d, "events")
          .select(col("event_id"), col("user_id"))
          .withColumn("skew_key",
            when(pmod(col("user_id"), lit(3)) === 0, lit(-1L))
              .otherwise(col("user_id")))
        val cust = Tables.load(s, d, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-q108").toString
        try {
          val bigDir = s"$tmp/events"
          val smallDir = s"$tmp/customer"
          graft.sources.GraftTable.write(s, ev,
            Seq(col("user_id").asc, col("event_id").asc), 8, bigDir,
            Seq("user_id"),
            mgKeys = Seq((Seq("user_id"), 64), (Seq("skew_key"), 64)))
          graft.sources.GraftTable.write(s, cust,
            Seq(col("user_id").asc), 4, smallDir, Seq("user_id"))
          // decide phase: planner state only
          val mgU = graft.sources.GraftTable
            .keyFreqSummary(s, bigDir, Seq("user_id"))
          val mgS = graft.sources.GraftTable
            .keyFreqSummary(s, bigDir, Seq("skew_key"))
          val smallRows = graft.sources.GraftTable.rowCount(s, smallDir)
          val smallNDf = Seq(smallRows).toDF("n")
          mgU.collect(); mgS.collect()
          val decideCorpusFiles =
            graft.sources.PrunedScan.corpusFilesRead(mgU) +
              graft.sources.PrunedScan.corpusFilesRead(mgS)
          val d1 = SkewJoin.decide(mgU, smallNDf, 1000000L, 0.2, 8)
          val d2 = SkewJoin.decide(mgS, smallNDf, 10L, 0.2, 8)
          val d3 = SkewJoin.decide(mgU, smallNDf, 10L, 0.2, 8)
          // the one-call routed join, answer vs the plain join
          val (joined, dec) = SkewJoin.autoJoinFromManifest(
            s, bigDir, smallDir, Seq("user_id"),
            broadcastRowLimit = 1000000L)
          val j = joined.agg(count(lit(1)).as("n"),
            sum(col("event_id")).as("es")).collect()(0)
          val pj = ev.join(cust, Seq("user_id"))
            .agg(count(lit(1)), sum(col("event_id"))).collect()(0)
          Seq((d1.route, d2.route, d3.route,
            smallRows, d1.bigRows, decideCorpusFiles,
            d2.topKeyShareLb >= 0.2, d3.topKeyShareLb < 0.2,
            j.getLong(0), j.getLong(1), dec.route,
            j.getLong(0) == pj.getLong(0) && j.getLong(1) == pj.getLong(1)))
            .toDF("route_broadcast", "route_salted", "route_shuffle",
              "small_rows", "big_rows", "decide_corpus_files",
              "skew_lb_above", "balanced_lb_below",
              "join_rows", "join_ev_sum", "route_used", "join_matches")
        } finally {
          val root = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      },
      Some("""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS big FROM events),
                   c AS (SELECT CAST(COUNT(*) AS BIGINT) AS small FROM customer),
                   j AS (SELECT CAST(COUNT(*) AS BIGINT) AS join_rows,
                                CAST(SUM(e.event_id) AS BIGINT) AS join_ev_sum
                         FROM events e JOIN customer cu ON e.user_id = cu.c_custkey)
              SELECT 'broadcast' AS route_broadcast,
                     'salted' AS route_salted,
                     'shuffle' AS route_shuffle,
                     c.small AS small_rows,
                     n.big AS big_rows,
                     CAST(0 AS BIGINT) AS decide_corpus_files,
                     TRUE AS skew_lb_above,
                     TRUE AS balanced_lb_below,
                     j.join_rows, j.join_ev_sum,
                     'broadcast' AS route_used,
                     TRUE AS join_matches
              FROM n, c, j""")),

    // Q100-Q103 — the sketch algebra REGISTERED AS SQL AGGREGATES
    // (functions/SketchSql.scala, round-14 verdict task 7): the cube
    // family (q93-q96) was DataFrame-only; these entries pin the SQL
    // surface — one BUILD and one MERGE/ROLLUP per algebra, written
    // entirely in spark.sql over the registered udafs, exploded back to
    // register rows and hash-checked against the same generated DuckDB
    // replays the relational operators use. SketchSqlSpec pins the
    // stronger claim (SQL rows == DataFrame-operator rows exactly).
    Entry(
      "q100_hll_sql",
      (s, d) => {
        graft.functions.SketchSql.register(s, hllP = 8)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus, o_orderpriority,
                               hll_regs(CAST(o_custkey AS STRING)) AS regs
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1, 2),
               roll AS (SELECT o_orderstatus, hll_merge_regs(regs) AS regs
                        FROM fine GROUP BY 1)
          SELECT 'fine' AS lvl, o_orderstatus, o_orderpriority,
                 CAST(pos AS BIGINT) AS _bucket, CAST(r AS BIGINT) AS _rank
          FROM fine LATERAL VIEW posexplode(regs) t AS pos, r WHERE r > 0
          UNION ALL
          SELECT 'roll', o_orderstatus, 'ALL',
                 CAST(pos AS BIGINT), CAST(r AS BIGINT)
          FROM roll LATERAL VIEW posexplode(regs) t AS pos, r WHERE r > 0""")
      },
      Some("""WITH h AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   regs AS (SELECT st, pr, h >> 48 AS b,
                                   CAST(MAX(49 - length(regexp_replace(bin(h & ((1::BIGINT << 48) - 1)), '^0+', ''))) AS BIGINT) AS r
                            FROM h GROUP BY 1, 2, 3)
              SELECT 'fine' AS lvl, st AS o_orderstatus, pr AS o_orderpriority,
                     b AS _bucket, r AS _rank
              FROM regs
              UNION ALL
              SELECT 'roll', st, 'ALL', b, MAX(r) FROM regs GROUP BY st, b""")),

    Entry(
      "q101_cms_sql",
      (s, d) => {
        graft.functions.SketchSql.register(s, cmsDepth = 4, cmsWidth = 64)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               cms_regs(CAST(o_custkey AS STRING)) AS regs
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT cms_merge_regs(regs) AS regs FROM fine)
          SELECT 'fine' AS lvl, o_orderstatus,
                 CAST(pos DIV 64 AS BIGINT) AS _row,
                 CAST(pos % 64 AS BIGINT) AS _bucket, c AS _cnt
          FROM fine LATERAL VIEW posexplode(regs) t AS pos, c WHERE c > 0
          UNION ALL
          SELECT 'roll', 'ALL', CAST(pos DIV 64 AS BIGINT),
                 CAST(pos % 64 AS BIGINT), c
          FROM roll LATERAL VIEW posexplode(regs) t AS pos, c WHERE c > 0""")
      },
      Some("""WITH v AS (SELECT o_orderstatus AS st, o_custkey
                         FROM orders WHERE o_custkey IS NOT NULL),
                   e AS (SELECT st, rr.i AS r,
                                ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS b
                         FROM v CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rr),
                   regs AS (SELECT st, r, b, CAST(COUNT(*) AS BIGINT) AS c
                            FROM e GROUP BY 1, 2, 3)
              SELECT 'fine' AS lvl, st AS o_orderstatus,
                     CAST(r AS BIGINT) AS _row, b AS _bucket, c AS _cnt
              FROM regs
              UNION ALL
              SELECT 'roll', 'ALL', CAST(r AS BIGINT), b, CAST(SUM(c) AS BIGINT)
              FROM regs GROUP BY r, b""")),

    Entry(
      "q102_kmv_sql",
      (s, d) => {
        graft.functions.SketchSql.register(s, kmvK = 64)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               kmv_sketch(CAST(o_custkey AS STRING)) AS sk
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT kmv_merge_sketch(sk) AS sk FROM fine)
          SELECT 'fine' AS lvl, o_orderstatus, h AS _h
          FROM fine LATERAL VIEW explode(sk) t AS h
          UNION ALL
          SELECT 'roll', 'ALL', h
          FROM roll LATERAL VIEW explode(sk) t AS h""")
      },
      Some("""WITH h AS (SELECT DISTINCT o_orderstatus AS st,
                                ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   rk AS (SELECT st, h,
                                 row_number() OVER (PARTITION BY st ORDER BY h) AS rn
                          FROM h),
                   fine AS (SELECT st, h FROM rk WHERE rn <= 64),
                   grk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
                           FROM (SELECT DISTINCT h FROM fine))
              SELECT 'fine' AS lvl, st AS o_orderstatus, h AS _h FROM fine
              UNION ALL
              SELECT 'roll', 'ALL', h FROM grk WHERE rn <= 64""")),

    Entry(
      "q103_kll_sql",
      (s, d) => {
        graft.functions.SketchSql.register(s, kllBuckets = 4, kllK = 32,
          kllRounds = 10, kllSalt = "sqlk", kllSweepRounds = 16)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               kll_regs(CAST(o_orderkey AS STRING),
                                        CAST(o_totalprice AS DOUBLE)) AS regs
                        FROM orders_sksql WHERE o_totalprice IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT kll_merge_regs(regs) AS regs FROM fine)
          SELECT 'fine' AS lvl, o_orderstatus,
                 CAST(r.level AS BIGINT) AS _level, r.value AS _value
          FROM fine LATERAL VIEW explode(regs) t AS r
          UNION ALL
          SELECT 'roll', 'ALL', CAST(r.level AS BIGINT), r.value
          FROM roll LATERAL VIEW explode(regs) t AS r""")
      },
      Some(s"""WITH
        ${Kll.buildSql(
          "SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders",
          Seq("o_orderstatus"), "o_totalprice", "o_orderkey",
          buckets = 4, k = 32, rounds = 10, salt = "sqlk", p = "k")},
        ${Kll.rollupSql("kreg", Nil, 32, 16, "sqlk", "r")}
        SELECT 'fine' AS lvl, o_orderstatus,
               CAST(_level AS BIGINT) AS _level, _value
        FROM kreg
        UNION ALL
        SELECT 'roll', 'ALL', CAST(_level AS BIGINT), _value FROM rreg""")),

    // Q100B-Q103B — SQL ESTIMATE finishers (round-16 verdict task 7):
    // q100–q103 registered the sketch BUILD/MERGE aggregates, but
    // estimation still required the DataFrame operators — a pure
    // spark.sql user could build a sketch cube and not serve it. These
    // entries pin the scalar finishers (hll_est / cms_est / kmv_est /
    // kll_quantile, SketchSql.register): build AND estimate written
    // entirely in SQL, hash-checked against the same generated DuckDB
    // replays the relational estimators use (the arithmetic is
    // bit-identical — integer harmonic folds, same literal products, the
    // house ROUND(x + 1e-9, 6) at the output boundary).
    Entry(
      "q100b_hll_sql_est",
      (s, d) => {
        graft.functions.SketchSql.register(s, hllP = 8)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus, o_orderpriority,
                               hll_regs(CAST(o_custkey AS STRING)) AS regs
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1, 2),
               roll AS (SELECT o_orderstatus, hll_merge_regs(regs) AS regs
                        FROM fine GROUP BY 1)
          SELECT 'fine' AS lvl, o_orderstatus, o_orderpriority,
                 ROUND(hll_est(regs) + 1e-9, 6) AS hll_distinct
          FROM fine
          UNION ALL
          SELECT 'roll', o_orderstatus, 'ALL',
                 ROUND(hll_est(regs) + 1e-9, 6)
          FROM roll""")
      },
      Some("""WITH h AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
                                ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   regs AS (SELECT st, pr, h >> 48 AS b,
                                   MAX(49 - length(regexp_replace(bin(h & ((1::BIGINT << 48) - 1)), '^0+', ''))) AS r
                            FROM h GROUP BY 1, 2, 3),
                   ff AS (SELECT st, pr, COUNT(*) AS ne,
                                 SUM(1::BIGINT << (49 - r)) AS s
                          FROM regs GROUP BY 1, 2),
                   rregs AS (SELECT st, b, MAX(r) AS r FROM regs GROUP BY 1, 2),
                   rf AS (SELECT st, COUNT(*) AS ne,
                                 SUM(1::BIGINT << (49 - r)) AS s
                          FROM rregs GROUP BY 1),
                   fe AS (SELECT st, pr,
                                 CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256 * 562949953421312
                                   / CAST((256 - ne) * 562949953421312 + s AS DOUBLE) AS e0,
                                 256 - ne AS v
                          FROM ff),
                   re AS (SELECT st,
                                 CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256 * 562949953421312
                                   / CAST((256 - ne) * 562949953421312 + s AS DOUBLE) AS e0,
                                 256 - ne AS v
                          FROM rf)
              SELECT 'fine' AS lvl, st AS o_orderstatus, pr AS o_orderpriority,
                     ROUND(CASE WHEN e0 <= 640.0 AND v > 0
                                THEN 256.0 * ln(256 / CAST(v AS DOUBLE))
                                ELSE e0 END + 1e-9, 6) AS hll_distinct
              FROM fe
              UNION ALL
              SELECT 'roll', st, 'ALL',
                     ROUND(CASE WHEN e0 <= 640.0 AND v > 0
                                THEN 256.0 * ln(256 / CAST(v AS DOUBLE))
                                ELSE e0 END + 1e-9, 6)
              FROM re""")),

    Entry(
      "q101b_cms_sql_est",
      (s, d) => {
        graft.functions.SketchSql.register(s, cmsDepth = 4, cmsWidth = 64)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               cms_regs(CAST(o_custkey AS STRING)) AS regs
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT cms_merge_regs(regs) AS regs FROM fine),
               probes AS (SELECT explode(sequence(1, 20)) AS ck)
          SELECT 'fine' AS lvl, o_orderstatus, CAST(ck AS BIGINT) AS ck,
                 cms_est(regs, CAST(ck AS STRING)) AS cms_count
          FROM fine CROSS JOIN probes
          UNION ALL
          SELECT 'roll', 'ALL', CAST(ck AS BIGINT),
                 cms_est(regs, CAST(ck AS STRING))
          FROM roll CROSS JOIN probes""")
      },
      Some("""WITH v AS (SELECT o_orderstatus AS st, o_custkey
                         FROM orders WHERE o_custkey IS NOT NULL),
                   e AS (SELECT st, rr.i AS r,
                                ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS b
                         FROM v CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rr),
                   regs AS (SELECT st, r, b, CAST(COUNT(*) AS BIGINT) AS c
                            FROM e GROUP BY 1, 2, 3),
                   rregs AS (SELECT r, b, CAST(SUM(c) AS BIGINT) AS c
                             FROM regs GROUP BY 1, 2),
                   pb AS (SELECT pr.ck, rr.i AS r,
                                 ('0x' || substr(md5(CAST(rr.i AS VARCHAR) || ':' || CAST(pr.ck AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 64 AS b
                          FROM (SELECT unnest(range(1, 21)) AS ck) pr
                          CROSS JOIN (SELECT unnest(range(0, 4)) AS i) rr),
                   fest AS (SELECT s.st, pb.ck,
                                   CAST(MIN(COALESCE(regs.c, 0)) AS BIGINT) AS cms_count
                            FROM (SELECT DISTINCT st FROM v) s
                            CROSS JOIN pb
                            LEFT JOIN regs ON regs.st = s.st
                                          AND regs.r = pb.r AND regs.b = pb.b
                            GROUP BY 1, 2),
                   rest AS (SELECT pb.ck,
                                   CAST(MIN(COALESCE(rregs.c, 0)) AS BIGINT) AS cms_count
                            FROM pb LEFT JOIN rregs
                              ON rregs.r = pb.r AND rregs.b = pb.b
                            GROUP BY 1)
              SELECT 'fine' AS lvl, st AS o_orderstatus,
                     CAST(ck AS BIGINT) AS ck, cms_count
              FROM fest
              UNION ALL
              SELECT 'roll', 'ALL', CAST(ck AS BIGINT), cms_count
              FROM rest""")),

    Entry(
      "q102b_kmv_sql_est",
      (s, d) => {
        graft.functions.SketchSql.register(s, kmvK = 64)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               kmv_sketch(CAST(o_custkey AS STRING)) AS sk
                        FROM orders_sksql WHERE o_custkey IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT kmv_merge_sketch(sk) AS sk FROM fine)
          SELECT 'fine' AS lvl, o_orderstatus,
                 ROUND(kmv_est(sk) + 1e-9, 6) AS kmv_distinct
          FROM fine
          UNION ALL
          SELECT 'roll', 'ALL', ROUND(kmv_est(sk) + 1e-9, 6)
          FROM roll""")
      },
      Some("""WITH h AS (SELECT DISTINCT o_orderstatus AS st,
                                ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14))::UBIGINT::BIGINT AS h
                         FROM orders WHERE o_custkey IS NOT NULL),
                   rk AS (SELECT st, h,
                                 row_number() OVER (PARTITION BY st ORDER BY h) AS rn
                          FROM h),
                   fine AS (SELECT st, h FROM rk WHERE rn <= 64),
                   fest AS (SELECT st, COUNT(*) AS n, MAX(h) AS th
                            FROM fine GROUP BY 1),
                   grk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
                           FROM (SELECT DISTINCT h FROM fine)),
                   roll AS (SELECT h FROM grk WHERE rn <= 64),
                   rest AS (SELECT COUNT(*) AS n, MAX(h) AS th FROM roll)
              SELECT 'fine' AS lvl, st AS o_orderstatus,
                     ROUND(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                                ELSE CAST(63 AS DOUBLE) * CAST(72057594037927936 AS DOUBLE) / th END + 1e-9, 6) AS kmv_distinct
              FROM fest
              UNION ALL
              SELECT 'roll', 'ALL',
                     ROUND(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                                ELSE CAST(63 AS DOUBLE) * CAST(72057594037927936 AS DOUBLE) / th END + 1e-9, 6)
              FROM rest""")),

    Entry(
      "q103b_kll_sql_est",
      (s, d) => {
        graft.functions.SketchSql.register(s, kllBuckets = 4, kllK = 32,
          kllRounds = 10, kllSalt = "sqlk", kllSweepRounds = 16)
        Tables.load(s, d, "orders").createOrReplaceTempView("orders_sksql")
        s.sql("""
          WITH fine AS (SELECT o_orderstatus,
                               kll_regs(CAST(o_orderkey AS STRING),
                                        CAST(o_totalprice AS DOUBLE)) AS regs
                        FROM orders_sksql WHERE o_totalprice IS NOT NULL
                        GROUP BY 1),
               roll AS (SELECT kll_merge_regs(regs) AS regs FROM fine)
          SELECT 'fine' AS lvl, o_orderstatus,
                 ROUND(kll_quantile(regs, CAST(0.5 AS DOUBLE)) + 1e-9, 6) AS p50,
                 ROUND(kll_quantile(regs, CAST(0.9 AS DOUBLE)) + 1e-9, 6) AS p90
          FROM fine
          UNION ALL
          SELECT 'roll', 'ALL',
                 ROUND(kll_quantile(regs, CAST(0.5 AS DOUBLE)) + 1e-9, 6),
                 ROUND(kll_quantile(regs, CAST(0.9 AS DOUBLE)) + 1e-9, 6)
          FROM roll""")
      },
      Some(s"""WITH
        ${Kll.buildSql(
          "SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders",
          Seq("o_orderstatus"), "o_totalprice", "o_orderkey",
          buckets = 4, k = 32, rounds = 10, salt = "sqlk", p = "k")},
        ${Kll.rollupSql("kreg", Nil, 32, 16, "sqlk", "r")},
        ${Kll.estimateSql("kreg", Seq("o_orderstatus"),
          Seq(("p50", 0.5), ("p90", 0.9)), "f")},
        ${Kll.estimateSql("rreg", Nil,
          Seq(("p50", 0.5), ("p90", 0.9)), "g")}
        SELECT 'fine' AS lvl, a.o_orderstatus,
               ROUND(a.p50 + 1e-9, 6) AS p50,
               ROUND(b.p90 + 1e-9, 6) AS p90
        FROM f_p50 a JOIN f_p90 b USING (o_orderstatus)
        UNION ALL
        SELECT 'roll', 'ALL',
               ROUND(g_p50.p50 + 1e-9, 6), ROUND(g_p90.p90 + 1e-9, 6)
        FROM g_p50, g_p90""")),

    // Q90 — Poisson-bootstrap confidence intervals
    // (Experiment.poissonBootstrap): the resampling-free bootstrap — every
    // row contributes a content-derived Poisson(1) weight to each of 200
    // replicate means (inverse-CDF of a per-row md5 seed + per-replicate
    // Lehmer counter mix against the shared literal thresholds), so the
    // N×R expansion fuses into its map stage — one md5 per ROW, integer
    // arithmetic per replicate — and the only shuffle is groups ×
    // replicates partial rows; no per-replicate corpus resample anywhere.
    // Replicate means are
    // 6dp-rounded BEFORE quantile selection (cross-engine order becomes
    // exact), and the 95% percentile interval rides the exact grouped
    // quantile operator over the 3×200-row replicate frame.
    Entry(
      "q90_bootstrap_ci",
      (s, d) => Experiment.poissonBootstrap(
        Tables.load(s, d, "lineitem"), Seq("l_returnflag"),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"),
        replicates = 200, salt = "q90"),
      Some("""WITH b AS (SELECT l_returnflag AS g, l_extendedprice AS v,
                                ('0x' || substr(md5('q90:'
                                  || CASE WHEN l_orderkey IS NULL THEN 'n'
                                          ELSE 'v' || CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR)
                                               || '|' || CAST(l_orderkey AS VARCHAR) END
                                  || ':'
                                  || CASE WHEN l_linenumber IS NULL THEN 'n'
                                          ELSE 'v' || CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR)
                                               || '|' || CAST(l_linenumber AS VARCHAR) END), 1, 14))::UBIGINT::BIGINT
                                  % 2147483647 AS h
                         FROM lineitem WHERE l_extendedprice IS NOT NULL),
                   e AS (SELECT g, v, h, unnest(range(200)) AS r FROM b),
                   uw AS (SELECT g, v, r,
                                 ((48271 * ((48271 * ((h + r) % 2147483647)) % 2147483647)) % 2147483647)
                                   / 2147483647.0 AS u
                          FROM e),
                   w AS (SELECT g, r, v,
                                (u >= 0.36787944117144233)::BIGINT + (u >= 0.7357588823428847)::BIGINT
                              + (u >= 0.9196986029286058)::BIGINT + (u >= 0.9810118431238462)::BIGINT
                              + (u >= 0.9963401531726562)::BIGINT + (u >= 0.9994058151824182)::BIGINT
                              + (u >= 0.999916758850712)::BIGINT + (u >= 0.9999897508033254)::BIGINT
                              + (u >= 0.9999988747974021)::BIGINT AS w
                         FROM uw),
                   m AS (SELECT g, r, ROUND(SUM(w * v) / SUM(w) + 1e-9, 6) AS mr
                         FROM w GROUP BY g, r HAVING SUM(w) > 0),
                   ci AS (SELECT g, quantile_cont(mr, 0.025) AS ci_lo,
                                 quantile_cont(mr, 0.975) AS ci_hi
                          FROM m GROUP BY g),
                   pt AS (SELECT g, COUNT(*) AS n, ROUND(AVG(v) + 1e-9, 6) AS mean
                          FROM b GROUP BY g)
              SELECT pt.g AS l_returnflag, pt.n, pt.mean,
                     ROUND(ci.ci_lo + 1e-9, 6) AS ci_lo,
                     ROUND(ci.ci_hi + 1e-9, 6) AS ci_hi
              FROM pt JOIN ci USING (g)""")),

    // D20 — structured-record entity resolution (Dedup.entityPairs): the
    // multi-field fuzzy matcher the dedup family lacked — blocking on
    // (brand, first name char), per-field similarity (banded edit on the
    // name, token Jaccard on the name, null-safe brand equality, numeric
    // size closeness), weighted score, threshold. Records = parts plus
    // PLANTED variants (every 4th part re-enters with a one-char name
    // deletion and size+1 — the oracle replays the same planting), so the
    // matcher faces real fuzz, and d20b prices its recall against the
    // planted truth instead of guessing. Every sim is 6dp-rounded before
    // weighting and the threshold branches on the rounded score — the
    // round-then-branch discipline that makes the hash replay.
    Entry(
      "d20_entity_pairs",
      (s, d) => d20Pairs(s, d),
      Some(d20PairsSql() +
        """
          SELECT a_id, b_id, p_name_edit_sim, p_name_jaccard_sim,
                 p_brand_exact_sim, p_size_close_sim, score
          FROM sc WHERE score >= CAST('0.75' AS DOUBLE)""")),

    // D20b — the recall price of d20's blocking+threshold, via d18's
    // pair-set metrics against the planted truth: every (part, variant)
    // pair the matcher finds counts toward recall; same-name same-brand
    // genuine near-records it also surfaces price the precision honestly.
    Entry(
      "d20b_entity_recall",
      (s, d) => Dedup.pairSetMetrics(
        // pair-set-sized; three metric consumers would re-run the
        // blocked join per aggregate otherwise (the c12 judgments idiom)
        d20Pairs(s, d).localCheckpoint(true),
        Tables.load(s, d, "part")
          .filter(col("p_partkey") % 4 === 0)
          .select(col("p_partkey").as("a_id"),
            (col("p_partkey") + lit(1000000L)).as("b_id")),
        "a_id", "b_id"),
      Some(d20PairsSql() +
        """ ,
          pc AS (SELECT DISTINCT LEAST(a_id, b_id) AS _a, GREATEST(a_id, b_id) AS _b
                 FROM sc WHERE score >= CAST('0.75' AS DOUBLE)),
          tc AS (SELECT DISTINCT LEAST(p_partkey, p_partkey + 1000000) AS _a,
                        GREATEST(p_partkey, p_partkey + 1000000) AS _b
                 FROM p0 WHERE p_partkey % 4 = 0),
          np AS (SELECT COUNT(*) AS n_pred FROM pc),
          nt AS (SELECT COUNT(*) AS n_truth FROM tc),
          nb AS (SELECT COUNT(*) AS n_both
                 FROM (SELECT * FROM pc INTERSECT SELECT * FROM tc))
          SELECT n_pred, n_truth, n_both,
                 CASE WHEN n_pred > 0
                      THEN ROUND(n_both / CAST(n_pred AS DOUBLE) + 1e-9, 6) END AS precision,
                 CASE WHEN n_truth > 0
                      THEN ROUND(n_both / CAST(n_truth AS DOUBLE) + 1e-9, 6) END AS recall,
                 CASE WHEN n_pred > 0 AND n_truth > 0 AND n_both > 0
                      THEN ROUND(2.0 * (n_both / CAST(n_pred AS DOUBLE)) * (n_both / CAST(n_truth AS DOUBLE))
                                 / (n_both / CAST(n_pred AS DOUBLE) + n_both / CAST(n_truth AS DOUBLE)) + 1e-9, 6)
                 END AS f1
          FROM np, nt, nb""")),

    // D21 — cross-table record linkage (Dedup.entityLink): d20's
    // two-frame form — match a probe table (the planted variants, playing
    // an incoming feed) against a reference master table (part) instead
    // of deduplicating one table against itself. Same blocking, sims,
    // weighted score; every (probe, store) pair kept — the MDM-style
    // "which master record is this feed row?" lookup. Every planted
    // variant should find its original (d20b priced the recall of this
    // exact matcher at 0.972 — the misses are single-token names).
    Entry(
      "d21_record_linkage",
      (s, d) => {
        val p = Tables.load(s, d, "part")
          .select("p_partkey", "p_name", "p_brand", "p_size")
        val variants = p.filter(col("p_partkey") % 4 === 0).select(
          (col("p_partkey") + lit(1000000L)).as("p_partkey"),
          concat(substring(col("p_name"), 1, 1), expr("substring(p_name, 3)"))
            .as("p_name"),
          col("p_brand"), (col("p_size") + lit(1)).as("p_size"))
        Dedup.entityLink(variants, p, "p_partkey",
          Seq(col("p_brand"), substring(col("p_name"), 1, 1)),
          editFields = Seq("p_name" -> 0.4),
          jaccardFields = Seq("p_name" -> 0.2),
          exactFields = Seq("p_brand" -> 0.2),
          closeFields = Seq("p_size" -> 0.2),
          threshold = 0.75)
      },
      Some("""WITH p0 AS (SELECT p_partkey, p_name, p_brand, p_size FROM part),
                   vr AS (SELECT p_partkey + 1000000 AS p_partkey,
                                 substring(p_name, 1, 1) || substring(p_name, 3) AS p_name,
                                 p_brand, p_size + 1 AS p_size
                          FROM p0 WHERE p_partkey % 4 = 0),
                   ta AS (SELECT p_partkey AS id, p_brand,
                                 substring(p_name, 1, 1) AS nk,
                                 lower(trim(p_name)) AS nn,
                                 list_distinct([x for x in string_split_regex(lower(trim(p_name)), '\s+')
                                                if length(x) > 0]) AS toks,
                                 p_size
                          FROM vr),
                   tb AS (SELECT p_partkey AS id, p_brand,
                                 substring(p_name, 1, 1) AS nk,
                                 lower(trim(p_name)) AS nn,
                                 list_distinct([x for x in string_split_regex(lower(trim(p_name)), '\s+')
                                                if length(x) > 0]) AS toks,
                                 p_size
                          FROM p0),
                   c AS (SELECT a.id AS a_id, b.id AS b_id,
                                ROUND(CASE WHEN levenshtein(a.nn, b.nn) > 20 THEN 0.0
                                      ELSE 1.0 - CAST(levenshtein(a.nn, b.nn) AS DOUBLE)
                                           / GREATEST(length(a.nn), length(b.nn), 1) END + 1e-9, 6) AS p_name_edit_sim,
                                ROUND(CASE WHEN len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) = 0 THEN 1.0
                                      ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                                           / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) END + 1e-9, 6) AS p_name_jaccard_sim,
                                ROUND(CASE WHEN a.p_brand IS NOT DISTINCT FROM b.p_brand THEN 1.0 ELSE 0.0 END + 1e-9, 6) AS p_brand_exact_sim,
                                ROUND(CASE WHEN a.p_size IS NOT DISTINCT FROM b.p_size THEN 1.0
                                           WHEN a.p_size IS NULL OR b.p_size IS NULL THEN 0.0
                                      ELSE 1.0 - CAST(abs(a.p_size - b.p_size) AS DOUBLE)
                                           / GREATEST(abs(a.p_size), abs(b.p_size), 1) END + 1e-9, 6) AS p_size_close_sim
                         FROM ta a JOIN tb b
                           ON a.p_brand = b.p_brand AND a.nk = b.nk),
                   sc AS (SELECT *, ROUND((CAST('0.4' AS DOUBLE) * p_name_edit_sim +
                                           CAST('0.2' AS DOUBLE) * p_name_jaccard_sim +
                                           CAST('0.2' AS DOUBLE) * p_brand_exact_sim +
                                           CAST('0.2' AS DOUBLE) * p_size_close_sim)
                                          / CAST('1.0' AS DOUBLE) + 1e-9, 6) AS score
                          FROM c)
              SELECT a_id, b_id, p_name_edit_sim, p_name_jaccard_sim,
                     p_brand_exact_sim, p_size_close_sim, score
              FROM sc WHERE score >= CAST('0.75' AS DOUBLE)""")),

    // T51 — sentence-aware RAG chunking (TextAnalysis.sentenceChunks):
    // t22 cuts mid-sentence on raw token offsets; this packs WHOLE
    // sentences to a 20-token budget under the packSequences first-token
    // rule and re-carries 1 sentence of overlap between chunks. The
    // synthetic corpus has no punctuation (one "sentence" per doc), so
    // the entry PLANTS deterministic sentence ends — every
    // table/query/value token closes a sentence — which the oracle
    // replays verbatim; boundaries, budgets, and the carried overlap are
    // then all hash-pinned. Map-side only: sentence split + per-row array
    // folds + one explode — zero Exchange (TextAnalysisSpec pin).
    Entry(
      "t51_sentence_chunks",
      (s, d) => TextAnalysis.sentenceChunks(
        docs(s, d).withColumn("text",
          regexp_replace(col("text"), "(table|query|value)", "$1.")),
        "doc_id", "text", budgetTokens = 20, overlapSents = 1),
      Some("""WITH pre AS (SELECT doc_id,
                                  regexp_replace(text, '(table|query|value)', '\1.', 'g') AS text
                           FROM documents WHERE text IS NOT NULL),
                   s0 AS (SELECT doc_id,
                                 [trim(regexp_replace(x, '\s+', ' ', 'g'))
                                  for x in string_split_regex(lower(trim(text)), '[.!?]+')
                                  if regexp_matches(x, '[a-z0-9]')] AS s
                          FROM pre),
                   s1 AS (SELECT doc_id, s,
                                 [CAST(len(string_split(x, ' ')) AS BIGINT) for x in s] AS tc
                          FROM s0 WHERE len(s) > 0),
                   s2 AS (SELECT doc_id, s, tc,
                                 [CAST(COALESCE(list_sum(tc[1:i-1]), 0) AS BIGINT) // 20
                                  for i in range(1, len(tc) + 1)] AS cid
                          FROM s1),
                   x AS (SELECT doc_id, s, tc, cid,
                                unnest(list_distinct(cid)) AS chunk_id
                         FROM s2),
                   m AS (SELECT doc_id, chunk_id, s, tc,
                                [i for i in range(1, len(s) + 1)
                                 if cid[i] = chunk_id
                                    OR (i < len([c for c in cid if c < chunk_id]) + 1
                                        AND i >= len([c for c in cid if c < chunk_id]) + 1 - 1)] AS mi
                         FROM x)
              SELECT doc_id, chunk_id, CAST(mi[1] - 1 AS BIGINT) AS start_sent,
                     CAST(len(mi) AS BIGINT) AS n_sents,
                     CAST(list_sum([tc[i] for i in mi]) AS BIGINT) AS n_tokens,
                     array_to_string([s[i] for i in mi], ' ') AS chunk_text
              FROM m""")),

    // T52 — BLEU-style clipped n-gram overlap eval
    // (TextAnalysis.ngramOverlapEval): the generated-text eval metric as a
    // dataset operator — per pair, modified unigram/bigram precisions
    // (clipped multiset intersection / candidate gram count), brevity
    // penalty, BLEU-2. Pairing here is the self-BLEU diversity readout:
    // candidate doc_id against reference doc_id+1 within the same lang —
    // a plain equi-join, no per-lang window anywhere. The metric kernel is
    // the scalable relational shape (posexplode both gram levels once,
    // map-side-combined counts, ONE equi-join on (pair, n, gram)), so it
    // works unchanged when documents are books.
    Entry(
      "t52_ngram_overlap",
      (s, d) => {
        val d0 = docs(s, d).select("doc_id", "lang", "text")
        val nxt = d0.select(col("doc_id").as("_nid"),
          col("lang").as("_nlang"), col("text").as("_ntext"))
        TextAnalysis.ngramOverlapEval(
          d0.join(nxt,
            col("_nid") === col("doc_id") + 1 && col("_nlang") === col("lang"))
            .select(col("doc_id"), col("text").as("cand"),
              col("_ntext").as("ref")),
          "doc_id", "cand", "ref", maxN = 2)
      },
      Some("""WITH d AS (SELECT doc_id, lang,
                                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents WHERE text IS NOT NULL),
                   pr AS (SELECT a.doc_id, string_split(a.norm, ' ') AS ct,
                                 string_split(b.norm, ' ') AS rt
                          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
                   g AS (SELECT doc_id, n,
                                [array_to_string(ct[i:i+n-1], ' ')
                                 for i in range(1, len(ct) - n + 2)] AS cg,
                                [array_to_string(rt[i:i+n-1], ' ')
                                 for i in range(1, len(rt) - n + 2)] AS rg
                         FROM pr CROSS JOIN (SELECT unnest([1, 2]) AS n)),
                   cgc AS (SELECT doc_id, n, gr, COUNT(*) AS cc
                           FROM (SELECT doc_id, n, unnest(cg) AS gr FROM g)
                           GROUP BY doc_id, n, gr),
                   rgc AS (SELECT doc_id, n, gr, COUNT(*) AS rc
                           FROM (SELECT doc_id, n, unnest(rg) AS gr FROM g)
                           GROUP BY doc_id, n, gr),
                   cl AS (SELECT doc_id, n, SUM(LEAST(cc, rc)) AS m
                          FROM cgc JOIN rgc USING (doc_id, n, gr) GROUP BY doc_id, n),
                   tp AS (SELECT doc_id, n, SUM(cc) AS t FROM cgc GROUP BY doc_id, n),
                   pv AS (SELECT tp.doc_id, tp.n,
                                 COALESCE(m, 0) / CAST(t AS DOUBLE) AS p
                          FROM tp LEFT JOIN cl USING (doc_id, n)),
                   w AS (SELECT doc_id,
                                MAX(CASE WHEN n = 1 THEN p END) AS p1,
                                MAX(CASE WHEN n = 2 THEN p END) AS p2
                         FROM pv GROUP BY doc_id),
                   l AS (SELECT doc_id, CAST(len(ct) AS INT) AS c_len,
                                CAST(len(rt) AS INT) AS r_len
                         FROM pr)
              SELECT l.doc_id, l.c_len, l.r_len,
                     ROUND(p1 + 1e-9, 6) AS p1, ROUND(p2 + 1e-9, 6) AS p2,
                     ROUND(LEAST(1.0, exp(1.0 - r_len / CAST(c_len AS DOUBLE))) + 1e-9, 6) AS bp,
                     ROUND(LEAST(1.0, exp(1.0 - r_len / CAST(c_len AS DOUBLE)))
                           * pow(p1 * p2, 0.5) + 1e-9, 6) AS bleu
              FROM l JOIN w USING (doc_id)
              WHERE p1 IS NOT NULL AND p2 IS NOT NULL""")),

    // T53 — lexicon topic mixture (TextAnalysis.lexiconMixture): the
    // CONTENT side of the mixing family — t15/t23 weight SOURCES by a
    // declared mixture; this measures what each doc actually contains.
    // Three domain lexicons over the corpus vocabulary; per doc the
    // token-weighted tag distribution yields dominant tag + share + the
    // Shannon mixture entropy (0 = single-topic, ln 3 = uniform) + tagged
    // fraction — the audit a train-mix pipeline runs before trusting its
    // source labels. One broadcast lexicon join, corpus touched once.
    Entry(
      "t53_lexicon_mixture",
      (s, d) => TextAnalysis.lexiconMixture(
        docs(s, d), "doc_id", "text", t53Lexicon),
      Some(s"""WITH lx(w, tag) AS (VALUES ${t53Lexicon
          .map { case (w, t) => s"('$w', '$t')" }.mkString(", ")}),
                   n0 AS (SELECT doc_id,
                                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
                          FROM documents WHERE text IS NOT NULL),
                   wd AS (SELECT doc_id, w, COUNT(*) AS wc
                          FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM n0)
                          GROUP BY doc_id, w),
                   tt AS (SELECT doc_id, SUM(wc) AS n_tokens FROM wd GROUP BY doc_id),
                   pt AS (SELECT doc_id, tag, SUM(wc) AS n
                          FROM wd JOIN lx ON wd.w = lx.w GROUP BY doc_id, tag),
                   tg AS (SELECT doc_id, SUM(n) AS n_tagged, COUNT(*) AS n_tags
                          FROM pt GROUP BY doc_id),
                   dm AS (SELECT doc_id, tag AS dominant_tag, n AS dn FROM
                            (SELECT doc_id, tag, n,
                                    row_number() OVER (PARTITION BY doc_id
                                      ORDER BY n DESC, tag ASC) AS rk
                             FROM pt) WHERE rk = 1),
                   en AS (SELECT pt.doc_id,
                                 -SUM((n / CAST(n_tagged AS DOUBLE))
                                      * ln(n / CAST(n_tagged AS DOUBLE))) AS h
                          FROM pt JOIN tg USING (doc_id) GROUP BY pt.doc_id)
              SELECT d.doc_id, CAST(COALESCE(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
                     CAST(COALESCE(tg.n_tagged, 0) AS BIGINT) AS n_tagged,
                     COALESCE(tg.n_tags, 0) AS n_tags,
                     COALESCE(dm.dominant_tag, 'none') AS dominant_tag,
                     ROUND(dm.dn / CAST(tg.n_tagged AS DOUBLE) + 1e-9, 6) AS dominant_share,
                     ROUND(en.h + 1e-9, 6) AS tag_entropy
              FROM (SELECT DISTINCT doc_id FROM documents) d
              LEFT JOIN tt USING (doc_id) LEFT JOIN tg USING (doc_id)
              LEFT JOIN dm USING (doc_id) LEFT JOIN en USING (doc_id)""")),

    // C13 — corpus diversity report card: the per-source readout a
    // curation run ends with — is this slice of the corpus REPETITIVE?
    // Three orthogonal diversity lenses per lang, each an existing oracled
    // operator, joined on the 5-row lang frame: corpus TTR (distinct
    // types / tokens — lexical breadth), mean t49 novelty (how much of
    // each doc's 5-gram content is first-seen — cross-doc freshness), and
    // mean neighbor self-BLEU (t52 — local pairwise overlap; HIGH
    // self-BLEU = generated-looking boilerplate). Heavy stages are the
    // constituent operators' own (map-side-combined counts, one
    // (pair, n, gram) join); everything after is lang-frame-sized.
    Entry(
      "c13_diversity_report",
      (s, d) => {
        val d0 = docs(s, d).select("doc_id", "lang", "text")
        val ttr = d0.filter(col("text").isNotNull)
          .select(col("lang"),
            explode(split(Dedup.normalizeText(col("text")), " ")).as("_w"))
          .groupBy("lang")
          .agg(countDistinct(col("_w")).as("n_types"),
            count(lit(1)).as("n_tokens"))
        val nov = TextAnalysis.ngramNovelty(d0, "doc_id", "text", 5)
          .join(d0.select("doc_id", "lang"), Seq("doc_id"))
          .groupBy("lang")
          .agg(stableRound(avg(col("novelty")), 6).as("mean_novelty"))
        val nxt = d0.select(col("doc_id").as("_nid"),
          col("lang").as("_nlang"), col("text").as("_ntext"))
        val sb = TextAnalysis.ngramOverlapEval(
          d0.join(nxt,
            col("_nid") === col("doc_id") + 1 && col("_nlang") === col("lang"))
            .select(col("doc_id"), col("text").as("cand"),
              col("_ntext").as("ref")),
          "doc_id", "cand", "ref", maxN = 2)
          .join(d0.select("doc_id", "lang"), Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_pairs"),
            stableRound(avg(col("bleu")), 6).as("mean_self_bleu"))
        d0.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .join(ttr, Seq("lang"), "left")
          .join(nov, Seq("lang"), "left")
          .join(sb, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("n_types"), col("n_tokens"),
            stableRound(col("n_types").cast("double") / col("n_tokens"), 6)
              .as("corpus_ttr"),
            col("mean_novelty"), col("n_pairs"), col("mean_self_bleu"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
                                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
                         FROM documents WHERE text IS NOT NULL),
                   tok AS (SELECT lang, unnest(string_split(norm, ' ')) AS w FROM d),
                   ttr AS (SELECT lang, COUNT(DISTINCT w) AS n_types, COUNT(*) AS n_tokens
                           FROM tok GROUP BY lang),
                   tk5 AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM d),
                   g5 AS (SELECT doc_id,
                                 list_distinct([array_to_string(toks[i:i+4], ' ')
                                                for i in range(1, greatest(len(toks) - 5, 0) + 2)]) AS grams
                          FROM tk5),
                   gd AS (SELECT doc_id, unnest(grams) AS gram FROM g5),
                   fo AS (SELECT gram, MIN(doc_id) AS fd FROM gd GROUP BY gram),
                   pd AS (SELECT gd.doc_id AS doc_id, COUNT(*) AS n_grams,
                                 SUM(CASE WHEN fo.fd = gd.doc_id THEN 1 ELSE 0 END) AS n_novel
                          FROM gd JOIN fo USING (gram) GROUP BY gd.doc_id),
                   novd AS (SELECT d.doc_id, d.lang,
                                   ROUND(CAST(pd.n_novel AS DOUBLE) / pd.n_grams + 1e-9, 6) AS novelty
                            FROM d LEFT JOIN pd USING (doc_id)),
                   nov AS (SELECT lang, ROUND(AVG(novelty) + 1e-9, 6) AS mean_novelty
                           FROM novd GROUP BY lang),
                   pr AS (SELECT a.doc_id, a.lang, string_split(a.norm, ' ') AS ct,
                                 string_split(b.norm, ' ') AS rt
                          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
                   g AS (SELECT doc_id, n,
                                [array_to_string(ct[i:i+n-1], ' ')
                                 for i in range(1, len(ct) - n + 2)] AS cg,
                                [array_to_string(rt[i:i+n-1], ' ')
                                 for i in range(1, len(rt) - n + 2)] AS rg
                         FROM pr CROSS JOIN (SELECT unnest([1, 2]) AS n)),
                   cgc AS (SELECT doc_id, n, gr, COUNT(*) AS cc
                           FROM (SELECT doc_id, n, unnest(cg) AS gr FROM g)
                           GROUP BY doc_id, n, gr),
                   rgc AS (SELECT doc_id, n, gr, COUNT(*) AS rc
                           FROM (SELECT doc_id, n, unnest(rg) AS gr FROM g)
                           GROUP BY doc_id, n, gr),
                   cl AS (SELECT doc_id, n, SUM(LEAST(cc, rc)) AS m
                          FROM cgc JOIN rgc USING (doc_id, n, gr) GROUP BY doc_id, n),
                   tp AS (SELECT doc_id, n, SUM(cc) AS t FROM cgc GROUP BY doc_id, n),
                   pv AS (SELECT tp.doc_id, tp.n,
                                 COALESCE(m, 0) / CAST(t AS DOUBLE) AS p
                          FROM tp LEFT JOIN cl USING (doc_id, n)),
                   w AS (SELECT doc_id,
                                MAX(CASE WHEN n = 1 THEN p END) AS p1,
                                MAX(CASE WHEN n = 2 THEN p END) AS p2
                         FROM pv GROUP BY doc_id),
                   bl AS (SELECT pr.lang,
                                 ROUND(LEAST(1.0, exp(1.0 - len(pr.rt) / CAST(len(pr.ct) AS DOUBLE)))
                                       * pow(w.p1 * w.p2, 0.5) + 1e-9, 6) AS bleu
                          FROM pr JOIN w USING (doc_id)
                          WHERE w.p1 IS NOT NULL AND w.p2 IS NOT NULL),
                   sb AS (SELECT lang, COUNT(*) AS n_pairs,
                                 ROUND(AVG(bleu) + 1e-9, 6) AS mean_self_bleu
                          FROM bl GROUP BY lang),
                   nd AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
              SELECT nd.lang, nd.n_docs, ttr.n_types, ttr.n_tokens,
                     ROUND(CAST(ttr.n_types AS DOUBLE) / ttr.n_tokens + 1e-9, 6) AS corpus_ttr,
                     nov.mean_novelty, sb.n_pairs, sb.mean_self_bleu
              FROM nd LEFT JOIN ttr USING (lang) LEFT JOIN nov USING (lang)
              LEFT JOIN sb USING (lang)"""))
  )

  /** q95's oracle: the generated KLL build over (status, priority), three
    * generated rollup chains (by status, by priority, global), and the
    * cumulative-weight estimates per level, unioned with 'ALL' fills. */
  private def q95CubeSql: String = {
    val keys = Seq("o_orderstatus", "o_orderpriority")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    s"""WITH
       |${Kll.buildSql(
        "SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice FROM orders",
        keys, "o_totalprice", "o_orderkey", buckets = 4, k = 32,
        rounds = 10, salt = "q95", p = "k")},
       |${Kll.rollupSql("kreg", Seq("o_orderstatus"), 32, 16, "q95", "ra")},
       |${Kll.rollupSql("kreg", Seq("o_orderpriority"), 32, 16, "q95", "rb")},
       |${Kll.rollupSql("kreg", Nil, 32, 16, "q95", "rc")},
       |${Kll.estimateSql("kreg", keys, qs, p = "e0")},
       |${Kll.estimateSql("rareg", Seq("o_orderstatus"), qs, p = "e1")},
       |${Kll.estimateSql("rbreg", Seq("o_orderpriority"), qs, p = "e2")},
       |${Kll.estimateSql("rcreg", Nil, qs, p = "e3")}
       |SELECT e0_p50.o_orderstatus, e0_p50.o_orderpriority,
       |       e0_p50.n, e0_p50.p50, e0_p90.p90
       |FROM e0_p50 JOIN e0_p90 USING (o_orderstatus, o_orderpriority)
       |UNION ALL
       |SELECT e1_p50.o_orderstatus, 'ALL', e1_p50.n, e1_p50.p50, e1_p90.p90
       |FROM e1_p50 JOIN e1_p90 USING (o_orderstatus)
       |UNION ALL
       |SELECT 'ALL', e2_p50.o_orderpriority, e2_p50.n, e2_p50.p50, e2_p90.p90
       |FROM e2_p50 JOIN e2_p90 USING (o_orderpriority)
       |UNION ALL
       |SELECT 'ALL', 'ALL', e3_p50.n, e3_p50.p50, e3_p90.p90
       |FROM e3_p50, e3_p90""".stripMargin
  }

  /** t53's domain lexicons over the corpus vocabulary (word → tag; the
    * oracle inlines the same pairs as VALUES). */
  private def t53Lexicon: Seq[(String, String)] = Seq(
    "spark" -> "engine", "batch" -> "engine", "stream" -> "engine",
    "shuffle" -> "engine",
    "query" -> "plan", "scan" -> "plan", "sort" -> "plan",
    "merge" -> "plan", "join" -> "plan", "agg" -> "plan",
    "window" -> "plan", "group" -> "plan", "order" -> "plan",
    "table" -> "storage", "row" -> "storage", "value" -> "storage",
    "part" -> "storage", "hash" -> "storage", "key" -> "storage",
    "line" -> "storage")

  /** q89's shared oracle prefix: the rank-based equi-depth bucket
    * assignment — row_number over (value, orderkey, linenumber) replaying
    * [[Packing.globalRunningSum]]'s exact global rank, then
    * `(rn−1)·16 // n` (the q88 file-assignment rule at bucket granularity). */
  private def q89HistSql: String =
    """WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
                         row_number() OVER (ORDER BY CAST(l_quantity AS DOUBLE),
                                            l_orderkey, l_linenumber) AS rn,
                         COUNT(*) OVER () AS n
                  FROM lineitem WHERE l_quantity IS NOT NULL),
            a AS (SELECT v, (rn - 1) * 16 // n AS bucket FROM r)"""

  /** d20's record set: parts + planted variants (every 4th part with a
    * one-character name deletion and size+1, id offset 1e6) — the fuzz
    * the matcher must find, replayed identically by [[d20PairsSql]]. */
  private def d20Records(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val p = Tables.load(s, d, "part")
      .select("p_partkey", "p_name", "p_brand", "p_size")
    p.unionByName(
      p.filter(col("p_partkey") % 4 === 0).select(
        (col("p_partkey") + lit(1000000L)).as("p_partkey"),
        concat(substring(col("p_name"), 1, 1), expr("substring(p_name, 3)"))
          .as("p_name"),
        col("p_brand"),
        (col("p_size") + lit(1)).as("p_size")))
  }

  private def d20Pairs(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Dedup.entityPairs(
      d20Records(s, d), "p_partkey",
      Seq(col("p_brand"), substring(col("p_name"), 1, 1)),
      editFields = Seq("p_name" -> 0.4),
      jaccardFields = Seq("p_name" -> 0.2),
      exactFields = Seq("p_brand" -> 0.2),
      closeFields = Seq("p_size" -> 0.2),
      threshold = 0.75)

  /** The shared d20 oracle prefix: variant planting, blocking self-join,
    * the four per-field similarities (each ROUND(x+1e-9, 6) = stableRound)
    * and the weighted score — everything up to the threshold filter. */
  private def d20PairsSql(tightBlock: Boolean = false): String = {
    val lkJoin = if (tightBlock) " AND a.lk = b.lk" else ""
    """WITH p0 AS (SELECT p_partkey, p_name, p_brand, p_size FROM part),
          vr AS (SELECT p_partkey + 1000000 AS p_partkey,
                        substring(p_name, 1, 1) || substring(p_name, 3) AS p_name,
                        p_brand, p_size + 1 AS p_size
                 FROM p0 WHERE p_partkey % 4 = 0),
          r AS (SELECT * FROM p0 UNION ALL SELECT * FROM vr),
          t AS (SELECT p_partkey AS id, p_brand,
                       substring(p_name, 1, 1) AS nk,
                       list_extract(string_split(trim(p_name), ' '), -1) AS lk,
                       lower(trim(p_name)) AS nn,
                       list_distinct([x for x in string_split_regex(lower(trim(p_name)), '\s+')
                                      if length(x) > 0]) AS toks,
                       p_size
                FROM r),
          c AS (SELECT a.id AS a_id, b.id AS b_id,
                       ROUND(CASE WHEN levenshtein(a.nn, b.nn) > 20 THEN 0.0
                             ELSE 1.0 - CAST(levenshtein(a.nn, b.nn) AS DOUBLE)
                                  / GREATEST(length(a.nn), length(b.nn), 1) END + 1e-9, 6) AS p_name_edit_sim,
                       ROUND(CASE WHEN len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) = 0 THEN 1.0
                             ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                                  / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) END + 1e-9, 6) AS p_name_jaccard_sim,
                       ROUND(CASE WHEN a.p_brand IS NOT DISTINCT FROM b.p_brand THEN 1.0 ELSE 0.0 END + 1e-9, 6) AS p_brand_exact_sim,
                       ROUND(CASE WHEN a.p_size IS NOT DISTINCT FROM b.p_size THEN 1.0
                                  WHEN a.p_size IS NULL OR b.p_size IS NULL THEN 0.0
                             ELSE 1.0 - CAST(abs(a.p_size - b.p_size) AS DOUBLE)
                                  / GREATEST(abs(a.p_size), abs(b.p_size), 1) END + 1e-9, 6) AS p_size_close_sim
                FROM t a JOIN t b
                  ON a.p_brand = b.p_brand AND a.nk = b.nk AND a.id < b.id
                     """ + lkJoin + """),
          sc AS (SELECT *, ROUND((CAST('0.4' AS DOUBLE) * p_name_edit_sim +
                                  CAST('0.2' AS DOUBLE) * p_name_jaccard_sim +
                                  CAST('0.2' AS DOUBLE) * p_brand_exact_sim +
                                  CAST('0.2' AS DOUBLE) * p_size_close_sim)
                                 / CAST('1.0' AS DOUBLE) + 1e-9, 6) AS score
                 FROM c)"""
  }

  /** c14's oracle: the d20 pair/similarity prefix + planted labels, an
    * unrolled 4-feature logistic-GD ladder (the q71 CTE discipline),
    * sigmoid rescore on the ROUNDED final weights, the q51 best-split
    * sweep over the learned score, and the d18 pair-set metrics at the
    * learned cut — one composed SELECT, hash-checked end to end. */
  private def c14Sql(iters: Int, lr: Double): String = {
    def sig = "1/(1+exp(-(w0 + w1*x1 + w2*x2 + w3*x3 + w4*x4)))"
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "cb0" else s"cb${k - 1}"
      val grads = (1 to 4).map(j =>
        s"ROUND(MAX(w$j) - CAST($lr AS DOUBLE) * AVG(($sig - y) * x$j) + 1e-9, 6) AS w$j")
      s"""cb$k AS MATERIALIZED (SELECT
            ROUND(MAX(w0) - CAST($lr AS DOUBLE) * AVG($sig - y) + 1e-9, 6) AS w0,
            ${grads.mkString(",\n            ")}
          FROM trn, $prev)"""
    }.mkString(",\n          ")
    def ent(p: String) =
      s"""(CASE WHEN $p <= 0 OR $p >= 1 THEN 0
           ELSE -(($p) * ln($p) + (1 - ($p)) * ln(1 - ($p))) END)"""
    d20PairsSql(tightBlock = true) +
      s""" ,
          lab AS MATERIALIZED (SELECT a_id, b_id,
                         CASE WHEN b_id = a_id + 1000000 AND a_id % 4 = 0
                              THEN 1.0 ELSE 0.0 END AS y,
                         p_name_edit_sim AS x1, p_name_jaccard_sim AS x2,
                         p_brand_exact_sim AS x3, p_size_close_sim AS x4
                  FROM sc),
          trn AS MATERIALIZED (SELECT * FROM lab
                  WHERE y = 1.0
                     OR ('0x' || substr(md5(CAST(a_id AS VARCHAR) || ':' || CAST(b_id AS VARCHAR)), 1, 14))::UBIGINT::BIGINT % 4 = 0),
          cb0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                         CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3,
                         CAST(0 AS DOUBLE) AS w4),
          $steps,
          fit AS (SELECT COUNT(*) AS n_points,
                         ROUND(MAX(w0) + 1e-9, 6) AS intercept,
                         ROUND(MAX(w1) + 1e-9, 6) AS beta_p_name_edit_sim,
                         ROUND(MAX(w2) + 1e-9, 6) AS beta_p_name_jaccard_sim,
                         ROUND(MAX(w3) + 1e-9, 6) AS beta_p_brand_exact_sim,
                         ROUND(MAX(w4) + 1e-9, 6) AS beta_p_size_close_sim,
                         ROUND(-AVG(y * ln($sig) + (1 - y) * ln(1 - $sig)) + 1e-9, 6) AS logloss,
                         ROUND(AVG(CASE WHEN (CASE WHEN ROUND($sig + 1e-9, 6) > 0.5
                                              THEN 1.0 ELSE 0.0 END) = y
                                        THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS accuracy
                  FROM trn, cb$iters),
          rs AS MATERIALIZED (SELECT a_id, b_id, y,
                        ROUND($sig + 1e-9, 6) AS t_score
                 FROM lab, cb$iters),
          per AS (SELECT t_score AS threshold,
                         COUNT(*) FILTER (y = 1.0) AS pos,
                         COUNT(*) FILTER (y = 0.0) AS neg
                  FROM rs GROUP BY 1),
          tot AS (SELECT COUNT(*) FILTER (y = 1.0) AS p,
                         COUNT(*) FILTER (y = 0.0) AS n
                  FROM rs),
          cw AS (SELECT threshold,
                        CAST(SUM(pos) OVER w AS BIGINT) AS tp,
                        CAST(SUM(neg) OVER w AS BIGINT) AS fp
                 FROM per
                 WINDOW w AS (ORDER BY threshold DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          gn AS (SELECT threshold,
                        p + n - tp - fp AS n_left,
                        tp + fp AS n_right,
                        ROUND(${ent("CAST(p AS DOUBLE)/(p+n)")}
                          - (CAST(tp+fp AS DOUBLE)/(p+n)) * ${ent("CAST(tp AS DOUBLE)/(tp+fp)")}
                          - (CASE WHEN p + n - tp - fp > 0 THEN
                               (CAST(p+n-tp-fp AS DOUBLE)/(p+n))
                                 * ${ent("CAST(p-tp AS DOUBLE)/(p+n-tp-fp)")}
                             ELSE 0 END)
                          + 1e-9, 6) AS gain
                 FROM cw, tot WHERE p + n > 0),
          best AS (SELECT threshold, gain, n_left, n_right FROM gn
                   ORDER BY gain DESC, threshold ASC LIMIT 1),
          prd AS (SELECT DISTINCT LEAST(a_id, b_id) AS _a,
                         GREATEST(a_id, b_id) AS _b
                  FROM rs, best WHERE rs.t_score >= best.threshold),
          tru AS (SELECT DISTINCT LEAST(p_partkey, p_partkey + 1000000) AS _a,
                         GREATEST(p_partkey, p_partkey + 1000000) AS _b
                  FROM p0 WHERE p_partkey % 4 = 0),
          np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pred FROM prd),
          nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tru),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM (SELECT * FROM prd INTERSECT SELECT * FROM tru)),
          bpd AS (SELECT DISTINCT LEAST(a_id, b_id) AS _a,
                         GREATEST(a_id, b_id) AS _b
                  FROM sc WHERE score >= CAST('0.75' AS DOUBLE)),
          bnp AS (SELECT CAST(COUNT(*) AS BIGINT) AS bpred FROM bpd),
          bnb AS (SELECT CAST(COUNT(*) AS BIGINT) AS bboth
                  FROM (SELECT * FROM bpd INTERSECT SELECT * FROM tru)),
          base AS (SELECT ROUND(bboth / CAST(bpred AS DOUBLE) + 1e-9, 6) AS base_precision,
                          ROUND(bboth / CAST(n_truth AS DOUBLE) + 1e-9, 6) AS base_recall,
                          bboth
                   FROM bnp, bnb, nt),
          eqr AS (SELECT cw.threshold AS threshold_at_base_recall,
                         ROUND(cw.tp / CAST(cw.tp + cw.fp AS DOUBLE) + 1e-9, 6) AS precision_at_base_recall,
                         ROUND(cw.tp / CAST(nt.n_truth AS DOUBLE) + 1e-9, 6) AS recall_at_base_recall
                  FROM cw, base, nt WHERE cw.tp >= base.bboth
                  ORDER BY cw.threshold DESC LIMIT 1),
          cnp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand
                  FROM (SELECT DISTINCT LEAST(a_id, b_id), GREATEST(a_id, b_id)
                        FROM sc)),
          cnb AS (SELECT CAST(COUNT(*) AS BIGINT) AS cboth
                  FROM (SELECT DISTINCT LEAST(a_id, b_id) AS _a,
                               GREATEST(a_id, b_id) AS _b
                        FROM sc
                        INTERSECT SELECT * FROM tru)),
          cbr AS (SELECT ROUND(cboth / CAST(n_truth AS DOUBLE) + 1e-9, 6) AS block_recall
                  FROM cnb, nt)
      SELECT fit.*, best.threshold, best.gain, best.n_left, best.n_right,
             np.n_pred, nt.n_truth, nb.n_both,
             CASE WHEN n_pred > 0
                  THEN ROUND(n_both / CAST(n_pred AS DOUBLE) + 1e-9, 6) END AS precision,
             CASE WHEN n_truth > 0
                  THEN ROUND(n_both / CAST(n_truth AS DOUBLE) + 1e-9, 6) END AS recall,
             CASE WHEN n_pred > 0 AND n_truth > 0 AND n_both > 0
                  THEN ROUND(2.0 * (n_both / CAST(n_pred AS DOUBLE)) * (n_both / CAST(n_truth AS DOUBLE))
                             / (n_both / CAST(n_pred AS DOUBLE) + n_both / CAST(n_truth AS DOUBLE)) + 1e-9, 6)
             END AS f1,
             base.base_precision, base.base_recall,
             eqr.threshold_at_base_recall, eqr.precision_at_base_recall,
             eqr.recall_at_base_recall,
             cnp.n_cand, cbr.block_recall
      FROM fit, best, np, nt, nb, base, eqr, cnp, cbr"""
  }

  /** q86's oracle: the generated q81 build chain (salt q86) + the same
    * cumulative-weight rank probes at the nudged band edges + one exact
    * conditional aggregate. */
  private def kllSelectivitySql: String = {
    val bands = Seq(
      ("narrow", "100.0", "150.0"), ("mid", "50.0", "300.0"),
      ("wide", "0.0", "400.0"))
    val bandsSql = bands.map { case (b, lo, hi) =>
      s"SELECT '$b' AS band, CAST('$lo' AS DOUBLE) AS lo, CAST('$hi' AS DOUBLE) AS hi"
    }.mkString("\nUNION ALL ")
    s"""WITH
       |${Kll.buildSql("SELECT event_type, event_id, value FROM events",
          Seq("event_type"), "value", "event_id", buckets = 4, k = 32,
          rounds = 10, salt = "q86", p = "k")},
       |bands AS MATERIALIZED ($bandsSql),
       |et AS MATERIALIZED (SELECT DISTINCT event_type FROM events),
       |pr AS MATERIALIZED (SELECT et.event_type, b.band, b.lo, b.hi
       |                    FROM et CROSS JOIN bands b),
       |rlo AS MATERIALIZED (
       |  SELECT p.event_type, p.band,
       |         CAST(COALESCE(SUM(CASE WHEN r._value <= p.lo - 1e-9
       |                            THEN (CAST(1 AS BIGINT) << r._level)
       |                            ELSE 0 END), 0) AS BIGINT) AS r_lo
       |  FROM pr p JOIN kreg r USING (event_type) GROUP BY 1, 2),
       |rhi AS MATERIALIZED (
       |  SELECT p.event_type, p.band,
       |         CAST(COALESCE(SUM(CASE WHEN r._value <= p.hi - 1e-9
       |                            THEN (CAST(1 AS BIGINT) << r._level)
       |                            ELSE 0 END), 0) AS BIGINT) AS r_hi
       |  FROM pr p JOIN kreg r USING (event_type) GROUP BY 1, 2),
       |ex AS MATERIALIZED (
       |  SELECT p.event_type, p.band,
       |         CAST(SUM(CASE WHEN ev.value >= p.lo AND ev.value < p.hi
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS exact_count
       |  FROM pr p JOIN events ev USING (event_type) GROUP BY 1, 2),
       |nn AS MATERIALIZED (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1)
       |SELECT pr.event_type, pr.band, nn.n,
       |       rhi.r_hi - rlo.r_lo AS est_count, ex.exact_count,
       |       ROUND(abs(rhi.r_hi - rlo.r_lo - ex.exact_count) * 1.0 / nn.n + 1e-9, 6) AS err_frac
       |FROM pr JOIN rlo USING (event_type, band)
       |        JOIN rhi USING (event_type, band)
       |        JOIN ex USING (event_type, band)
       |        JOIN nn USING (event_type)""".stripMargin
  }

  /** q81's build oracle, GENERATED by the [[graft.operators.Kll]] SQL
    * mirrors: md5 bucketing, 10 unrolled per-bucket compaction rounds, the
    * 14-round fold sweep — the sketch state replayed row-for-row. */
  private def kllBuildSql: String =
    s"""WITH
       |${Kll.buildSql("SELECT event_type, event_id, value FROM events",
          Seq("event_type"), "value", "event_id", buckets = 4, k = 32,
          rounds = 10, salt = "q81", p = "k")}
       |SELECT event_type, _level AS level, _value AS value,
       |       (CAST(1 AS BIGINT) << _level) AS weight
       |FROM kreg""".stripMargin

  /** q81_kll_merge's oracle: two generated half-builds, the union+sweep
    * merge chain, the cumulative-weight decile estimates. */
  private def kllMergeSql: String = {
    val qs = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
      "p90" -> 0.9)
    val joins = qs.tail.map { case (n, _) =>
      s"JOIN e_$n USING (event_type)" }.mkString(" ")
    s"""WITH
       |${Kll.buildSql("SELECT event_type, event_id, value FROM events WHERE event_id % 2 = 0",
          Seq("event_type"), "value", "event_id", 4, 32, 10, "q81m", "ka")},
       |${Kll.buildSql("SELECT event_type, event_id, value FROM events WHERE event_id % 2 = 1",
          Seq("event_type"), "value", "event_id", 4, 32, 10, "q81m", "kb")},
       |${Kll.mergeSql("kareg", "kbreg", Seq("event_type"), k = 32,
          sweepRounds = 16, salt = "q81m", p = "km")},
       |${Kll.estimateSql("kmreg", Seq("event_type"), qs, p = "e")}
       |SELECT event_type, e_p10.n AS n,
       |       ${qs.map { case (n, _) => s"e_$n.$n AS $n" }.mkString(", ")}
       |FROM e_p10 $joins""".stripMargin
  }

  /** q81_kll_error's oracle: the generated build + decile estimates,
    * melted long, the sketch weight-rank and the exact corpus rank per
    * reported value. */
  private def kllErrorSql: String = {
    val qs = (1 to 9).map(i => s"d$i" -> i / 10.0)
    val melt = (1 to 9).map(i =>
      s"SELECT event_type, n, CAST($i AS INTEGER) AS q_ix, d$i AS est_value FROM e_d$i")
      .mkString("\nUNION ALL ")
    s"""WITH
       |${Kll.buildSql("SELECT event_type, event_id, value FROM events",
          Seq("event_type"), "value", "event_id", 4, 32, 10, "q81", "k")},
       |${Kll.estimateSql("kreg", Seq("event_type"), qs, p = "e")},
       |long AS MATERIALIZED ($melt),
       |er AS MATERIALIZED (
       |  SELECT l.event_type, l.q_ix,
       |         CAST(COALESCE(SUM(CASE WHEN r._value <= l.est_value
       |                            THEN (CAST(1 AS BIGINT) << r._level)
       |                            ELSE 0 END), 0) AS BIGINT) AS est_rank
       |  FROM long l JOIN kreg r USING (event_type) GROUP BY 1, 2),
       |ex AS MATERIALIZED (
       |  SELECT l.event_type, l.q_ix,
       |         CAST(SUM(CASE WHEN ev.value <= l.est_value THEN 1 ELSE 0 END) AS BIGINT) AS exact_rank
       |  FROM long l JOIN events ev USING (event_type) GROUP BY 1, 2)
       |SELECT long.event_type, long.q_ix, long.n, long.est_value,
       |       er.est_rank, ex.exact_rank,
       |       abs(er.est_rank - ex.exact_rank) AS rank_abs_err,
       |       ROUND(abs(er.est_rank - ex.exact_rank) * 1.0 / long.n + 1e-9, 6) AS rank_err_frac
       |FROM long JOIN er USING (event_type, q_ix)
       |          JOIN ex USING (event_type, q_ix)""".stripMargin
  }

  /** The t47 unigram-LM chain, generated: word-frequency base, seed
    * vocabulary (top multi-char substrings + all chars), then per EM round
    * a Viterbi pass — `pw` (piece scores by end position), `fwd` (the DP
    * as a recursive CTE carrying a 4-score sliding window), `sc`, `bwd`
    * (backward path reconstruction, longest-qualifying-piece rule) — and an
    * M step (`cnt`/`vr`/`v`: path counts, char +1 smoothing, renormalized
    * integer micro-logps). `passes` > `emRounds` appends extra Viterbi
    * passes against the final vocabulary (the encode twin). maxLen fixed
    * at 4 (matches the operator default). */
  private def unigramChainSql(seedMulti: Int, emRounds: Int, passes: Int): String = {
    val base =
      s"""wf AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE length(w) > 0 GROUP BY w),
         |sub AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT substr(wf.w, CAST(ii.i AS INTEGER), CAST(ll.l AS INTEGER)) AS piece, wf.n AS n
         |        FROM wf,
         |             LATERAL (SELECT unnest(range(1, length(wf.w) + 1)) AS i) ii,
         |             LATERAL (SELECT unnest(range(1, 5)) AS l) ll
         |        WHERE ii.i + ll.l - 1 <= length(wf.w))
         |  GROUP BY piece),
         |v0raw AS MATERIALIZED (
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
         |    FROM sub WHERE length(piece) >= 2) WHERE rn <= $seedMulti
         |  UNION ALL
         |  SELECT piece, cnt FROM sub WHERE length(piece) = 1),
         |v0 AS MATERIALIZED (
         |  SELECT piece, cnt,
         |         CAST(ROUND(ln(CAST(cnt AS DOUBLE) / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM v0raw)) * 1000000) AS BIGINT) AS lp
         |  FROM v0raw)""".stripMargin
    def viterbiPass(r: Int): String =
      s"""pw$r AS MATERIALIZED (
         |  SELECT w, i,
         |         MAX(CASE WHEN l = 1 THEN lp END) AS lp1,
         |         MAX(CASE WHEN l = 2 THEN lp END) AS lp2,
         |         MAX(CASE WHEN l = 3 THEN lp END) AS lp3,
         |         MAX(CASE WHEN l = 4 THEN lp END) AS lp4
         |  FROM (SELECT s.w AS w, s.i AS i, s.l AS l, v.lp AS lp
         |        FROM (SELECT wf.w AS w, ii.i AS i, ll.l AS l,
         |                     substr(wf.w, CAST(ii.i - ll.l + 1 AS INTEGER), CAST(ll.l AS INTEGER)) AS piece
         |              FROM wf,
         |                   LATERAL (SELECT unnest(range(1, length(wf.w) + 1)) AS i) ii,
         |                   LATERAL (SELECT unnest(range(1, 5)) AS l) ll
         |              WHERE ii.i - ll.l + 1 >= 1) s
         |        JOIN v${r - 1} v ON s.piece = v.piece)
         |  GROUP BY w, i),
         |fwd$r AS (
         |  SELECT w, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS a,
         |         CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS c, CAST(NULL AS BIGINT) AS d
         |  FROM wf
         |  UNION ALL
         |  SELECT f.w, f.i + 1,
         |         GREATEST(f.a + p.lp1, f.b + p.lp2, f.c + p.lp3, f.d + p.lp4),
         |         f.a, f.b, f.c
         |  FROM fwd$r f JOIN pw$r p ON p.w = f.w AND p.i = f.i + 1
         |  WHERE f.i < length(f.w)),
         |sc$r AS MATERIALIZED (SELECT w, i, a AS s FROM fwd$r),
         |bwd$r AS (
         |  SELECT w, CAST(length(w) AS BIGINT) AS i, CAST(NULL AS VARCHAR) AS piece
         |  FROM wf
         |  UNION ALL
         |  SELECT q.w, q.i - q.len, q.pc
         |  FROM (SELECT z.w AS w, z.i AS i,
         |               CASE WHEN z.ok4 THEN 4 WHEN z.ok3 THEN 3 WHEN z.ok2 THEN 2 ELSE 1 END AS len,
         |               CASE WHEN z.ok4 THEN substr(z.w, CAST(z.i - 3 AS INTEGER), 4)
         |                    WHEN z.ok3 THEN substr(z.w, CAST(z.i - 2 AS INTEGER), 3)
         |                    WHEN z.ok2 THEN substr(z.w, CAST(z.i - 1 AS INTEGER), 2)
         |                    ELSE substr(z.w, CAST(z.i AS INTEGER), 1) END AS pc
         |        FROM (SELECT b.w, b.i,
         |                     COALESCE(s4.s + p.lp4 = s0.s, FALSE) AS ok4,
         |                     COALESCE(s3.s + p.lp3 = s0.s, FALSE) AS ok3,
         |                     COALESCE(s2.s + p.lp2 = s0.s, FALSE) AS ok2
         |              FROM bwd$r b
         |              JOIN sc$r s0 ON s0.w = b.w AND s0.i = b.i
         |              JOIN pw$r p ON p.w = b.w AND p.i = b.i
         |              LEFT JOIN sc$r s2 ON s2.w = b.w AND s2.i = b.i - 2
         |              LEFT JOIN sc$r s3 ON s3.w = b.w AND s3.i = b.i - 3
         |              LEFT JOIN sc$r s4 ON s4.w = b.w AND s4.i = b.i - 4
         |              WHERE b.i > 0) z) q)""".stripMargin
    def mStep(r: Int): String =
      s"""cnt$r AS MATERIALIZED (
         |  SELECT b.piece AS piece, CAST(SUM(wf.n) AS BIGINT) AS cnt
         |  FROM bwd$r b JOIN wf ON wf.w = b.w
         |  WHERE b.piece IS NOT NULL GROUP BY b.piece),
         |vr$r AS MATERIALIZED (
         |  SELECT COALESCE(c.piece, ch.piece) AS piece,
         |         CAST(COALESCE(c.cnt, 0) + CASE WHEN length(COALESCE(c.piece, ch.piece)) = 1 THEN 1 ELSE 0 END AS BIGINT) AS cnt
         |  FROM cnt$r c FULL JOIN (SELECT piece FROM v${r - 1} WHERE length(piece) = 1) ch ON c.piece = ch.piece),
         |v$r AS MATERIALIZED (
         |  SELECT piece, cnt,
         |         CAST(ROUND(ln(CAST(cnt AS DOUBLE) / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM vr$r)) * 1000000) AS BIGINT) AS lp
         |  FROM vr$r)""".stripMargin
    val rounds = (1 to passes).map { r =>
      if (r <= emRounds) viterbiPass(r) + ",\n" + mStep(r)
      else viterbiPass(r)
    }
    (base +: rounds).mkString(",\n")
  }

  private def unigramLearnSql(seedMulti: Int, emRounds: Int): String =
    s"""WITH RECURSIVE
       |${unigramChainSql(seedMulti, emRounds, emRounds)}
       |SELECT piece, CAST(length(piece) AS INTEGER) AS piece_len, cnt,
       |       lp AS logp_micro
       |FROM v$emRounds""".stripMargin

  private def unigramEncodeSql(seedMulti: Int, emRounds: Int): String = {
    val e = emRounds + 1
    s"""WITH RECURSIVE
       |${unigramChainSql(seedMulti, emRounds, e)},
       |stats AS MATERIALIZED (
       |  SELECT b.w AS w, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM bwd$e b WHERE b.piece IS NOT NULL GROUP BY b.w),
       |sce AS MATERIALIZED (SELECT w, s FROM sc$e WHERE i = length(w)),
       |dt AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE length(w) > 0),
       |pd AS MATERIALIZED (
       |  SELECT dt.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |         CAST(SUM(st.k) AS BIGINT) AS n_pieces,
       |         CAST(SUM(sce.s) AS BIGINT) AS logp_micro_sum
       |  FROM dt JOIN stats st ON st.w = dt.w JOIN sce ON sce.w = dt.w
       |  GROUP BY dt.doc_id)
       |SELECT d.doc_id, COALESCE(pd.n_words, 0) AS n_words,
       |       COALESCE(pd.n_pieces, 0) AS n_pieces,
       |       ROUND(CAST(pd.n_pieces AS DOUBLE) / pd.n_words + 1e-9, 6) AS pieces_per_word,
       |       COALESCE(pd.logp_micro_sum, 0) AS logp_micro_sum
       |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id""".stripMargin
  }

  /** c11's oracle: the generated unigram chain + fixed-vocab per-word piece
    * counts, then the SAME md5-order prefix sum and 512-piece sequence
    * fold t14's oracle uses — but over learned-tokenizer counts. */
  private def tokenPackingSql(seedMulti: Int, emRounds: Int): String = {
    val e = emRounds + 1
    s"""WITH RECURSIVE
       |${unigramChainSql(seedMulti, emRounds, e)},
       |stats AS MATERIALIZED (
       |  SELECT b.w AS w, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM bwd$e b WHERE b.piece IS NOT NULL GROUP BY b.w),
       |dt AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE length(w) > 0),
       |pd AS MATERIALIZED (
       |  SELECT dt.doc_id AS doc_id, CAST(SUM(st.k) AS BIGINT) AS np
       |  FROM dt JOIN stats st ON st.w = dt.w GROUP BY dt.doc_id),
       |alldocs AS MATERIALIZED (
       |  SELECT d.doc_id AS doc_id, COALESCE(pd.np, 0) AS np
       |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
       |cum AS MATERIALIZED (
       |  SELECT doc_id, np,
       |         CAST(SUM(np) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
       |  FROM alldocs)
       |SELECT (ct - np) // 512 AS seq_id, COUNT(*) AS n_docs,
       |       CAST(SUM(np) AS BIGINT) AS seq_tokens,
       |       ROUND(CAST(SUM(np) AS DOUBLE) / CAST('512' AS DOUBLE) + 1e-9, 6) AS fill_ratio
       |FROM cum GROUP BY 1""".stripMargin
  }

  /** q74's DuckDB oracle, GENERATED by the [[graft.operators.QDigest]] SQL
    * mirrors: two half-builds (each `bits` unrolled compression rounds over
    * integer registers), the union+recompress merge, the post-order
    * estimate, plus exact quantiles and the leaf-level true-rank audit. */
  private def qdigestSql: String = {
    val keys = Seq("l_returnflag")
    val (lo, hi, bits, k) = (900.0, 105000.0, 12, 512)
    val leafIdx = QDigest.leafIndexSql("l_extendedprice", lo, hi, bits)
    val src = (par: Int) =>
      s"SELECT l_returnflag, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = $par"
    s"""WITH
       |${QDigest.buildSql(src(0), keys, "l_extendedprice", lo, hi, bits, k, "qa")},
       |${QDigest.buildSql(src(1), keys, "l_extendedprice", lo, hi, bits, k, "qb")},
       |${QDigest.mergeSql("qa1", "qb1", keys, bits, k, "qm")},
       |${QDigest.estimateSql("qm1", keys, bits, lo, hi,
             Seq("p50_qd" -> 0.5, "p95_qd" -> 0.95), "qe")},
       |est AS MATERIALIZED (SELECT a.l_returnflag, a.n, a.p50_qd_leaf, a.p50_qd,
       |               b.p95_qd_leaf, b.p95_qd
       |        FROM qe_p50_qd a JOIN qe_p95_qd b USING (l_returnflag)),
       |sizes AS MATERIALIZED (SELECT l_returnflag, COUNT(*) AS n_nodes FROM qm1 GROUP BY 1),
       |xq AS MATERIALIZED (SELECT l_returnflag,
       |              ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) + 1e-9, 6) AS p50_exact,
       |              ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) + 1e-9, 6) AS p95_exact
       |       FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
       |lv AS MATERIALIZED (SELECT l_returnflag, $leafIdx AS _leaf
       |       FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |tr AS MATERIALIZED (SELECT lv.l_returnflag,
       |              CAST(SUM(CASE WHEN lv._leaf <= e.p50_qd_leaf THEN 1 ELSE 0 END) AS BIGINT) AS tr50,
       |              CAST(SUM(CASE WHEN lv._leaf <= e.p95_qd_leaf THEN 1 ELSE 0 END) AS BIGINT) AS tr95
       |       FROM lv JOIN est e USING (l_returnflag) GROUP BY 1)
       |SELECT e.l_returnflag, e.n, s.n_nodes, e.p50_qd_leaf, e.p50_qd,
       |       e.p95_qd_leaf, e.p95_qd, x.p50_exact, x.p95_exact,
       |       ROUND(abs(tr.tr50 - CAST(CEIL(CAST('0.5' AS DOUBLE) * e.n) AS BIGINT)) / e.n + 1e-9, 6) AS p50_rank_err,
       |       ROUND(abs(tr.tr95 - CAST(CEIL(CAST('0.95' AS DOUBLE) * e.n) AS BIGINT)) / e.n + 1e-9, 6) AS p95_rank_err
       |FROM est e JOIN sizes s USING (l_returnflag)
       |  JOIN xq x USING (l_returnflag) JOIN tr USING (l_returnflag)""".stripMargin
  }

  /** q71's DuckDB oracle, GENERATED: `iters` unrolled full-batch gradient
    * steps. Step k reads step k−1's one-row coefficient CTE (cross join),
    * folds `AVG((σ(w·x̃) − y)·x̃)`, and rounds each coefficient 6dp — the
    * exact boundary discipline of [[graft.operators.Classifier.logisticFit]],
    * so the trajectories are bit-comparable after rounding. The final
    * SELECT re-derives σ from the LAST coefficients for logloss and the
    * rounded-probability accuracy. */
  private def logisticSql(iters: Int, lr: Double): String = {
    def sig(pre: String = "") = s"1/(1+exp(-(${pre}w0 + ${pre}w1*x1 + ${pre}w2*x2)))"
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "b0" else s"b${k - 1}"
      s"""b$k AS (SELECT
            ROUND(MAX(w0) - CAST($lr AS DOUBLE) * AVG(${sig()} - y) + 1e-9, 6) AS w0,
            ROUND(MAX(w1) - CAST($lr AS DOUBLE) * AVG((${sig()} - y) * x1) + 1e-9, 6) AS w1,
            ROUND(MAX(w2) - CAST($lr AS DOUBLE) * AVG((${sig()} - y) * x2) + 1e-9, 6) AS w2
          FROM e, $prev)"""
    }.mkString(",\n          ")
    s"""WITH e AS (SELECT (CAST(l_quantity AS DOUBLE) - 25.0) / 25.0 AS x1,
                          (CAST(l_discount AS DOUBLE) - 0.05) * 20.0 AS x2,
                          CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
                   FROM lineitem
                   WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
                     AND l_returnflag IS NOT NULL),
          b0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                        CAST(0 AS DOUBLE) AS w2),
          $steps
     SELECT COUNT(*) AS n_points,
            ROUND(MAX(w0) + 1e-9, 6) AS intercept,
            ROUND(MAX(w1) + 1e-9, 6) AS beta_qn,
            ROUND(MAX(w2) + 1e-9, 6) AS beta_dn,
            ROUND(-AVG(y * ln(${sig()}) + (1 - y) * ln(1 - ${sig()})) + 1e-9, 6) AS logloss,
            ROUND(AVG(CASE WHEN (CASE WHEN ROUND(${sig()} + 1e-9, 6) > 0.5
                                      THEN 1.0 ELSE 0.0 END) = y
                           THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS accuracy
     FROM e, b$iters"""
  }

  /** q71b's DuckDB oracle, GENERATED: [[logisticSql]]'s unrolled training
    * ladder, then per-row scoring of the probe slice with the FINAL
    * coefficients — `score = ROUND(σ(w·x̃)+1e-9, 6)`, `pred = score >
    * 0.5`, the exact [[graft.operators.Classifier.scoreLogistic]]
    * surface. */
  private def frozenLogitScoreSql(iters: Int, lr: Double): String = {
    def sig = s"1/(1+exp(-(w0 + w1*x1 + w2*x2)))"
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "b0" else s"b${k - 1}"
      s"""b$k AS (SELECT
            ROUND(MAX(w0) - CAST($lr AS DOUBLE) * AVG($sig - y) + 1e-9, 6) AS w0,
            ROUND(MAX(w1) - CAST($lr AS DOUBLE) * AVG(($sig - y) * x1) + 1e-9, 6) AS w1,
            ROUND(MAX(w2) - CAST($lr AS DOUBLE) * AVG(($sig - y) * x2) + 1e-9, 6) AS w2
          FROM e, $prev)"""
    }.mkString(",\n          ")
    s"""WITH e AS (SELECT (CAST(l_quantity AS DOUBLE) - 25.0) / 25.0 AS x1,
                          (CAST(l_discount AS DOUBLE) - 0.05) * 20.0 AS x2,
                          CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
                   FROM lineitem
                   WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
                     AND l_returnflag IS NOT NULL),
          b0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                        CAST(0 AS DOUBLE) AS w2),
          $steps,
          probe AS (SELECT l_orderkey * 10 + l_linenumber AS rid,
                           (CAST(l_quantity AS DOUBLE) - 25.0) / 25.0 AS x1,
                           (CAST(l_discount AS DOUBLE) - 0.05) * 20.0 AS x2
                    FROM lineitem WHERE l_orderkey % 100 = 0)
     SELECT rid,
            ROUND(1/(1+exp(-(w0 + w1*x1 + w2*x2))) + 1e-9, 6) AS score,
            (ROUND(1/(1+exp(-(w0 + w1*x1 + w2*x2))) + 1e-9, 6) > 0.5) AS pred
     FROM probe, b$iters"""
  }

  /** t37's fixed rank-ordered merge table — a spec constant shared by the
    * Spark query and (inlined as the `mg` VALUES) its DuckDB oracle. */
  val fixedBpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "d"),
    ("e", "r"), ("a", "n"), ("r", "e"), ("s", "c"))

  /** t36's DuckDB oracle, GENERATED: `numMerges` unrolled learner rounds
    * over the word-frequency segmentation. Per round k (reading seg(k−1)):
    * `pc` = adjacent-pair counts weighted by word count (per occurrence —
    * `aaa` contributes 2× to (a,a), the standard BPE statistic);
    * `top` = the argmax row, empty once nothing reaches `minCount`
    * (the learner's early stop — emptiness cascades through LEFT JOIN);
    * `sgm`/`sgn`/`seg` = ONE greedy left-to-right application of the
    * learned pair using the t37 even-run arithmetic
    * (`matched(i) ⇔ raw(i) ∧ even run of raw before i`, which reduces the
    * kernel's sequential skip-scan to per-position list arithmetic). */
  private def bpeLearnerSql(numMerges: Int, minCount: Long): String = {
    def round(k: Int): String = {
      val p = k - 1
      s"""pc$k AS (
         |  SELECT pr.l AS l, pr.r AS r, SUM(n) AS cnt
         |  FROM (SELECT n, UNNEST([{'l': s[i], 'r': s[i + 1]} for i in range(1, len(s))]) AS pr
         |        FROM seg$p WHERE len(s) >= 2)
         |  GROUP BY pr.l, pr.r),
         |top$k AS (SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM pc$k
         |          WHERE cnt >= $minCount ORDER BY cnt DESC, l, r LIMIT 1),
         |sgm$k AS (
         |  SELECT w, n, s, t.l AS tl,
         |         [s[i] = t.l AND s[i + 1] = t.r for i in range(1, len(s))] AS raw
         |  FROM seg$p LEFT JOIN top$k t ON TRUE),
         |sgn$k AS (
         |  SELECT w, n, s, tl,
         |         [raw[i] AND ((i - 1 - coalesce(list_max([j for j in range(1, i) if NOT raw[j]]), 0)) % 2 = 0)
         |          for i in range(1, len(s))] AS m
         |  FROM sgm$k),
         |seg$k AS (
         |  SELECT w, n,
         |         CASE WHEN tl IS NULL THEN s
         |              ELSE [CASE WHEN m[i] THEN s[i] || s[i + 1] ELSE s[i] END
         |                    for i in range(1, len(s) + 1)
         |                    if i = 1 OR NOT coalesce(m[i - 1], FALSE)]
         |         END AS s
         |  FROM sgn$k)""".stripMargin
    }
    val rounds = (1 to numMerges).map(round).mkString(",\n")
    val finals = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS INTEGER) AS rank, l AS sym_l, r AS sym_r, cnt AS pair_count FROM top$k")
      .mkString("\nUNION ALL ")
    s"""WITH
       |wf AS (SELECT w, COUNT(*) AS n
       |       FROM (SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |             FROM documents WHERE text IS NOT NULL)
       |       WHERE length(w) > 0 GROUP BY w),
       |seg0 AS (SELECT w, n, [substring(w, i, 1) for i in range(1, length(w) + 1)] AS s FROM wf),
       |$rounds
       |SELECT rank, sym_l, sym_r, pair_count FROM ($finals) ORDER BY rank""".stripMargin
  }
}
