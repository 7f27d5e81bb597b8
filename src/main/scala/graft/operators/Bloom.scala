package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom membership filters as FIRST-CLASS relational state — the 100 TB
  * set-membership primitive (decontamination probes, blocklist checks,
  * "seen before?" gates) kept deliberately outside Spark's black-box
  * [[org.apache.spark.util.sketch.BloomFilter]] (which [[BloomJoin]] uses
  * for driver-built join pruning): here the filter IS a small DataFrame of
  * `(group, word, bits)` integer registers, so it composes with everything
  * else in the engine — persist it, union it, OR-fold it across days or
  * micro-batches, probe whenever. Completes the sketch-register family:
  * HLL (distinct) / CMS (frequency) / KMV (set ops) / q-digest (quantiles)
  * / Misra-Gries (heavy hitters) / Bloom (membership).
  *
  * North-star extension (not in the reference — the reference has no
  * approximate surface at all). Classic Bloom (1970): `k` hash positions
  * per value over an `mBits`-bit array; a probe is a member-candidate iff
  * all `k` bits are set — NO false negatives by construction, false
  * positives at rate ≈ `fill^k`. Hashing is the engine-portable
  * [[Dedup.hash56]] of `"i:value"` (the [[Cms]] row-salt recipe), so a
  * DuckDB oracle replays the registers, every probe, and the fill
  * statistics bit-for-bit.
  *
  * Register layout: positions are packed 32 LANES per BIGINT word
  * (`_word = pos DIV 32`, bit `pos % 32`) rather than 64 — the top lane of
  * a 64-bit pack would need `1 << 63`, whose sign/overflow behavior is the
  * one shift the two engines disagree on (Spark wraps silently; DuckDB
  * checks). Valid registers therefore always have `_bits ∈ [1, 2³²−1]`,
  * which is also what the merge guard enforces.
  *
  * Scale shape: [[registers]] is ONE map-side-combined (group, word)
  * `bit_or` aggregate — shuffle ∝ groups × mBits/32 (register frames,
  * never rows); [[merge]] is a union + the same `bit_or` fold (bitwise OR
  * is associative, commutative, idempotent — sketch(A ∪ B) ==
  * merge(sketch(A), sketch(B)) EXACTLY, which is what makes the filter
  * incrementally maintainable); [[mightContain]] broadcast-joins the
  * register frame to the probe side (registers are KBs — mBits/32 words
  * per group), so probing never shuffles the corpus. Nothing downstream
  * of the first aggregate ever touches the raw values.
  */
object Bloom {

  private def checkShape(mBits: Int, k: Int): Unit = {
    require(mBits >= 32 && mBits % 32 == 0 && mBits <= (1 << 28),
      s"mBits must be a multiple of 32 in [32, 2^28], got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
  }

  /** The `(mBits, k)` fingerprint STAGED WITH THE STATE: every register
    * frame carries one sentinel row per group at `_word = -1` with
    * `_bits = mBits·32 + k` (decodable: `mBits = _bits DIV 32`,
    * `k = _bits % 32`). `_word = -1` can never collide with a data word
    * (the envelope is `[0, mBits/32)`), and OR-folding identical
    * fingerprints is idempotent, so [[merge]] ≡ one-shot build still holds
    * exactly. The fingerprint is what lets the guarded merge catch a
    * SMALLER-mBits frame (whose data words all fit inside a larger
    * envelope) — the failure direction the envelope check alone cannot
    * see, which would silently break the no-false-negative guarantee. */
  private[graft] def shapeCode(mBits: Int, k: Int): Long =
    mBits.toLong * 32L + k

  /** The `i`-th hash position of value column `v` in `[0, mBits)` —
    * [[Dedup.hash56]] of `"i:value"`, the same salt-prefix recipe as
    * [[Cms]] rows, so both engines derive identical positions. */
  private def position(i: Column, v: Column, mBits: Int): Column =
    Dedup.hash56(concat(i.cast("string"), lit(":"), v.cast("string"))) %
      mBits.toLong

  /** Register frame for `valueCol` per `keys`: one row per (group,
    * non-empty word) — `(keys*, _word, _bits)` with `_bits` the OR of the
    * 32 lane masks landed in that word — PLUS one [[shapeCode]] sentinel
    * row per group at `_word = -1` (emitted inside the SAME explode, so
    * the corpus is still scanned exactly once; the map-side combiner
    * absorbs the per-row sentinel copies). Null values are excluded (a
    * null is not a member of any set). Empty words are implicit (0) and
    * reconstructed by [[mightContain]]/[[stats]]; an empty input yields an
    * empty frame (no data, no sentinel). */
  def registers(
      df: DataFrame, keys: Seq[String], valueCol: String,
      mBits: Int, k: Int): DataFrame = {
    checkShape(mBits, k)
    df.where(col(valueCol).isNotNull)
      .select((keys.map(col) :+ col(valueCol).as("_v")): _*)
      // i = -1 is the sentinel lane; i in [0, k) are the hash positions
      .withColumn("_i", explode(sequence(lit(-1), lit(k - 1))))
      .withColumn("_pos", position(col("_i"), col("_v"), mBits))
      .select(
        (keys.map(col) :+
          when(col("_i") === lit(-1), lit(-1L))
            .otherwise(expr("_pos DIV 32")).as("_word") :+
          when(col("_i") === lit(-1), lit(shapeCode(mBits, k)))
            .otherwise(
              expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))"))
            .as("_bits")): _*)
      .groupBy((keys :+ "_word").map(col): _*)
      .agg(expr("bit_or(_bits)").as("_bits"))
  }

  /** OR-fold two register frames (same keys/mBits/k): the Bloom merge —
    * exact, associative, idempotent: the merged frame is bit-identical to
    * [[registers]] over the unioned inputs (sentinels included — OR of
    * identical fingerprints is the fingerprint).
    *
    * CONTRACT: both frames must have been built by [[registers]] with the
    * SAME `(mBits, k)` — OR-folding registers of different shapes silently
    * produces a meaningless filter (positions don't line up). Pass
    * `(mBits, k)` to enforce it: every data row is plan-guarded to
    * `_word ∈ [0, mBits/32)` and `_bits ∈ [1, 2³²−1]`, and every
    * [[shapeCode]] sentinel row must equal `mBits·32 + k` exactly — which
    * catches BOTH directions, including the smaller-mBits frame whose data
    * words fit inside the larger envelope (the false-negative factory the
    * envelope alone cannot see). The `mBits`-only form checks the
    * sentinel's mBits digit but not k; the 3-arg form skips the guard for
    * callers that already hold the invariant structurally (e.g. the
    * streaming attach, which pins the shape via its API). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "_word").map(col): _*)
      .agg(expr("bit_or(_bits)").as("_bits"))

  /** [[merge]] with the envelope + sentinel-mBits guard (see contract). */
  def merge(
      a: DataFrame, b: DataFrame, keys: Seq[String], mBits: Int): DataFrame =
    merge(guardShape(a, mBits, None), guardShape(b, mBits, None), keys)

  /** [[merge]] with the FULL `(mBits, k)` fingerprint guard (see
    * contract). */
  def merge(
      a: DataFrame, b: DataFrame, keys: Seq[String], mBits: Int,
      k: Int): DataFrame =
    merge(guardShape(a, mBits, Some(k)), guardShape(b, mBits, Some(k)), keys)

  /** Plan-guard a register frame against the declared shape: data rows to
    * the envelope, sentinel rows to the fingerprint (mBits digit only when
    * `k` is unknown). Rows pass through unchanged; a violation raises at
    * execution. */
  private def guardShape(
      df: DataFrame, mBits: Int, kOpt: Option[Int]): DataFrame = {
    checkShape(mBits, kOpt.getOrElse(1))
    val nWords = mBits / 32
    val laneCap = (1L << 32) - 1L
    val sentinelBad = kOpt match {
      case Some(k) => col("_bits") =!= lit(shapeCode(mBits, k))
      case None => expr("_bits DIV 32") =!= lit(mBits.toLong)
    }
    val dataBad =
      col("_word") < 0 || col("_word") >= lit(nWords.toLong) ||
        col("_bits") < 1 || col("_bits") > lit(laneCap)
    df.withColumn("_bits",
      when(
        when(col("_word") === lit(-1L), sentinelBad).otherwise(dataBad),
        raise_error(concat(
          lit("Bloom merge shape mismatch: register (word="),
          col("_word").cast("string"), lit(", bits="),
          col("_bits").cast("string"),
          lit(s") violates the mBits=$mBits" +
            kOpt.map(k => s", k=$k").getOrElse("") +
            s" contract (envelope [0,$nWords) x [1,$laneCap]; sentinel " +
            s"fingerprint at _word=-1)")))
          .cast("bigint"))
        .otherwise(col("_bits")))
  }

  /** Strip the sentinel rows AND assert their fingerprint in the same
    * filter (one predicate cannot be split by pushdown, so the check can't
    * be optimized away): keeps data rows, drops a MATCHING sentinel,
    * raises on a mismatched one. A frame with no sentinel at all passes —
    * the fingerprint is a tripwire for [[registers]]-built state, not a
    * proof of provenance. */
  private def dataRows(regs: DataFrame, mBits: Int, k: Int): DataFrame =
    regs.where(
      when(col("_word") === lit(-1L),
        when(col("_bits") =!= lit(shapeCode(mBits, k)),
          raise_error(concat(
            lit(s"Bloom shape mismatch: sentinel fingerprint "),
            col("_bits").cast("string"),
            lit(s" != declared ${shapeCode(mBits, k)} (mBits=$mBits, k=$k)")))
            .cast("boolean"))
          .otherwise(lit(false)))
        .otherwise(lit(true)))

  /** Probe `probe`'s `valueCol` against a register frame: adds
    * `might_contain` (true iff all `k` positions are set — never a false
    * negative, false positives at ≈ fill^k). Output = `idCols ++ keys :+
    * valueCol :+ might_contain`, one row per distinct such tuple.
    *
    * `keys` must exist on BOTH frames (the probe row is checked against
    * its own group's filter); a group with no registers at all answers
    * false for everything (the empty filter). The register side is
    * broadcast — probing is one broadcast hash join + one
    * combiner-absorbed fold, shuffle ∝ probe tuples, never × k. */
  def mightContain(
      regs: DataFrame, probe: DataFrame, keys: Seq[String],
      idCols: Seq[String], valueCol: String, mBits: Int, k: Int): DataFrame = {
    checkShape(mBits, k)
    val outKeys = (idCols ++ keys :+ valueCol).map(col)
    probe.where(col(valueCol).isNotNull)
      .select(((idCols ++ keys).map(col) :+ col(valueCol)): _*)
      .withColumn("_i", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("_pos", position(col("_i"), col(valueCol), mBits))
      .withColumn("_word", expr("_pos DIV 32"))
      .withColumn("_mask",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))"))
      .join(broadcast(dataRows(regs, mBits, k)), keys :+ "_word", "left")
      .groupBy(outKeys: _*)
      .agg(expr("bool_and((COALESCE(_bits, CAST(0 AS BIGINT)) & _mask) = _mask)")
        .as("might_contain"))
  }

  /** Fold a register frame to one audit row per group: `(keys*, bits_set,
    * fill_ratio, est_inserted, est_fp_rate)` — population count, fill
    * X/m, the standard occupancy inversion `n̂ = −(m/k)·ln(1 − X/m)`
    * (null at saturation, where the inversion diverges), and the probe
    * false-positive rate `(X/m)^k`. Doubles are [[stableRound]]ed (6 dp);
    * `bits_set` stays exact BIGINT — `bit_count` agrees across engines. */
  def stats(regs: DataFrame, keys: Seq[String], mBits: Int, k: Int): DataFrame = {
    checkShape(mBits, k)
    val m = mBits.toDouble
    dataRows(regs, mBits, k)
      .groupBy(keys.map(col): _*)
      .agg(sum(expr("bit_count(_bits)")).as("bits_set"))
      .select(
        (keys.map(col) :+ col("bits_set") :+
          stableRound(col("bits_set") / m, 6).as("fill_ratio") :+
          stableRound(
            when(col("bits_set") < mBits.toLong,
              -lit(m / k) * log(lit(1.0) - col("bits_set") / m)), 6)
            .as("est_inserted") :+
          stableRound(pow(col("bits_set") / m, k.toDouble), 6)
            .as("est_fp_rate")): _*)
  }
}
