package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

class BloomSpec extends SparkSpec {

  private def regSet(
      df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("registers: 32-lane envelope holds; shape sentinel present; nulls excluded; empty input -> empty frame") {
    import spark.implicits._
    val df = ((0 until 500).map(i => s"v$i") :+ null).toDF("v")
    val regs = Bloom.registers(df, Nil, "v", mBits = 1024, k = 3).collect()
    val (sentinels, data) = regs.partition(_.getLong(0) == -1L)
    assert(data.nonEmpty)
    data.foreach { r =>
      val (w, b) = (r.getLong(0), r.getLong(1))
      assert(w >= 0 && w < 1024 / 32, s"word $w outside envelope")
      assert(b >= 1L && b <= (1L << 32) - 1, s"bits $b outside 32-lane cap")
    }
    // exactly ONE fingerprint row per group, decodable to (mBits, k)
    assert(sentinels.length === 1)
    assert(sentinels.head.getLong(1) === 1024L * 32 + 3)
    assert(Bloom.registers(df.limit(0), Nil, "v", 1024, 3).count() === 0)
  }

  test("merge: merge(sketch(A), sketch(B)) == sketch(A union B) exactly; self-merge idempotent") {
    import spark.implicits._
    val a = (0 until 300).map(i => s"a$i").toDF("v")
    val b = (0 until 200).map(i => s"b$i").toDF("v")
    val sa = Bloom.registers(a, Nil, "v", 2048, 3)
    val sb = Bloom.registers(b, Nil, "v", 2048, 3)
    assert(regSet(Bloom.merge(sa, sb, Nil, 2048)) ===
      regSet(Bloom.registers(a.unionByName(b), Nil, "v", 2048, 3)))
    // OR is idempotent — replaying the same registers changes nothing
    assert(regSet(Bloom.merge(sa, sa, Nil)) === regSet(sa))
  }

  test("merge guard: an out-of-envelope register raises; in-envelope passes") {
    import spark.implicits._
    val ok = Bloom.registers((0 until 50).map(i => s"v$i").toDF("v"), Nil, "v", 1024, 3)
    // a frame built at larger mBits carries words beyond 1024/32
    val big = Bloom.registers((0 until 200).map(i => s"v$i").toDF("v"), Nil, "v", 8192, 3)
    assert(big.agg(max("_word")).head.getLong(0) >= 1024 / 32)
    val e = intercept[Exception] {
      Bloom.merge(ok, big, Nil, mBits = 1024).collect()
    }
    assert(e.getMessage.contains("Bloom merge shape mismatch"))
    Bloom.merge(ok, ok, Nil, mBits = 1024).collect() // must not throw
  }

  test("shape fingerprint: the SMALLER frame and the same-mBits different-k frame are caught") {
    import spark.implicits._
    val vs = (0 until 50).map(i => s"v$i").toDF("v")
    val big = Bloom.registers(vs, Nil, "v", 8192, 3)
    // a smaller-mBits frame: every data word FITS the 8192 envelope, so
    // only the sentinel fingerprint can catch it
    val small = Bloom.registers(vs, Nil, "v", 1024, 3)
    val e1 = intercept[Exception] {
      Bloom.merge(big, small, Nil, mBits = 8192).collect()
    }
    assert(e1.getMessage.contains("shape mismatch"))
    // same mBits, different k: invisible to the envelope AND the mBits
    // digit — only the full (mBits, k) fingerprint sees it
    val k5 = Bloom.registers(vs, Nil, "v", 8192, 5)
    Bloom.merge(big, k5, Nil, mBits = 8192).collect() // mBits-only: passes
    val e2 = intercept[Exception] {
      Bloom.merge(big, k5, Nil, mBits = 8192, k = 3).collect()
    }
    assert(e2.getMessage.contains("shape mismatch"))
    // probe/stats assert the fingerprint too
    val probe = Seq((1, "v1")).toDF("id", "v")
    val e3 = intercept[Exception] {
      Bloom.mightContain(small, probe, Nil, Seq("id"), "v", 8192, 3).collect()
    }
    assert(e3.getMessage.contains("shape mismatch"))
    val e4 = intercept[Exception] {
      Bloom.stats(k5, Nil, 8192, 3).collect()
    }
    assert(e4.getMessage.contains("shape mismatch"))
    // matching shape everywhere: clean pass end-to-end
    Bloom.merge(big, big, Nil, mBits = 8192, k = 3).collect()
    assert(Bloom.mightContain(big, probe, Nil, Seq("id"), "v", 8192, 3)
      .head.getAs[Boolean]("might_contain"))
  }

  test("mightContain: no false negatives ever; false positives live at tight m, gone at ample m") {
    import spark.implicits._
    val members = (0 until 400).map(i => s"member_$i")
    val ghosts = (0 until 400).map(i => s"ghost_$i")
    val df = members.toDF("v")
    def hits(mBits: Int) = {
      val regs = Bloom.registers(df, Nil, "v", mBits, 3)
      val probe = (members ++ ghosts).zipWithIndex.map(_.swap).toDF("id", "v")
      Bloom.mightContain(regs, probe, Nil, Seq("id"), "v", mBits, 3)
        .collect().map(r => r.getAs[String]("v") -> r.getAs[Boolean]("might_contain")).toMap
    }
    // tight: 1024 bits for 400x3 insertions -> fill ~0.7, FPs guaranteed
    val tight = hits(1024)
    members.foreach(v => assert(tight(v), s"false negative on $v"))
    assert(ghosts.exists(tight(_)), "expected live false positives at fill ~0.7")
    // ample: 2^18 bits -> fp ~ 1e-7; md5 is fixed, so this is a
    // deterministic regression pin, not a probabilistic claim
    val ample = hits(1 << 18)
    members.foreach(v => assert(ample(v)))
    ghosts.foreach(v => assert(!ample(v), s"false positive on $v at ample m"))
  }

  test("grouped filters: probes answer against their OWN group; a group with no registers answers false") {
    import spark.implicits._
    val df = Seq(("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "v")
    val regs = Bloom.registers(df, Seq("g"), "v", 4096, 3)
    val probe = Seq(
      (1, "g1", "x"), (2, "g2", "x"), (3, "g2", "z"),
      (4, "g3", "x")).toDF("id", "g", "v")
    val out = Bloom.mightContain(regs, probe, Seq("g"), Seq("id"), "v", 4096, 3)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[Boolean]("might_contain")).toMap
    assert(out(1), "member of g1 must hit g1's filter")
    assert(!out(2), "x was never inserted into g2's filter")
    assert(out(3))
    assert(!out(4), "a group with no registers is the empty filter")
  }

  test("stats: bits_set bounded by k*n and mBits; occupancy inversion tracks true n; saturation -> null estimate") {
    import spark.implicits._
    val n = 400
    val df = (0 until n).map(i => s"v$i").toDF("v")
    val st = Bloom.stats(Bloom.registers(df, Nil, "v", 8192, 3), Nil, 8192, 3).head
    val bitsSet = st.getAs[Long]("bits_set")
    assert(bitsSet > 0 && bitsSet <= math.min(8192L, 3L * n))
    val estN = st.getAs[Double]("est_inserted")
    assert(math.abs(estN - n) / n < 0.1, s"occupancy inversion $estN vs $n")
    assert(st.getAs[Double]("est_fp_rate") > 0.0)
    // saturate a tiny filter: every bit set -> inversion diverges -> null
    val sat = Bloom.stats(
      Bloom.registers((0 until 2000).map(i => s"v$i").toDF("v"), Nil, "v", 32, 3),
      Nil, 32, 3).head
    assert(sat.getAs[Long]("bits_set") === 32L)
    assert(sat.isNullAt(sat.fieldIndex("est_inserted")))
  }

  test("bloom-as-file-filter (q97): equality pruning is conservative-exact — " +
      "every file truly holding the key is kept; an absent key prunes files " +
      "min/max never could") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8 "files", each holding keys (fid*100)..(fid*100+99) plus the
    // common key 42 in even files only — min/max bounds all straddle 42
    val rows = (0 until 8).flatMap { fid =>
      val own = (0 until 100).map(i => (fid.toLong, (fid * 100 + i).toLong))
      if (fid % 2 == 0) own :+ ((fid.toLong, 42L)) else own
    }.toDF("file_id", "key")
    val (m, k) = (8192, 4)
    val regs = Bloom.registers(rows, Seq("file_id"), "key", m, k)
    def touches(v: Long): Map[Long, Boolean] =
      Bloom.mightContain(regs,
        rows.select("file_id").distinct().withColumn("_v", lit(v)),
        Seq("file_id"), Nil, "_v", m, k)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val t42 = touches(42L)
    // no false negatives: every even file (truly holds 42) is kept
    (0 until 8).filter(_ % 2 == 0).foreach(f =>
      assert(t42(f.toLong), s"file $f holds 42 but bloom pruned it"))
    // an absent key prunes: no file holds 99999, and at this fill the
    // deterministic lanes keep nothing (pinned — md5 lanes are fixed)
    val tAbs = touches(99999L)
    assert(!tAbs.values.exists(identity),
      s"absent key kept files: ${tAbs.filter(_._2).keys}")
  }
}
