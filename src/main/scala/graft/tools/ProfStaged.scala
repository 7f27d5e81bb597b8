package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProfStaged {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val f = args.lift(1).map(_.toInt).getOrElse(10)
    val outDir = s"/tmp/graft_prof_staged_${f}x"
    ScaleStressR15.buildDocsScaled(spark, baseDir, outDir, f)
    val docs = spark.read.parquet(s"$outDir/documents.parquet").repartition(32)
    val base = docs.select(col("doc_id").as("_id"),
      Dedup.hashedShingles(col("text"), 5).as("_hs"))
    val sigs = base.select(col("_id"),
      Dedup.minHashSignature(col("_hs"), 64).as("_sig"))
    val sg8 = transform(col("_sig"), x => (x.bitwiseAND(lit(255L)) - 128).cast("byte"))
    val bandedS = sigs.select(col("_id"), sg8.as("_sg8"),
      posexplode(Dedup.bandKeys(col("_sig"), 32, 2)).as(Seq("_band", "_bh")))
    val aS = bandedS.select(col("_id").as("a_id"), col("_sg8").as("_sg8_a"), col("_band"), col("_bh"))
    val bS = bandedS.select(col("_id").as("b_id"), col("_sg8").as("_sg8_b"),
      col("_band").as("_band2"), col("_bh").as("_bh2"))
    val agree8 = size(filter(zip_with(col("_sg8_a"), col("_sg8_b"), (x, y) => x === y), h => h))
    val sigCut = math.max(0.0, 0.5 - 4.0 * math.sqrt(0.25 / 64))
    val joined = aS.join(bS,
      col("_band") === col("_band2") && col("_bh") === col("_bh2") && col("a_id") < col("b_id"))
    val sigsW = base.select(col("_id"),
      transform(Dedup.minHashSignature(col("_hs"), 256),
        x => (x.bitwiseAND(lit(255L)) - 128).cast("byte")).as("_sgw"))
    val aW = aS.join(sigsW.select(col("_id").as("a_id"), col("_sgw").as("_sgw_a")), Seq("a_id"))
    val bW = bS.join(sigsW.select(col("_id").as("b_id"), col("_sgw").as("_sgw_b")), Seq("b_id"))
    val agreeW = size(filter(zip_with(col("_sgw_a"), col("_sgw_b"), (x, y) => x === y), h => h))
    val cut2 = 0.5 - 4.0 * math.sqrt(0.25 / 256)
    val joinedW = aW.join(bW,
      col("_band") === col("_band2") && col("_bh") === col("_bh2") && col("a_id") < col("b_id"))
    val r = joinedW.agg(count(lit(1)).as("n_cand"),
      sum(when(agree8 >= lit(sigCut * 64), 1L).otherwise(0L)).as("n_pass"),
      sum(when(agree8 >= lit(sigCut * 64) && agreeW >= lit(cut2 * 256), 1L)
        .otherwise(0L)).as("n_pass_w")).collect()(0)
    println(s"[prof-staged] ${f}x cand=${r.getLong(0)} agree8_pass=${r.getLong(1)} wide_pass=${r.getLong(2)}")
    val distinctPass = joinedW.filter(agree8 >= lit(sigCut * 64) && agreeW >= lit(cut2 * 256))
      .select("a_id", "b_id").distinct().count()
    println(s"[prof-staged] ${f}x distinct_wide_pass=$distinctPass")
    val p = new org.apache.hadoop.fs.Path(outDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
