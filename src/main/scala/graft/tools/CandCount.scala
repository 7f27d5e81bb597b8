package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Diagnose d02's replica-scale blowup: count LSH band-join candidate
  * pairs and split them into within-copy vs cross-copy (copy = doc_id
  * range block), at each scale dir. Docs-per-copy is parameterized
  * (round-15 advice): pass `docs=<n>` as any arg (default 5000 — the
  * sf0.1 base [[ScaleStressR15]] replicates). */
object CandCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val maxDoc = args.collectFirst {
      case a if a.startsWith("docs=") => a.stripPrefix("docs=").toLong
    }.getOrElse(5000L)
    for (dir <- args.filterNot(_.startsWith("docs="))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val base = docs.repartition(32).select(
        col("doc_id").as("_id"),
        Dedup.hashedShingles(col("text"), 5).as("_hs"))
      val sigs = base.select(col("_id"),
        Dedup.minHashSignature(col("_hs"), 64).as("_sig"))
      val banded = sigs.select(col("_id"),
        posexplode(Dedup.bandKeys(col("_sig"), 32, 2))
          .as(Seq("_band", "_bh")))
      val a = banded.select(col("_id").as("a_id"), col("_band"), col("_bh"))
      val b = banded.select(col("_id").as("b_id"),
        col("_band").as("_b2"), col("_bh").as("_h2"))
      val cand = a.join(b,
        col("_band") === col("_b2") && col("_bh") === col("_h2") &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      val split = cand.agg(
        count(lit(1)).as("n_cand"),
        sum(when(floor(col("a_id") / maxDoc) === floor(col("b_id") / maxDoc),
          1L).otherwise(0L)).as("within"),
        sum(when(floor(col("a_id") / maxDoc) =!= floor(col("b_id") / maxDoc),
          1L).otherwise(0L)).as("cross")).collect()(0)
      println(s"[cand] $dir n_cand=${split.getLong(0)} " +
        s"within_copy=${split.getLong(1)} cross_copy=${split.getLong(2)}")
    }
    spark.stop()
  }
}
