package graft
import org.apache.spark.sql.SparkSession

/** Scratch schema probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"=== $t  rows=${df.count()}")
      df.printSchema()
      df.show(3, 60)
    }
    spark.stop()
  }
}
