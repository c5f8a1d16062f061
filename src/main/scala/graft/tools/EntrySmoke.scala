package graft.tools
import org.apache.spark.sql.SparkSession
/** Replicates the driver's smoke check: SparkEntry.entry(spark) rows > 0.
  * The driver builds its own session (without our confs) — so do we here. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.printSchema()
    df.show(5, false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
