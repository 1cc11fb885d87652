import org.apache.spark.sql.SparkSession
object Plan236 {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q236_tpch_q17","q237_tpch_q22")) {
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.001").queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
  }
}
