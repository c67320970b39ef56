package graft
import org.apache.spark.sql.SparkSession
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = graft.io.Transcripts.generate(spark, n, partitions = cpus * 4).toDF()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      Pipeline.extractTurns(turns).toDF().selectExpr("sum(best_count)").collect()
      val dt = (System.nanoTime()-t0)/1e9
      println(f"SCALE cpus=$cpus n=$n rep=$r sec=$dt%.2f tps=${n/dt}%.0f")
    }
    spark.stop()
  }
}
