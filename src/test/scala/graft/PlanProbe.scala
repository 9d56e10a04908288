package graft

import org.apache.spark.sql.SparkSession

/** Ad hoc physical-plan printer: `sbt 'Test/runMain graft.PlanProbe <gate> [gate...]'`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      println(Queries.queries(name)(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
