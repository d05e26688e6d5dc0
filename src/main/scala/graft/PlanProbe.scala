package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspector for the query inventory: prints
  * `explain("formatted")` for the named queries (all of them with no args)
  * against sf0.001, so shuffle counts, broadcast choices, pushed filters and
  * WholeStageCodegen spans can be reviewed without wiring a REPL.
  *
  * Usage: java -cp ... graft.PlanProbe [queryName ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"=== $n ===")
          try q(spark, sfDir).explain("formatted")
          catch { case e: Exception => println(s"[plan-probe] $n failed: $e") }
        case None => println(s"[plan-probe] unknown query: $n")
      }
    }
    spark.stop()
  }
}
