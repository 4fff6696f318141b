package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one or more
  * registered queries (PLANS.md raw material). Usage:
  *   runMain graft.PlanDump q_topk q_dedup_near [...]
  * With no args, dumps every registered query. Env: SPARK_GRAFT_SF_DIR
  * (default sf0.01), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
