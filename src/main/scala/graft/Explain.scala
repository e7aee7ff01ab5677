package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the formatted physical plan of named
  * SparkEntry queries (all of them if no names given). Dev/judge tool for
  * the scale review loop — check PushedFilters, ReadSchema, broadcast
  * choices and WholeStageCodegen spans without running the query.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
