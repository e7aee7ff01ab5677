package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The pyetl loop as one composable API: parse embedded JSON → enrich
  * (derived day partition, normalized type tag) → predicate routes → each
  * route written day-partitioned with rolled files.
  *
  * pyetl runs this per-message in Python with hand-rolled file rolling;
  * here it's one declarative plan per route over a shared cached parse, so
  * the source is read and parsed once regardless of route count, and the
  * writers inherit partition pruning + bounded files. The streaming twin is
  * graft.streaming.Streams.multiSink.
  */
object Pipeline {

  /** One sink route: predicate + output format ("parquet" | "json"). */
  final case class Route(predicate: Column, format: String = "parquet")

  /** @param jsonCol   column holding an embedded JSON string (parsed fields
    *                  are hoisted via `get_json_object`, pyetl's "extract")
    * @param jsonPaths path → output-column, e.g. Map("$.k" -> "k")
    * @param tsSecCol  epoch-seconds column the day partition derives from
    */
  def run(input: DataFrame, baseDir: String,
      routes: Map[String, Route],
      jsonCol: Option[String] = None,
      jsonPaths: Map[String, String] = Map.empty,
      tsSecCol: Option[Column] = None,
      maxRecordsPerFile: Long = 1000000L): Map[String, Long] = {
    val parsed0 = jsonCol match {
      case Some(c) => jsonPaths.foldLeft(input) { case (df, (path, name)) =>
        df.withColumn(name, get_json_object(col(c), path))
      }.drop(c)
      case None => input
    }
    val enriched = tsSecCol match {
      case Some(sec) => parsed0.withColumn("day",
        date_format(timestamp_seconds(sec), "yyyy-MM-dd"))
      case None => parsed0
    }
    val cached = enriched.cache()
    try
      routes.map { case (name, r) =>
        val routed = cached.filter(r.predicate)
        val writer = routed.write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile)
        val partitioned =
          if (enriched.columns.contains("day")) writer.partitionBy("day") else writer
        r.format match {
          case "json" => partitioned.json(s"$baseDir/$name")
          case _      => partitioned.parquet(s"$baseDir/$name")
        }
        name -> routed.count()
      }
    finally cached.unpersist()
  }
}
