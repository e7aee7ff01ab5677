package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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
    * @param dropFields     pyetl's REMOVE_FIELDS: columns discarded after
    *                       parse (payload scrubbing / size control)
    * @param renames        old → new column names (pyetl field mapping)
    * @param lowercaseNames normalize all column names to lowercase (pyetl
    *                       lowercases field names on ingest)
    * @param redactCols     string columns PII-scrubbed in place (emails /
    *                       phone runs → typed tokens) before routing —
    *                       applied AFTER renames/lowercasing, so names here
    *                       refer to the output schema
    * @param casts          column → Spark SQL type name, applied in place
    *                       after renames/lowercasing (pyetl's type
    *                       coercion); an unknown column or type fails fast
    *                       naming the offender
    * @param ingestFile     add an `ingest_file` column carrying the source
    *                       file path (`_metadata.file_path` — pyetl's
    *                       ingest-provenance metadata), free at any scale
    * @param validations    rule name → predicate matching VIOLATING rows
    *                       (the pre-promotion gate: nothing is written when
    *                       any rule's violation count exceeds
    *                       `maxViolations`). All rules run as ONE
    *                       conditional-count pass over the already-cached
    *                       frame — no extra scans; a rule that doesn't
    *                       resolve fails fast naming the rule
    * @param maxViolations  per-rule violation budget (default 0: any
    *                       violating row aborts the run)
    * @param onViolation    "abort" (default — the gate above) or
    *                       "quarantine": instead of aborting, violating
    *                       rows are routed to `quarantineDir` tagged with
    *                       their `violated` rule names (the
    *                       [[Expectations.quarantine]] semantics, batch
    *                       form — [[graft.streaming.Streams.quarantineSink]]'s
    *                       config-driven twin) and the routes see only
    *                       clean rows. A row whose predicate evaluates to
    *                       NULL quarantines (it cannot be certified
    *                       clean). The returned counts gain a
    *                       "__quarantined" entry.
    * @param quarantineDir  dead-letter output dir, required when
    *                       `onViolation = "quarantine"`
    */
  def run(input: DataFrame, baseDir: String,
      routes: Map[String, Route],
      jsonCol: Option[String] = None,
      jsonPaths: Map[String, String] = Map.empty,
      tsSecCol: Option[Column] = None,
      maxRecordsPerFile: Long = 1000000L,
      dropFields: Seq[String] = Nil,
      renames: Map[String, String] = Map.empty,
      lowercaseNames: Boolean = false,
      redactCols: Seq[String] = Nil,
      casts: Map[String, String] = Map.empty,
      ingestFile: Boolean = false,
      validations: Map[String, Column] = Map.empty,
      maxViolations: Long = 0L,
      onViolation: String = "abort",
      quarantineDir: Option[String] = None): Map[String, Long] = {
    require(onViolation == "abort" || onViolation == "quarantine",
      s"onViolation must be 'abort' or 'quarantine': '$onViolation'")
    require(onViolation != "quarantine" || quarantineDir.nonEmpty,
      "onViolation=quarantine needs quarantineDir")
    val parsed0 = jsonCol match {
      case Some(c) => jsonPaths.foldLeft(input) { case (df, (path, name)) =>
        df.withColumn(name, get_json_object(col(c), path))
      }.drop(c)
      case None => input
    }
    // field surgery is pure projection — free at any scale
    val shaped0 = parsed0.drop(dropFields: _*)
    // withColumnRenamed silently no-ops on a missing source column — for a
    // config-driven surface that silence is a data bug (the operator thinks
    // the field was mapped); fail up front, naming the offender
    val missingRenames = renames.keys.filterNot(shaped0.columns.contains)
    require(missingRenames.isEmpty,
      s"rename of nonexistent field(s) [${missingRenames.mkString(", ")}]: " +
        s"input columns are [${shaped0.columns.mkString(", ")}]")
    val shaped1 = renames.foldLeft(shaped0) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    val shaped2 = if (lowercaseNames)
      shaped1.toDF(shaped1.columns.toIndexedSeq.map(_.toLowerCase): _*)
    else shaped1
    // same courtesy for redaction (names refer to the post-rename schema);
    // the raw UNRESOLVED_COLUMN an operator would otherwise get doesn't say
    // which config key produced it
    val missingRedacts = redactCols.filterNot(shaped2.columns.contains)
    require(missingRedacts.isEmpty,
      s"redact column(s) [${missingRedacts.mkString(", ")}] not in schema: " +
        s"columns after rename/lowercase are [${shaped2.columns.mkString(", ")}]")
    val shaped3 = redactCols.foldLeft(shaped2) { (df, c) =>
      df.withColumn(c, JsonEtl.scrub(col(c)))
    }
    // type coercion (pyetl's coercion step) — same fail-fast courtesy:
    // name the config key, don't surface a bare resolution error
    val missingCasts = casts.keys.filterNot(shaped3.columns.contains)
    require(missingCasts.isEmpty,
      s"cast of nonexistent column(s) [${missingCasts.mkString(", ")}]: " +
        s"columns after rename/lowercase are [${shaped3.columns.mkString(", ")}]")
    val shaped4 = casts.foldLeft(shaped3) { case (df, (c, tpe)) =>
      val t = try org.apache.spark.sql.types.DataType.fromDDL(tpe)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"cast of column $c to unknown type '$tpe': ${e.getMessage}") }
      df.withColumn(c, col(c).cast(t))
    }
    val shaped = if (ingestFile)
      shaped4.withColumn("ingest_file", col("_metadata.file_path")) else shaped4
    val enriched = tsSecCol match {
      case Some(sec) => shaped.withColumn("day",
        date_format(timestamp_seconds(sec), "yyyy-MM-dd"))
      case None => shaped
    }
    val cached = enriched.cache()
    try {
      if (validations.nonEmpty) {
        // resolution check per rule so a typo'd column names its config key
        // instead of surfacing a bare UNRESOLVED_COLUMN
        validations.foreach { case (name, pred) =>
          try { cached.select(pred); () }
          catch { case e: Exception => throw new IllegalArgumentException(
            s"validation rule '$name' does not resolve: ${e.getMessage}") }
        }
        if (onViolation == "abort") {
          val aggs = validations.toSeq.map { case (name, pred) =>
            count(when(pred, 1)).as(name) }
          val row = cached.agg(aggs.head, aggs.tail: _*).first()
          val bad = validations.keys.toSeq.sorted
            .map(n => n -> row.getAs[Long](n))
            .filter(_._2 > maxViolations)
          require(bad.isEmpty,
            "validation failed, nothing written: " + bad.map { case (n, c) =>
              s"rule '$n' has $c violating rows (budget $maxViolations)"
            }.mkString("; "))
        }
      }
      val (routeSource, quarantineCount) =
        if (onViolation == "quarantine" && validations.nonEmpty) {
          val (clean, bad) = Expectations.quarantine(cached,
            validations.toSeq.map { case (n, p) => (n, p, 0L) })
          bad.write.mode("overwrite")
            .option("maxRecordsPerFile", maxRecordsPerFile)
            .parquet(quarantineDir.get)
          (clean, Some("__quarantined" ->
            input.sparkSession.read.parquet(quarantineDir.get).count()))
        } else (cached, None)
      routes.map { case (name, r) =>
        val routed = routeSource.filter(r.predicate)
        val writer = routed.write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile)
        val partitioned =
          if (enriched.columns.contains("day")) writer.partitionBy("day") else writer
        r.format match {
          case "json" => partitioned.json(s"$baseDir/$name")
          case _      => partitioned.parquet(s"$baseDir/$name")
        }
        name -> routed.count()
      } ++ quarantineCount
    } finally cached.unpersist()
  }

  /** pyetl's config-driven UX, Spark-native: one JSON document describes the
    * whole pipeline — input path/format, embedded-JSON extraction paths, the
    * epoch-seconds expression the day partition derives from, and predicate
    * routes as ANSI SQL strings — so a non-Scala operator edits config, not
    * code (pyetl's ini file, minus the hand-rolled file rolling).
    *
    * {{{
    * {"input": {"path": "/data/events.parquet", "format": "parquet"},
    *  "baseDir": "/out",
    *  "jsonCol": "props", "jsonPaths": {"$.k": "k"},
    *  "tsSecExpr": "CAST(ts / 1000000000 AS BIGINT)",
    *  "maxRecordsPerFile": 100000,
    *  "routes": {"purchases": {"predicate": "event_type = 'purchase'",
    *                           "format": "json"},
    *             "rest": {"predicate": "event_type <> 'purchase'"}}}
    * }}}
    *
    * Jackson is used directly (it ships on Spark's classpath) — no new
    * dependency; predicates/expressions go through `expr(...)`, so the
    * config surface is exactly Spark SQL, not a private mini-language.
    */
  def runConfig(spark: SparkSession, configJson: String): Map[String, Long] = {
    val root = new ObjectMapper().readTree(configJson)
    def opt(name: String): Option[JsonNode] =
      Option(root.get(name)).filterNot(_.isNull)
    def strMap(n: JsonNode): Map[String, JsonNode] =
      n.properties().asScala.map(e => e.getKey -> e.getValue).toMap
    val input = root.get("input")
    require(input != null && input.hasNonNull("path"), "config needs input.path")
    require(root.hasNonNull("baseDir"), "config needs baseDir")
    require(root.hasNonNull("routes"), "config needs routes")
    // filter JSON null like `opt` does: "format": null must mean "default",
    // not the literal string "null" handed to DataSource resolution
    def optField(n: JsonNode, name: String): Option[JsonNode] =
      Option(n.get(name)).filterNot(_.isNull)
    val format = optField(input, "format").map(_.asText).getOrElse("parquet")
    val routes = strMap(root.get("routes")).map { case (name, r) =>
      require(r.hasNonNull("predicate"), s"route $name needs a predicate")
      name -> Route(expr(r.get("predicate").asText),
        optField(r, "format").map(_.asText).getOrElse("parquet"))
    }
    run(
      input = spark.read.format(format).load(input.get("path").asText),
      baseDir = root.get("baseDir").asText,
      routes = routes,
      jsonCol = opt("jsonCol").map(_.asText),
      jsonPaths = opt("jsonPaths").map(strMap(_).map { case (k, v) => k -> v.asText })
        .getOrElse(Map.empty),
      tsSecCol = opt("tsSecExpr").map(e => expr(e.asText)),
      maxRecordsPerFile = opt("maxRecordsPerFile").map(_.asLong).getOrElse(1000000L),
      dropFields = opt("dropFields")
        .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
      renames = opt("renames").map(strMap(_).map { case (k, v) => k -> v.asText })
        .getOrElse(Map.empty),
      lowercaseNames = opt("lowercaseNames").exists(_.asBoolean),
      redactCols = opt("redact")
        .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
      casts = opt("casts").map(strMap(_).map { case (k, v) => k -> v.asText })
        .getOrElse(Map.empty),
      ingestFile = opt("ingestFile").exists(_.asBoolean),
      validations = opt("validations")
        .map(strMap(_).map { case (k, v) => k -> expr(v.asText) })
        .getOrElse(Map.empty),
      maxViolations = opt("maxViolations").map(_.asLong).getOrElse(0L),
      onViolation = opt("onViolation").map(_.asText).getOrElse("abort"),
      quarantineDir = opt("quarantineDir").map(_.asText))
  }
}
