package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.etl.Pipeline
import graft.streaming.Streams
import graft.streaming.Streams.Event
import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end pyetl parity: the full batch loop (parse → enrich → route →
  * partitioned rolled writes) and streaming restart/exactly-once behavior.
  */
class PipelineSpec extends SparkSpec {

  test("batch pipeline: parse, enrich, route, day-partitioned rolled writes") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val ev = Tables(spark, sf).events
    val counts = Pipeline.run(ev, dir,
      routes = Map(
        "purchases" -> Pipeline.Route(col("event_type") === "purchase", "json"),
        "everything_else" -> Pipeline.Route(col("event_type") =!= "purchase")),
      jsonCol = Some("props"),
      jsonPaths = Map("$.k" -> "k"),
      tsSecCol = Some((col("ts") / 1000000000L).cast(LongType)),
      maxRecordsPerFile = 10)
    assert(counts("purchases") + counts("everything_else") === ev.count())
    // JSON route: parsed field + day partition survive the round trip
    val purchases = spark.read.json(s"$dir/purchases")
    assert(purchases.count() === counts("purchases"))
    assert(purchases.columns.contains("k"))
    assert(purchases.columns.contains("day"))
    assert(!purchases.columns.contains("props"), "raw payload is dropped after parse")
    // parquet route: day-partition dirs exist (pruning) with rolled files
    val dayDirs = new java.io.File(s"$dir/everything_else").listFiles()
      .filter(_.getName.startsWith("day="))
    assert(dayDirs.nonEmpty)
    assert(dayDirs.exists(_.listFiles().count(_.getName.endsWith(".parquet")) > 1))
  }

  test("config-driven pipeline: a JSON config string drives the full run") {
    val dir = Files.createTempDirectory("graft-pipe-cfg").toString
    // the config path reads the RAW parquet (no Tables.tsToNanos seam), so
    // the ts expression must match the generation on disk: a nanos-epoch
    // LongType generation fed to CAST(ts AS TIMESTAMP) would interpret the
    // long as SECONDS and produce far-future day partitions the count
    // assertions below would silently accept — hence the type branch AND
    // the plausible-day assertion against the Tables-normalized truth.
    val tsType = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val tsSecExpr =
      if (tsType == LongType) "CAST(ts / 1000000000 AS BIGINT)"
      else "unix_seconds(CAST(ts AS TIMESTAMP))"
    val config = s"""{
      "input": {"path": "$sf/events.parquet", "format": "parquet"},
      "baseDir": "$dir",
      "jsonCol": "props",
      "jsonPaths": {"$$.k": "k"},
      "tsSecExpr": "$tsSecExpr",
      "maxRecordsPerFile": 10,
      "routes": {
        "purchases": {"predicate": "event_type = 'purchase'", "format": "json"},
        "everything_else": {"predicate": "event_type <> 'purchase'"}
      }
    }"""
    val counts = Pipeline.runConfig(spark, config)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    assert(counts("purchases") + counts("everything_else") === ev.count())
    // identical round-trip semantics to the programmatic run
    val purchases = spark.read.json(s"$dir/purchases")
    assert(purchases.count() === counts("purchases"))
    assert(purchases.columns.contains("k"))
    assert(purchases.columns.contains("day"))
    assert(!purchases.columns.contains("props"), "raw payload is dropped after parse")
    val dayDirs = new java.io.File(s"$dir/everything_else").listFiles()
      .filter(_.getName.startsWith("day="))
    assert(dayDirs.nonEmpty)
    // the day partitions must be the REAL event days, not an artifact of a
    // mis-typed ts expression: compare against the generation-independent
    // normalization (Tables.tsToNanos → floor-seconds → yyyy-MM-dd)
    val expectDays = Tables(spark, sf).events
      .select(date_format(timestamp_seconds((col("ts") / 1000000000L)
        .cast(LongType)), "yyyy-MM-dd").as("day"))
      .distinct().collect().map(_.getString(0)).toSet
    val gotDays = dayDirs.map(_.getName.stripPrefix("day=")).toSet
    assert(gotDays.subsetOf(expectDays),
      s"config-run day partitions must be real event days; got ${gotDays.take(3)} " +
        s"expected within ${expectDays.take(3)}")
  }

  test("config validation: missing pieces fail fast with a clear message") {
    val bad = """{"input": {"path": "/nope"}, "baseDir": "/tmp/x"}"""
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, bad))
    assert(e.getMessage.contains("routes"))
  }

  test("config validation: a route without a predicate is named in the error") {
    val bad = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "routes": {"good": {"predicate": "value > 0"}, "broken": {"format": "json"}}}"""
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, bad))
    assert(e.getMessage.contains("broken"), s"error must name the route: ${e.getMessage}")
  }

  test("config validation: an unparseable predicate surfaces Spark's SQL error") {
    val bad = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "routes": {"oops": {"predicate": "event_type ==== 'x'"}}}"""
    // expr() parses eagerly, so the bad SQL fails at config time with the
    // parser's message (which quotes the offending fragment), not mid-write
    val e = intercept[Exception](Pipeline.runConfig(spark, bad))
    assert(e.getClass.getName.contains("ParseException")
      || e.isInstanceOf[org.apache.spark.sql.AnalysisException], e.getClass.getName)
    assert(e.getMessage.contains("===="), s"parser error should quote the fragment: ${e.getMessage}")
  }

  test("config validation: redacting a nonexistent column names the offender") {
    val bad = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "redact": ["no_such_col"],
      "routes": {"all": {"predicate": "true"}}}"""
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, bad))
    assert(e.getMessage.contains("no_such_col"),
      s"error must name the missing redact column: ${e.getMessage}")
    assert(e.getMessage.contains("event_type"),
      s"error should list the available columns: ${e.getMessage}")
  }

  test("config validation: renaming a nonexistent field names the offender") {
    // withColumnRenamed silently no-ops on a missing column — the config
    // surface must not inherit that silence
    val bad = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "renames": {"ghost_field": "renamed"},
      "routes": {"all": {"predicate": "true"}}}"""
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, bad))
    assert(e.getMessage.contains("ghost_field"),
      s"error must name the missing rename source: ${e.getMessage}")
    assert(e.getMessage.contains("event_type"),
      s"error should list the available columns: ${e.getMessage}")
  }

  test("config casts coerce types in place; ingestFile records provenance") {
    val dir = Files.createTempDirectory("graft-pipe-cast").toString
    val config = s"""{
      "input": {"path": "$sf/events.parquet", "format": "parquet"},
      "baseDir": "$dir",
      "casts": {"value": "string", "user_id": "int"},
      "ingestFile": true,
      "routes": {"all": {"predicate": "true"}}
    }"""
    Pipeline.runConfig(spark, config)
    val out = spark.read.parquet(s"$dir/all")
    assert(out.schema("value").dataType.typeName === "string")
    assert(out.schema("user_id").dataType.typeName === "integer")
    val files = out.select("ingest_file").distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("events.parquet")),
      s"ingest_file must carry the source path: ${files.take(3).mkString(", ")}")
  }

  test("config validation: casting a nonexistent column or unknown type names it") {
    val badCol = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "casts": {"ghost": "string"}, "routes": {"all": {"predicate": "true"}}}"""
    val e1 = intercept[IllegalArgumentException](Pipeline.runConfig(spark, badCol))
    assert(e1.getMessage.contains("ghost"), e1.getMessage)
    val badType = s"""{"input": {"path": "$sf/events.parquet"}, "baseDir": "/tmp/x",
      "casts": {"value": "not_a_type"}, "routes": {"all": {"predicate": "true"}}}"""
    val e2 = intercept[IllegalArgumentException](Pipeline.runConfig(spark, badType))
    assert(e2.getMessage.contains("value") && e2.getMessage.contains("not_a_type"),
      e2.getMessage)
  }

  test("config field surgery: dropFields, renames, lowercaseNames (pyetl REMOVE_FIELDS)") {
    val dir = Files.createTempDirectory("graft-pipe-shape").toString
    val config = s"""{
      "input": {"path": "$sf/events.parquet"},
      "baseDir": "$dir",
      "dropFields": ["props", "value"],
      "renames": {"event_type": "EventKind"},
      "lowercaseNames": true,
      "routes": {"all": {"predicate": "true"}}
    }"""
    Pipeline.runConfig(spark, config)
    val out = spark.read.parquet(s"$dir/all")
    assert(!out.columns.contains("props") && !out.columns.contains("value"),
      "dropFields must remove the raw payload columns")
    assert(out.columns.contains("eventkind"),
      s"rename then lowercase should yield eventkind, got ${out.columns.mkString(",")}")
    assert(out.columns.forall(c => c === c.toLowerCase))
  }

  test("config redact: PII is scrubbed in place before routing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pipe-redact").toString
    val srcDir = Files.createTempDirectory("graft-pipe-redact-src").toString
    Seq((1L, "mail me at a@b.io"), (2L, "clean"))
      .toDF("id", "note").write.mode("overwrite").parquet(srcDir)
    val config = s"""{
      "input": {"path": "$srcDir"},
      "baseDir": "$dir",
      "redact": ["note"],
      "routes": {"all": {"predicate": "true"}}
    }"""
    Pipeline.runConfig(spark, config)
    val notes = spark.read.parquet(s"$dir/all").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("note")).toMap
    assert(notes(1L) === "mail me at <EMAIL>")
    assert(notes(2L) === "clean")
  }

  test("config: a JSON-null format falls back to parquet instead of 'null' source") {
    val dir = Files.createTempDirectory("graft-pipe-nullfmt").toString
    val config = s"""{
      "input": {"path": "$sf/events.parquet", "format": null},
      "baseDir": "$dir",
      "routes": {"all": {"predicate": "true", "format": null}}
    }"""
    val counts = Pipeline.runConfig(spark, config)
    assert(counts("all") === spark.read.parquet(s"$sf/events.parquet").count())
    assert(spark.read.parquet(s"$dir/all").count() === counts("all"))
  }

  test("config validations gate the write: violations name the rule, clean runs pass") {
    val dir = Files.createTempDirectory("graft-pipe-val").toString
    // clean run: impossible-violation rules pass, routes land
    val ok = s"""{
      "input": {"path": "$sf/events.parquet"},
      "baseDir": "$dir/ok",
      "validations": {"no_null_user": "user_id IS NULL",
                      "value_in_range": "value < -1e9"},
      "routes": {"all": {"predicate": "true"}}
    }"""
    assert(Pipeline.runConfig(spark, ok)("all") > 0)
    // a firing rule aborts the run, names itself with its count, writes nothing
    val bad = s"""{
      "input": {"path": "$sf/events.parquet"},
      "baseDir": "$dir/bad",
      "validations": {"no_purchases": "event_type = 'purchase'"},
      "routes": {"all": {"predicate": "true"}}
    }"""
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, bad))
    assert(e.getMessage.contains("no_purchases")
      && e.getMessage.contains("violating rows"))
    assert(!new java.io.File(s"$dir/bad/all").exists(), "gate must precede writes")
    // the budget makes the same rule pass
    val budgeted = bad.replace(""""routes"""",
      """"maxViolations": 1000000, "routes"""")
    assert(Pipeline.runConfig(spark, budgeted)("all") > 0)
    // an unresolvable rule names its config key, not a bare column error
    val typo = s"""{
      "input": {"path": "$sf/events.parquet"},
      "baseDir": "$dir/typo",
      "validations": {"typo_rule": "no_such_column IS NULL"},
      "routes": {"all": {"predicate": "true"}}
    }"""
    val e2 = intercept[IllegalArgumentException](Pipeline.runConfig(spark, typo))
    assert(e2.getMessage.contains("typo_rule"))
  }

  test("config onViolation=quarantine routes violators to the dead-letter dir instead of aborting") {
    val dir = Files.createTempDirectory("graft-pipe-dlq").toString
    val ev = Tables(spark, sf).events
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    val total = ev.count()
    assert(nPurch > 0 && nPurch < total)
    // the same rule that ABORTS under the default gate now splits the run:
    // violators land tagged in quarantineDir, routes see only clean rows
    val cfg = s"""{
      "input": {"path": "$sf/events.parquet"},
      "baseDir": "$dir/out",
      "validations": {"no_purchases": "event_type = 'purchase'"},
      "onViolation": "quarantine",
      "quarantineDir": "$dir/dlq",
      "routes": {"all": {"predicate": "true"}}
    }"""
    val counts = Pipeline.runConfig(spark, cfg)
    assert(counts("__quarantined") === nPurch)
    assert(counts("all") === total - nPurch)
    val dlq = spark.read.parquet(s"$dir/dlq")
    assert(dlq.count() === nPurch)
    assert(dlq.filter(array_contains(col("violated"), "no_purchases")).count()
      === nPurch, "every dead-letter row names the rule that failed it")
    val clean = spark.read.parquet(s"$dir/out/all")
    assert(clean.count() === total - nPurch)
    assert(clean.filter(col("event_type") === "purchase").count() === 0)
    assert(!clean.columns.contains("violated"),
      "clean rows carry no routing metadata")
    // config sanity: quarantine mode without a dir names the problem
    val noDir = cfg.replace(s""""quarantineDir": "$dir/dlq",""", "")
    val e = intercept[IllegalArgumentException](Pipeline.runConfig(spark, noDir))
    assert(e.getMessage.contains("quarantineDir"), e.getMessage)
    val badMode = cfg.replace("\"quarantine\"", "\"shrug\"")
    val e2 = intercept[IllegalArgumentException](Pipeline.runConfig(spark, badMode))
    assert(e2.getMessage.contains("onViolation"), e2.getMessage)
  }

  test("streaming multi-sink survives a restart from checkpoint without dupes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val dir = Files.createTempDirectory("graft-pipe-stream").toString
    val routes = Map(
      "purchases" -> (col("eventType") === "purchase"),
      "clicks"    -> (col("eventType") === "click"))

    val in = MemoryStream[Event]
    in.addData(Event(ts(0), 1, "purchase", 10.0), Event(ts(1), 2, "click", 1.0))
    val q1 = Streams.multiSink(in.toDF(), dir, routes, s"$dir/ckpt")
    q1.processAllAvailable(); q1.stop()

    // restart against the same checkpoint with new data arriving
    in.addData(Event(ts(2), 3, "purchase", 20.0))
    val q2 = Streams.multiSink(in.toDF(), dir, routes, s"$dir/ckpt")
    q2.processAllAvailable(); q2.stop()

    assert(spark.read.parquet(s"$dir/purchases").count() === 2) // no replay dupes
    assert(spark.read.parquet(s"$dir/clicks").count() === 1)
  }
}
