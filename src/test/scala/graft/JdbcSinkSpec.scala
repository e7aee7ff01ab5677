package graft

import graft.etl.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.Properties

/** End-to-end exercise of the JDBC sink seam against the Derby engine that
  * already ships on Spark's classpath (the hive-metastore dependency) — the
  * closest an offline build gets to pyetl's MySQL destination, and the
  * round-4 "connector never exercised" gap closed as far as this container
  * allows. Derby runs embedded (same JVM), so what this proves is the
  * seam's actual plumbing: driver discovery through DriverManager, dialect
  * type mapping, create-on-append semantics, connection bounding via
  * repartition, and DB-side predicate pushdown on the read path.
  */
class JdbcSinkSpec extends SparkSpec {

  private lazy val dbDir = {
    val d = Files.createTempDirectory("graft-derby").toString
    // keep Derby's log out of the repo cwd
    System.setProperty("derby.stream.error.file", s"$d/derby.log")
    d
  }
  private lazy val url = s"jdbc:derby:$dbDir/graftdb;create=true"

  test("jdbcAppend round-trips rows through an embedded Derby database") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).limit(100)
    Sinks.jdbcAppend(docs, url, "docs", numPartitions = 4)
    val back = spark.read.jdbc(url, "docs", new Properties())
    assert(back.count() === docs.count())
    assert(back.columns.sorted === Array("doc_id", "lang", "n_chars"))
    val spot = back.filter(col("doc_id") === 0).collect()
    val truth = docs.filter(col("doc_id") === 0).collect()
    assert(spot.map(_.getLong(2)).toSet === truth.map(_.getLong(2)).toSet,
      "values must survive the dialect round trip")
  }

  test("append mode appends: a second load doubles the row count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).limit(100)
    Sinks.jdbcAppend(docs, url, "docs", numPartitions = 4)
    assert(spark.read.jdbc(url, "docs", new Properties()).count() === 2 * docs.count())
  }

  test("the jdbc read path pushes predicates into the database") {
    val back = spark.read.jdbc(url, "docs", new Properties())
      .filter(col("n_chars") > 100)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      s"filter must reach the JDBC scan, not run in Spark: $plan")
  }
}
