package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver's parquet tables under one sf directory.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown and
  * pruning freedom — no caching, no forced schemas. At 100 TB these are
  * partitioned parquet lakes; the same accessors work unchanged.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so pure-SQL users can
    * `spark.sql("SELECT ... FROM lineitem ...")` directly.
    */
  def registerViews(): Unit = Tables.names.foreach(n => t(n).createOrReplaceTempView(n))
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
