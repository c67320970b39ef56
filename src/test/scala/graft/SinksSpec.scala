package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** S7-S11 — structured sinks keep the reference's fixed column contracts. */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("writeItems emits the Raw_imports A-J column contract in order") {
    val base = java.nio.file.Files.createTempDirectory("graft-sinks").toString
    val turns = graft.io.Transcripts.generateDF(spark, 300L)
    val items = Pipeline.extractItems(turns)
    graft.io.Sinks.writeItems(items, s"$base/items")
    val out = spark.read.parquet(s"$base/items")
    // writer.py:100-111 column order: supplier,name,qty,unit,price,currency,
    // total,sku,source_file,confidence
    assert(out.columns.toSeq == Seq("supplier", "name", "qty", "unit", "price",
      "currency", "total", "sku", "source_file", "confidence"))
    assert(out.count() > 0)
    assert(out.where("source_file like '%#%'").count() == out.count()) // lineage key present
  }

  test("writeUniversal emits 13 columns plus the summary aggregate") {
    val base = java.nio.file.Files.createTempDirectory("graft-sinks2").toString
    val turns = graft.io.Transcripts.generateDF(spark, 300L)
    val items = Pipeline.extractItems(turns)
    graft.io.Sinks.writeUniversal(items.withColumn("best_parser", items("best_parser")), s"$base/u")
    val out = spark.read.parquet(s"$base/u")
    assert(out.columns.length == 13)
    val summary = spark.read.parquet(s"$base/u_summary")
    assert(summary.columns.toSeq == Seq("best_parser", "count", "total_cost", "avg_confidence"))
    assert(summary.count() > 0)
  }

  test("writeRelational produces documents and items tables with lineage keys") {
    val base = java.nio.file.Files.createTempDirectory("graft-sinks3").toString
    val turns = graft.io.Transcripts.generateDF(spark, 200L)
    val results = Pipeline.extractTurns(turns).toDF()
    val items = Pipeline.extractItems(turns)
    graft.io.Sinks.writeRelational(results, items, base)
    val docs = spark.read.parquet(s"$base/documents")
    assert(docs.count() == 200L)
    assert(docs.columns.contains("best_parser") && docs.columns.contains("overall_quality"))
    val its = spark.read.parquet(s"$base/items")
    assert(its.count() > 0)
    // FK join-back: every item's (conv_id, turn_idx) exists in documents
    val orphans = its.join(docs, Seq("conv_id", "turn_idx"), "left_anti").count()
    assert(orphans == 0L)
  }

  test("import_sessions and user_actions keep the models.py column contracts with FK lineage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-sinks4").toString
    val turns = graft.io.Transcripts.generateDF(spark, 100L)
    val items = Pipeline.extractItems(turns)
      .withColumn("item_id", concat_ws("#", col("conv_id"), col("turn_idx"), col("item_idx")))
    val ts = java.sql.Timestamp.valueOf("2026-01-15 10:00:00")
    val sessions = Seq((1L, "operator", ts, "template_v2.xlsx", "/exports/out.xlsx", "/backups/out.bak"))
      .toDF("id", "user", "timestamp", "template_used", "excel_file_path", "backup_file_path")
    graft.io.Sinks.writeImportSessions(sessions, base, org.apache.spark.sql.SaveMode.Overwrite)
    val actions = items.limit(5).select(col("item_id"))
      .withColumn("id", monotonically_increasing_id())
      .withColumn("import_session_id", lit(1L))
      .withColumn("action", lit("accept"))
      .withColumn("user", lit("operator"))
      .withColumn("timestamp", lit(ts))
      .withColumn("note", lit(null).cast("string"))
    graft.io.Sinks.writeUserActions(actions, base, org.apache.spark.sql.SaveMode.Overwrite)
    val s = spark.read.parquet(s"$base/import_sessions")
    assert(s.columns.toSeq == Seq("id", "user", "timestamp", "template_used",
      "excel_file_path", "backup_file_path"))
    val a = spark.read.parquet(s"$base/user_actions")
    assert(a.columns.toSeq == Seq("id", "item_id", "import_session_id", "action",
      "user", "timestamp", "note"))
    assert(a.count() == 5)
    // FK join-back: every action's item_id resolves to an extracted item,
    // and every import_session_id resolves to a session row
    assert(a.join(items, Seq("item_id"), "left_anti").count() == 0L)
    assert(a.join(s.withColumnRenamed("id", "import_session_id"),
      Seq("import_session_id"), "left_anti").count() == 0L)
  }
}
