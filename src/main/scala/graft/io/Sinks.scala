package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Structured sinks (SURVEY.md §2.1 S7-S11): the reference's Excel/SQLite
 * sinks re-expressed as parquet writers with the SAME fixed column orders;
 * presentation (styles, colors) is dropped, column contracts are kept.
 */
object Sinks {

  /** S7/S10 — the Raw_imports column contract (writer.py:100-111, A-J):
    * supplier, name, qty, unit, price, currency, total, sku, source_file,
    * confidence. `sourceFile` mirrors the per-file provenance column. */
  def writeItems(items: DataFrame, outDir: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    items.select(
      col("supplier"), col("name"), col("qty"), col("unit"), col("price"),
      col("currency"), col("total"),
      (if (items.columns.contains("sku")) col("sku") else lit(null).cast("string")).as("sku"),
      concat_ws("#", col("conv_id"), col("turn_idx")).as("source_file"),
      col("confidence"))
      .write.mode(mode).parquet(outDir)

  /** S8 — universal sink: 13 columns incl. parser provenance
    * (universal_writer.py:94-151), plus the Summary-sheet analog written
    * alongside as `<outDir>_summary` (per-parser stats aggregate). */
  def writeUniversal(items: DataFrame, outDir: String): Unit = {
    items.select(
      col("conv_id"), col("turn_idx"), col("best_parser").as("parser"),
      col("item_idx"), col("name"), col("article"), col("qty"), col("unit"),
      col("price"), col("currency"), col("total"), col("source"), col("confidence"))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    items.groupBy("best_parser")
      .agg(count(lit(1)).as("count"), sum("total").as("total_cost"),
        avg("confidence").as("avg_confidence"))
      .write.mode(SaveMode.Overwrite).parquet(outDir + "_summary")
  }

  /** S11 — relational outputs: items + per-turn documents-metrics tables
    * (the SQLite `documents`/`items` schema analog, app/db/models.py:47-84). */
  def writeRelational(turnResults: DataFrame, itemsFlat: DataFrame, baseDir: String): Unit = {
    turnResults.select(
      col("conv_id"), col("turn_idx"), col("n_chars"), col("n_tables"),
      col("has_text"), col("doc_type"), col("best_parser"), col("best_count"),
      col("best_total_cost"), col("overall_quality"))
      .write.mode(SaveMode.Overwrite).parquet(s"$baseDir/documents")
    itemsFlat.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/items")
  }

  /** S11 — import_sessions table (models.py:96-110): one row per pipeline
    * run, the session bookkeeping the reference writes on every export.
    * Column contract: id, user, timestamp, template_used, excel_file_path,
    * backup_file_path. */
  def writeImportSessions(sessions: DataFrame, baseDir: String,
                          mode: SaveMode = SaveMode.Append): Unit =
    sessions.select(
      col("id").cast("long"), col("user").cast("string"),
      col("timestamp").cast("timestamp"), col("template_used").cast("string"),
      col("excel_file_path").cast("string"), col("backup_file_path").cast("string"))
      .write.mode(mode).parquet(s"$baseDir/import_sessions")

  /** S11 — user_actions audit trail (models.py:112-128): accept / reject /
    * edit / export actions keyed to an item and an import session (both
    * nullable FKs, as in the reference schema). Column contract: id,
    * item_id, import_session_id, action, user, timestamp, note. */
  def writeUserActions(actions: DataFrame, baseDir: String,
                       mode: SaveMode = SaveMode.Append): Unit =
    actions.select(
      col("id").cast("long"), col("item_id").cast("string"),
      col("import_session_id").cast("long"), col("action").cast("string"),
      col("user").cast("string"), col("timestamp").cast("timestamp"),
      col("note").cast("string"))
      .write.mode(mode).parquet(s"$baseDir/user_actions")
}
