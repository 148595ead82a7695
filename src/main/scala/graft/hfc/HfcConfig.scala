package graft.hfc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, to_timestamp}

/** S9: the `hfc.config` scan (databaseImport.py:78-91; keys per
  * `extractor/hfc.config`) — the extraction-governance knobs as a typed
  * config. Connection fields exist for schema parity with the
  * reference's file; this engine reads/writes parquet tables, so only
  * the governance knobs drive behavior:
  *
  *  - `last_n_months` → the incremental watermark (P13). The
  *    reference's default is the epoch (:860) — everything counts as
  *    fresh — expressed here as `limitDate = None` when negative.
  *  - `max_num_commits` / `max_num_files` → the F3 threshold skip
  *    (:373-382, recommended 1500/10000 per docs/docs/usage.html);
  *    non-positive values disable the skip.
  *
  * Parsed with Jackson (already on Spark's classpath) — no new
  * dependencies. Secrets in the file (db password, API token) are
  * deliberately NOT modeled: token validation (S10) is a network
  * precondition outside this zero-egress engine.
  */
final case class HfcConfig(host: String, port: Int, user: String, database: String,
                           lastNMonths: Int, maxNumCommits: Int, maxNumFiles: Int) {

  /** F1 watermark column; None = epoch default (everything fresh). */
  def limitDate: Option[Column] =
    if (lastNMonths < 0) None else Some(Transforms.limitDate(lastNMonths))

  /** the F1 split column with the epoch default made explicit */
  def limitDateOrEpoch: Column =
    limitDate.getOrElse(to_timestamp(lit("1970-01-01")))

  def commitLimit: Option[Int] = if (maxNumCommits > 0) Some(maxNumCommits) else None
  def fileLimit: Option[Int] = if (maxNumFiles > 0) Some(maxNumFiles) else None
}

object HfcConfig {

  def fromJson(json: String): HfcConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    def str(k: String, dflt: String = ""): String =
      Option(node.get(k)).map(_.asText()).getOrElse(dflt)
    def int(k: String, dflt: Int): Int =
      Option(node.get(k)).map(_.asInt(dflt)).getOrElse(dflt)
    HfcConfig(
      host = str("host"), port = int("port", 0),
      user = str("user"), database = str("database"),
      lastNMonths = int("last_n_months", -1),
      maxNumCommits = int("max_num_commits", 0),
      maxNumFiles = int("max_num_files", 0))
  }

  def load(path: String): HfcConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
