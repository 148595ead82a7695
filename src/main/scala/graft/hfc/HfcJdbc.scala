package graft.hfc

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** JDBC read/write seam for the 17-table database — the reference's
  * actual storage is a MariaDB server (`databaseImport.py` connects
  * via mysql-connector; the published artifact is its dump), so a
  * complete replacement must be able to read FROM and write TO such a
  * server, not only parquet.
  *
  * Dialect: statements are generated for either MariaDB/MySQL or
  * Apache Derby (the embedded engine on Spark's classpath, used by the
  * spec as the live test stand-in — no egress, no server). The only
  * divergences are the upsert statement (MariaDB
  * `INSERT .. ON DUPLICATE KEY UPDATE`, Derby/ANSI `MERGE`) and two
  * type spellings; everything else is ANSI.
  *
  * Scale shape (100 TB honesty): JDBC is a DIMENSION-SCALE seam. Reads
  * parallelize via `partitionColumn/num` bounds and writes batch via
  * `spark.write.jdbc`, but a single database endpoint is the
  * bottleneck regardless of executor count — the fact plane (commits,
  * modified_file, discussion_event at Hub scale) belongs in parquet;
  * this seam exists so the reference's MariaDB-resident deployment can
  * be drained into it (read) or refreshed from it (upsert) without the
  * dump detour.
  *
  * Upsert protocol (K2 parity, db-transactional): stage the batch into
  * `<table>__stage` (plain parallel append — the only distributed
  * step), then ONE driver-side transaction merges stage → table and
  * drops the stage. Crash before COMMIT leaves the target untouched
  * (the stage is scratch); crash after is complete. Batch-internal
  * duplicate keys are resolved last-writer-wins BEFORE staging via
  * [[MergeWriter.dedupeBatch]] semantics (`upsertJdbc` takes the same
  * optional `seqCol`).
  */
object HfcJdbc {

  /** column type for CREATE TABLE; keys get VARCHAR (Derby cannot
    * compare CLOBs in a MERGE predicate; MariaDB cannot index
    * LONGTEXT), everything else mirrors [[SqlDump.createTableSql]]'s
    * reference-parity mapping */
  private def sqlType(table: String, f: StructField, derby: Boolean): String = {
    val isKey = Schemas.primaryKeys(table).contains(f.name)
    f.dataType match {
      case StringType if isKey => "VARCHAR(256)"
      case StringType => if (derby) "CLOB" else "LONGTEXT"
      case BooleanType => if (derby) "BOOLEAN" else "INTEGER"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case TimestampType => if (derby) "TIMESTAMP" else "DATETIME(6)"
      case DoubleType => "DOUBLE"
      case other =>
        throw new IllegalArgumentException(
          s"no JDBC mapping for ${other.simpleString} ($table.${f.name})")
    }
  }

  private def isDerby(url: String): Boolean = url.startsWith("jdbc:derby")
  private def q(id: String, derby: Boolean): String =
    if (derby) s""""$id"""" else s"`$id`"

  /** CREATE TABLE statement for `table` (no FKs: write order
    * [[Schemas.writeOrder]] provides the K6 barrier discipline; FK
    * checks on a bulk target only slow the load) */
  def createTableSql(table: String, url: String): String = {
    val derby = isDerby(url)
    val schema = Schemas.all(table)
    val cols = schema.fields.map(f => s"${q(f.name, derby)} ${sqlType(table, f, derby)}")
    val pk = Schemas.primaryKeys(table).map(q(_, derby)).mkString(", ")
    s"CREATE TABLE ${q(table, derby)} (${cols.mkString(", ")}, PRIMARY KEY ($pk))"
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
    try {
      var found = false
      while (!found && rs.next()) found = rs.getString(3).equalsIgnoreCase(table)
      found
    } finally rs.close()
  }

  /** create all 17 tables (idempotent) in FK-topological order */
  def createTables(url: String): Unit = withConnection(url) { conn =>
    Schemas.writeOrder.foreach { t =>
      if (!tableExists(conn, t)) {
        val st = conn.createStatement()
        try st.executeUpdate(createTableSql(t, url)) finally st.close()
      }
    }
  }

  /** parallel append of `df` into `table` (table must exist — schema
    * is ours, not Spark's inferred DDL) */
  def append(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("truncate", "false")
      .jdbc(url, quoted(table, url), new java.util.Properties)

  private def quoted(table: String, url: String): String = q(table, isDerby(url))

  /** read one table back; pass `partitionColumn` bounds to shard the
    * scan across executors (dimension tables read fine unsharded) */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read
      .option("url", url)
      .option("dbtable", quoted(table, url))
    val cfg = partitionColumn match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
      case None => base
    }
    cfg.format("jdbc").load()
  }

  /** MariaDB upsert statement (stage → table), K2's exact SQL shape.
    * All-key tables (tag, the join tables, commit_parents,
    * files_in_commit) have no SET list to write — there a duplicate
    * key IS an identical row, so the statement degrades to the
    * reference's own K3 `INSERT IGNORE` (a bare INSERT would raise
    * ERROR 1062 on any re-run and roll the transaction back). */
  private[hfc] def mariadbUpsertSql(table: String): String = {
    val schema = Schemas.all(table)
    val keys = Schemas.primaryKeys(table)
    val cols = schema.fieldNames
    val colList = cols.map(c => s"`$c`").mkString(", ")
    val updates = cols.filterNot(keys.contains)
      .map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
    if (updates.isEmpty)
      s"INSERT IGNORE INTO `$table` ($colList) SELECT $colList FROM `${table}__stage`"
    else
      s"INSERT INTO `$table` ($colList) SELECT $colList FROM `${table}__stage`" +
        s" ON DUPLICATE KEY UPDATE $updates"
  }

  /** Derby/ANSI MERGE equivalent of [[mariadbUpsertSql]] */
  private[hfc] def derbyMergeSql(table: String): String = {
    val schema = Schemas.all(table)
    val keys = Schemas.primaryKeys(table)
    val cols = schema.fieldNames
    val on = keys.map(k => s"""t."$k" = s."$k"""").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val set = nonKeys.map(c => s""""$c" = s."$c"""").mkString(", ")
    val insertCols = cols.map(c => s""""$c"""").mkString(", ")
    val insertVals = cols.map(c => s"""s."$c"""").mkString(", ")
    val matched = if (nonKeys.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $set"
    s"""MERGE INTO "$table" t USING "${table}__stage" s ON $on""" +
      matched +
      s" WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
  }

  /** K2 upsert of `batch` into `table` through a staging table + one
    * driver-side transaction (see object scaladoc for the protocol) */
  def upsertJdbc(batch: DataFrame, url: String, table: String,
                 seqCol: Option[String] = None): Unit = {
    val keys = Schemas.primaryKeys(table)
    val deduped = MergeWriter.dedupeBatch(batch, keys, seqCol)
    val derby = isDerby(url)
    val stage = s"${table}__stage"
    withConnection(url) { conn =>
      if (tableExists(conn, stage)) {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE ${q(stage, derby)}") finally st.close()
      }
      val st = conn.createStatement()
      // stage mirrors the target minus the PK constraint (dup staging
      // rows were already resolved; no index maintenance on the append)
      val ddl = createTableSql(table, url)
        .replace(s"CREATE TABLE ${q(table, derby)}", s"CREATE TABLE ${q(stage, derby)}")
        .replaceAll(", PRIMARY KEY \\([^)]*\\)\\)$", ")")
      try st.executeUpdate(ddl) finally st.close()
    }
    append(deduped, url, stage)
    withConnection(url) { conn =>
      conn.setAutoCommit(false)
      try {
        val st = conn.createStatement()
        try {
          st.executeUpdate(
            if (derby) derbyMergeSql(table) else mariadbUpsertSql(table))
          st.executeUpdate(s"DROP TABLE ${q(stage, derby)}")
        } finally st.close()
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      }
    }
  }

  /** drain a whole database: read all 17 tables (writeOrder keys) */
  def readAll(spark: SparkSession, url: String): Map[String, DataFrame] =
    Schemas.writeOrder.map(t => t -> read(spark, url, t)).toMap

  /** populate a whole database in FK order (create-if-missing + upsert) */
  def writeAll(tables: Map[String, DataFrame], url: String): Unit = {
    createTables(url)
    Schemas.writeOrder.foreach { t =>
      tables.get(t).foreach(df => upsertJdbc(df, url, t))
    }
  }
}
