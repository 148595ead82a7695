package graft.hfc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MariaDB dump interop — read the reference's published artifact,
  * write a restorable one.
  *
  * The reference distributes HFCommunity as a monthly mysqldump
  * (`docs/download.html`'s Zenodo dump table; `README.md:15`): a real
  * user holds `dump_YYYYMMDD.sql` for the 17 tables, not API
  * credentials. This module loads such a dump straight into the
  * [[Schemas]] StructTypes with no database in the middle:
  *
  *   dump.sql → spark.read.text(lineSep=";\n")   (statement per row)
  *            → graft_sql_insert_parse           (partition-local lex)
  *            → explode(rows) + per-table typed projection
  *
  * Scale shape: the read is a plain text scan (splittable on the
  * statement separator), the parse is a zero-shuffle projection, and
  * the only wide operation is whatever the caller does next
  * ([[MergeWriter]] in [[Schemas.writeOrder]] for K2/K6 semantics).
  * A 100 GB dump loads as an embarrassingly parallel scan.
  *
  * Column mapping: the dump carries the REFERENCE DDL's column order
  * and names (`databaseImport.py:184-251`), which differ from our
  * StructTypes in three documented ways —
  *  - order-only permutations (repository, commits, discussion_event),
  *  - renames: repo_file dumps `filename` where we model `rfilename`,
  *    modified_file dumps `rfilename` where we model `filename`,
  *    conflicting_files_discussion dumps `num` → our `discussion_num`,
  *  - reference-only columns our model drops: `model.likes` (never
  *    populated — the extractor writes likes to `repository`,
  *    databaseImport.py:641) and
  *    `conflicting_files_discussion.filename` (derivable via the
  *    repo_file FK). `author.fullname` was in this list until r14;
  *    it is now a first-class column of [[Schemas.author]].
  * [[load]] applies the mapping; [[loadRaw]] returns every dump column
  * untyped (reference names) so nothing is lost for callers that want
  * the dropped fields.
  *
  * mysqldump files with explicit column lists (`--complete-insert`)
  * resolve positionally-or-by-name per statement; bare INSERTs
  * (mysqldump default) resolve positionally against the DDL order.
  *
  * Deliberately NOT a DataSource V2 face (unlike GitHistoryDataSource/
  * HfhDataSource, whose scans wrap non-file systems): the dump IS a
  * text file, and Spark's built-in text source already provides
  * splittable distributed reads, custom record separators, and
  * locality — a hand-rolled PartitionReader would re-implement all of
  * that to expose the same DataFrame. Composing `spark.read.text` with
  * a native parse expression is the Spark-first form here.
  */
object SqlDump {

  /** reference DDL column order per table (dump-side names),
    * databaseImport.py:184-251 */
  val dumpColumns: Map[String, Seq[String]] = Map(
    "tag" -> Seq("name"),
    "author" -> Seq("username", "avatar_url", "is_pro", "fullname", "type", "source"),
    "repository" -> Seq("id", "name", "type", "author", "sha", "last_modified",
      "private", "card_data", "gated", "likes", "disabled"),
    "repo_file" -> Seq("id", "filename", "repo_id", "size", "blob_id",
      "lfs_size", "lfs_sha", "lfs_pointer_size"),
    "tags_in_repo" -> Seq("tag_name", "repo_id"),
    "model" -> Seq("model_id", "pipeline_tag", "downloads", "library_name",
      "likes", "config"),
    "dataset" -> Seq("dataset_id", "description", "citation",
      "paperswithcode_id", "downloads"),
    "space" -> Seq("space_id", "sdk", "stage", "hardware", "requested_hw",
      "sleep_time", "storage", "runtime_raw"),
    "models_in_space" -> Seq("model_id", "space_id"),
    "datasets_in_space" -> Seq("dataset_id", "space_id"),
    "commits" -> Seq("sha", "repo_id", "message", "author_date", "author_tz",
      "committer_date", "committer_tz", "in_main_branch", "insertions",
      "deletions", "author_name", "committer_name", "source"),
    "discussion" -> Seq("num", "repo_id", "author", "title", "status",
      "created_at", "is_pull_request", "target_branch", "merge_commit_oid",
      "diff", "git_reference"),
    "conflicting_files_discussion" -> Seq("id", "num", "repo_id", "filename",
      "repo_file_id"),
    "commit_parents" -> Seq("commit_sha", "parent_sha"),
    "modified_file" -> Seq("modified_file_id", "repo_file_id", "rfilename",
      "old_path", "new_path", "change_type", "diff", "added_lines",
      "deleted_lines", "nloc"),
    "files_in_commit" -> Seq("sha", "modified_file_id"),
    "discussion_event" -> Seq("id", "repo_id", "discussion_num", "event_type",
      "created_at", "author", "content", "edited", "hidden", "new_status",
      "summary", "sha", "old_title", "new_title", "full_data"))

  /** dump-side name → our StructType field name, where they differ */
  private val renames: Map[String, Map[String, String]] = Map(
    "repo_file" -> Map("filename" -> "rfilename"),
    "modified_file" -> Map("rfilename" -> "filename"),
    "conflicting_files_discussion" -> Map("num" -> "discussion_num"))

  /** all parsed INSERT rows of a dump:
    * (tbl, cols nullable, vals array<string>) — one output row per
    * VALUES tuple, zero shuffle. `lineSep` defaults to mysqldump's
    * `;\n`; pass `";\r\n"` for a Windows-generated dump (the parser
    * itself tolerates stray `\r`/`;` inside an element either way).
    * Compressed dumps: `.gz`/`.bz2` read transparently through the
    * text source's codecs; the published `.zip`/`.rar` archives must
    * be unpacked first (ZIP is not a splittable Hadoop codec). */
  def statements(spark: SparkSession, path: String,
                 lineSep: String = ";\n"): DataFrame = {
    graft.GraftExtensions.register(spark)
    spark.read.option("lineSep", lineSep).text(path)
      .select(expr("graft_sql_insert_parse(value)").as("p"))
      .where(col("p").isNotNull)
      .select(col("p.tbl").as("tbl"), col("p.cols").as("cols"),
        explode(col("p.rows")).as("vals"))
  }

  /** dump-side value of column `name` (DDL position `pos`): positional
    * for bare INSERTs, by-name when the statement carried a column
    * list */
  private def dumpCol(pos: Int, name: String): Column =
    when(col("cols").isNull, col("vals").getItem(pos))
      .otherwise(element_at(map_from_arrays(col("cols"), col("vals")), name))

  /** one table's rows with every DUMP column, all strings (reference
    * names — `fullname`, `model.likes`, `cfd.filename` included) */
  def loadRaw(spark: SparkSession, path: String, table: String,
              lineSep: String = ";\n"): DataFrame = {
    val cols = dumpColumns.getOrElse(table,
      throw new IllegalArgumentException(s"unknown dump table '$table'"))
    statements(spark, path, lineSep)
      .where(lower(col("tbl")) === table)
      .select(cols.zipWithIndex.map { case (c, i) => dumpCol(i, c).as(c) }: _*)
  }

  /** MariaDB dumps booleans as TINYINT 0/1; cast via int so '0'/'1'
    * and 'true'/'false' both land, anything else nulls (non-ANSI) */
  private def castTo(c: Column, t: DataType): Column = t match {
    case BooleanType =>
      when(c.isin("0", "1"), c === "1").otherwise(c.cast(BooleanType))
    case other => c.cast(other)
  }

  /** Generic typed load of one dump table: `dumpOrder` is the dump's
    * DDL column order (defaults to `schema`'s own order), `colRenames`
    * maps dump-side names to `schema` field names. Schema fields with
    * no dump column come back NULL; dump columns with no schema field
    * are dropped. */
  def loadAs(spark: SparkSession, path: String, table: String,
             schema: StructType, dumpOrder: Seq[String] = Nil,
             colRenames: Map[String, String] = Map.empty,
             lineSep: String = ";\n"): DataFrame = {
    val order = if (dumpOrder.isEmpty) schema.fieldNames.toSeq else dumpOrder
    val byOurName = order.zipWithIndex.map { case (c, i) =>
      colRenames.getOrElse(c, c) -> dumpCol(i, c)
    }.toMap
    statements(spark, path, lineSep)
      .where(lower(col("tbl")) === table)
      .select(typedProjection(schema, byOurName).toSeq: _*)
  }

  private def typedProjection(schema: StructType,
                              byOurName: Map[String, Column]): Array[Column] =
    schema.fields.map { f =>
      byOurName.get(f.name) match {
        case Some(c) => castTo(c, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name) // model-only col
      }
    }

  /** The 17 tables of a dump, typed to [[Schemas.all]] (renames/drops
    * per the scaladoc mapping); tables absent from the dump come back
    * empty, never missing — downstream writeOrder loops stay total.
    *
    * Parses the dump text ONCE: the statement scan lands in a
    * `tbl`-partitioned parquet scratch (one text scan + one columnar
    * write), and each returned table is a partition-PRUNED read of
    * that scratch — without this, 17 lazy per-table plans would
    * re-scan and re-lex the full dump 17 times at action time
    * (17× the cost on the advertised 100 GB artifact). The scratch
    * must outlive the returned frames; the default temp dir lives
    * until the caller (or the OS) removes it. */
  def load(spark: SparkSession, path: String, lineSep: String = ";\n",
           scratchDir: Option[String] = None): Map[String, DataFrame] = {
    val scratch = scratchDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-sqldump-scratch").toString)
    statements(spark, path, lineSep)
      .withColumn("tbl", lower(col("tbl")))
      .write.mode("overwrite").partitionBy("tbl").parquet(scratch)
    // explicit schema: an all-comments dump writes ZERO rows and a
    // schema-inferring read of the empty scratch would throw
    val parsed = spark.read.schema(StructType(Seq(
        StructField("cols", ArrayType(StringType, containsNull = false)),
        StructField("vals", ArrayType(StringType, containsNull = true)),
        StructField("tbl", StringType))))
      .parquet(scratch)
    Schemas.all.map { case (table, schema) =>
      val ren = renames.getOrElse(table, Map.empty)
      val byOurName = dumpColumns(table).zipWithIndex.map { case (c, i) =>
        ren.getOrElse(c, c) -> dumpCol(i, c)
      }.toMap
      table -> parsed.where(col("tbl") === table)
        .select(typedProjection(schema, byOurName).toSeq: _*)
    }
  }

  /** SQL literal for one column of `df`'s schema (writer side) */
  private def literal(f: StructField): Column = {
    val c = col(f.name)
    val v = f.dataType match {
      case StringType => expr(s"graft_sql_quote(`${f.name}`)")
      // two explicit branches: a bare otherwise("0") would swallow
      // NULL into false (when() routes a null condition to otherwise)
      // before the coalesce below could emit the NULL keyword
      case BooleanType => when(c, lit("1")).when(!c, lit("0"))
      case TimestampType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("'"))
      case _ => c.cast(StringType)
    }
    coalesce(v, lit("NULL"))
  }

  /** Write `df` as a restorable dump fragment for `table`: one
    * one-row INSERT statement per line, every statement `;\n`
    * terminated — byte-compatible with both a MariaDB restore and
    * [[load]]. One-row statements keep the write a ZERO-SHUFFLE
    * projection (extended-insert grouping would buy restore speed at
    * the cost of a collect_list shuffle; at 100 TB the splittable
    * zero-shuffle form wins, and MariaDB's restore cost is dominated
    * by indexing either way). DATETIME serializes at microsecond
    * precision (DATETIME(6) literal — MariaDB accepts it on plain
    * DATETIME columns by truncation). */
  def writeTable(df: DataFrame, table: String, outPath: String): Unit = {
    graft.GraftExtensions.register(df.sparkSession)
    val body = concat_ws(",", df.schema.fields.map(literal).toSeq: _*)
    df.select(concat(lit(s"INSERT INTO `$table` VALUES ("), body, lit(");"))
        .as("value"))
      .write.mode("overwrite").text(outPath)
  }

  /** MariaDB DDL for one of our tables — the export half of dump
    * interop (our parquet → a dump a MariaDB user can restore:
    * [[createTableSql]] then [[writeTable]] per [[Schemas.writeOrder]]).
    * Types mirror the reference DDL's choices (INTEGER for booleans,
    * LONGTEXT for unbounded strings, DATETIME for timestamps);
    * `downloads BIGINT` is our documented widening (SURVEY §7.4.6). */
  def createTableSql(table: String): String = {
    val schema = Schemas.all(table)
    val cols = schema.fields.map { f =>
      val t = f.dataType match {
        case StringType => "LONGTEXT"
        case BooleanType => "INTEGER"
        case IntegerType => "INTEGER"
        case LongType => "BIGINT"
        case TimestampType => "DATETIME(6)"
        case DoubleType => "DOUBLE"
        case other =>
          throw new IllegalArgumentException(
            s"no MariaDB mapping for ${other.simpleString} ($table.${f.name})")
      }
      s"`${f.name}` $t" + (if (f.nullable) "" else " NOT NULL")
    }
    s"CREATE TABLE IF NOT EXISTS `$table` (${cols.mkString(", ")});"
  }
}
