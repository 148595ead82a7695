package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** MariaDB dump loader (verdict-r13 #2): mysqldump grammar against a
  * hand-authored edge-case fixture, writer→parser round trip, and the
  * 17-table pipeline (load → M1-M8 metrics run on loaded tables). */
class SqlDumpSpec extends SparkTestBase {
  import spark.implicits._

  private def writeFixture(name: String, body: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-dump-$name")
    val f = dir.resolve("dump.sql")
    java.nio.file.Files.write(f, body.getBytes("UTF-8"))
    f.toString
  }

  /** mysqldump-shaped edge cases: header comments, conditional
    * directives, LOCK/UNLOCK noise, multi-row extended INSERT,
    * escaped quotes (\' and ''), \n \t \\ escapes, NULLs, negative
    * and scientific numbers, backquoted + qualified identifiers,
    * INSERT IGNORE, explicit column list in permuted order. */
  private val edgeDump =
    """-- MariaDB dump 10.19
      |/*!40101 SET @saved_cs_client = @@character_set_client */;
      |DROP TABLE IF EXISTS `t`;
      |CREATE TABLE `t` (
      |  `id` bigint NOT NULL,
      |  `s` longtext,
      |  `n` double DEFAULT NULL
      |) ENGINE=InnoDB;
      |LOCK TABLES `t` WRITE;
      |INSERT INTO `t` VALUES (1,'plain',2.5),(2,'it\'s a ''quote''',-3e-10),(3,NULL,NULL);
      |INSERT IGNORE INTO `hfc`.`t` VALUES (4,'line1\nline2\ttab\\back',0);
      |INSERT INTO t (n, id, s) VALUES (7.5, 5, 'permuted');
      |UNLOCK TABLES;
      |""".stripMargin

  test("edge-case fixture parses to the exact hand-computed rows") {
    val path = writeFixture("edge", edgeDump)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id bigint, s string, n double")
    val got = SqlDump.loadAs(spark, path, "t", schema)
      .orderBy($"id").collect().toSeq
    assert(got == Seq(
      Row(1L, "plain", 2.5),
      Row(2L, "it's a 'quote'", -3e-10),
      Row(3L, null, null),
      Row(4L, "line1\nline2\ttab\\back", 0.0),
      Row(5L, "permuted", 7.5)))
  }

  test("non-INSERT statements parse to null; torn INSERT fails loudly") {
    import graft.functions.expressions.SqlInsertParse
    assert(SqlInsertParse.parse("CREATE TABLE x (a INT)") == null)
    assert(SqlInsertParse.parse("-- comment only\n") == null)
    assert(SqlInsertParse.parse("") == null)
    intercept[IllegalArgumentException] {
      SqlInsertParse.parse("INSERT INTO `t` VALUES (1,'unterminated")
    }
    intercept[IllegalArgumentException] {
      SqlInsertParse.parse("INSERT INTO `t` VALUES (1),(2")
    }
  }

  test("writer escaping is the parser's exact inverse (nasty alphabet)") {
    val nasty = Seq(
      (1L, "it's"), (2L, "back\\slash"), (3L, "new\nline"),
      (4L, "tab\there"), (5L, "quote\"double"), (6L, null.asInstanceOf[String]),
      (7L, "nul\u0000mid"), (8L, "ctrl\u001Az"), (9L, "café — 漢字"))
      .toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft-dump-rt").resolve("out").toString
    SqlDump.writeTable(nasty, "nasty", dir)
    val back = SqlDump.loadAs(spark, dir, "nasty", nasty.schema)
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(back == nasty.orderBy($"id").as[(Long, String)].collect().toSeq)
  }

  test("NULL booleans dump as the NULL keyword, not 0 (review finding)") {
    val rows: Seq[(Long, java.lang.Boolean)] =
      Seq((1L, java.lang.Boolean.TRUE), (2L, java.lang.Boolean.FALSE), (3L, null))
    val df = rows.toDF("id", "flag")
    val dir = java.nio.file.Files.createTempDirectory("graft-dump-nullbool")
      .resolve("d").toString
    SqlDump.writeTable(df, "nb", dir)
    val text = spark.read.text(dir).as[String].collect().mkString("\n")
    assert(text.contains("(3,NULL)"), text)
    val back = SqlDump.loadAs(spark, dir, "nb", df.schema)
      .orderBy($"id").collect().toSeq
    assert(back == Seq(Row(1L, true), Row(2L, false), Row(3L, null)))
  }

  test("17-table dump loads typed and M1-M8 metrics run on it") {
    // a miniature but referentially-consistent database, dumped in the
    // reference DDL's column ORDER (incl. the columns we drop:
    // author.fullname, model.likes, cfd.filename)
    val dump =
      """INSERT INTO `author` VALUES ('alice',NULL,1,'Alice A','user','hf'),('bob','/a.svg',0,NULL,'user','hf_owner');
        |INSERT INTO `repository` VALUES ('models/alice/m1','alice/m1','model','alice','abc','2024-03-01 10:00:00',0,'{\'license\': \'mit\'}','0',5,0),('datasets/bob/d1','bob/d1','dataset','bob','def','2024-03-02 11:30:00',0,NULL,'manual',2,0);
        |INSERT INTO `model` VALUES ('models/alice/m1','text-classification',1000,'transformers',NULL,'{\'model_type\': \'bert\'}');
        |INSERT INTO `dataset` VALUES ('datasets/bob/d1','desc','cite','pwc-1',50);
        |INSERT INTO `repo_file` VALUES ('f1','README.md','models/alice/m1',120,'b1',NULL,NULL,NULL),('f2','model.bin','models/alice/m1',99,'b2',1048576,'sha','134');
        |INSERT INTO `tag` VALUES ('nlp'),('vision');
        |INSERT INTO `tags_in_repo` VALUES ('nlp','models/alice/m1'),('vision','datasets/bob/d1');
        |INSERT INTO `commits` VALUES ('c1','models/alice/m1','init','2024-02-01 09:00:00',60,'2024-02-01 09:00:00',60,1,10,0,'alice','alice','git');
        |INSERT INTO `discussion` VALUES (1,'models/alice/m1','bob','bug','open','2024-03-03 12:00:00',0,NULL,NULL,NULL,'refs/pr/1'),(2,'models/alice/m1','alice','feature','closed','2024-03-04 13:00:00',1,'main','c1',NULL,'refs/pr/2');
        |INSERT INTO `discussion_event` VALUES ('e1','models/alice/m1',1,'comment','2024-03-03 12:05:00','bob','hi',0,0,NULL,NULL,NULL,NULL,NULL,'{\'author\': {\'name\': \'bob\'}}');
        |""".stripMargin
    val path = writeFixture("full", dump)
    val tables = SqlDump.load(spark, path)
    assert(tables.keySet == Schemas.all.keySet)
    // typed parity with Schemas (names + types; nullability stays open
    // on parsed input — the F7 non-null guards enforce it downstream,
    // same as our parquet reads)
    tables.foreach { case (t, df) =>
      assert(df.schema.fieldNames.toSeq == Schemas.all(t).fieldNames.toSeq, t)
      df.schema.fields.zip(Schemas.all(t).fields).foreach { case (g, e) =>
        assert(g.dataType == e.dataType, s"$t.${e.name}")
      }
    }
    // spot-check typing: timestamps, booleans, renames, repr blobs
    val repo = tables("repository").orderBy($"id").collect()
    assert(repo.length == 2)
    // orderBy(id): row 0 = datasets/bob/d1, row 1 = models/alice/m1
    val lm = tables("repository").where($"id" === "models/alice/m1")
      .select(date_format($"last_modified", "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(lm == "2024-03-01 10:00:00")
    assert(!repo(1).getAs[Boolean]("private"))
    assert(repo(1).getAs[Int]("likes") == 5)
    assert(repo(0).getAs[String]("gated") == "manual")
    val rf = tables("repo_file").orderBy($"id").collect()
    assert(rf(0).getAs[String]("rfilename") == "README.md") // dump `filename`
    assert(rf(1).getAs[Long]("lfs_size") == 1048576L)
    // the dump's python-repr blob converts through the compat view
    val cfg = HfcViews.withConfigViewCompat(tables("model"))
      .select($"config_parsed.model_type").as[String].collect()
    assert(cfg.toSeq == Seq("bert"))
    // fullname survives the load (r14 schema-parity column)
    assert(tables("author").where($"username" === "alice")
      .select($"fullname").as[String].head() == "Alice A")
    // empty-in-dump tables come back empty, not missing
    assert(tables("commit_parents").count() == 0)
    // M1-M8 run green on the loaded database
    assert(HfcMetrics.topOrgsByModels(tables("repository")).count() >= 1)
    assert(HfcMetrics.filesPerRepoHistogram(tables("repo_file")).count() == 1)
    assert(HfcMetrics.paperswithcodeSplit(tables("dataset")).count() >= 1)
    assert(HfcMetrics.discussionShareByType(
      tables("repository"), tables("discussion")).count() >= 1)
    assert(HfcMetrics.discussionsPerRepoHistogram(tables("discussion")).count() == 1)
    assert(HfcMetrics.avgCommentsPerDiscussion(tables("discussion_event")).count() >= 1)
    assert(HfcMetrics.nonOwnerDiscussionShare(
      tables("repository"), tables("discussion")).count() >= 1)
  }

  test("parquet → dump → load round trip on real testdata (customer)") {
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-dump-cust").resolve("d").toString
    SqlDump.writeTable(src, "customer", dir)
    val back = SqlDump.loadAs(spark, dir, "customer", src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("Windows (CRLF) dumps load via the lineSep option") {
    val dump = "INSERT INTO `t` VALUES (1,'a');\r\n" +
      "INSERT INTO `t` VALUES (2,'line\\r\\nwin');\r\n"
    val path = writeFixture("crlf", dump)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id bigint, s string")
    val got = SqlDump.loadAs(spark, path, "t", schema, lineSep = ";\r\n")
      .orderBy($"id").collect().toSeq
    assert(got == Seq(Row(1L, "a"), Row(2L, "line\r\nwin")))
  }

  test("createTableSql emits reference-parity MariaDB DDL") {
    val ddl = SqlDump.createTableSql("repository")
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS `repository`"))
    assert(ddl.contains("`last_modified` DATETIME(6)"))
    assert(ddl.contains("`private` INTEGER"))
    assert(ddl.contains("`id` LONGTEXT NOT NULL"))
    assert(SqlDump.createTableSql("model").contains("`downloads` BIGINT"))
  }
}
