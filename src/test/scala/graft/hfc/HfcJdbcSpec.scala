package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JDBC seam (verdict-r13 #3): live round trip of all 17 tables
  * against embedded Derby (the no-egress MariaDB stand-in on Spark's
  * classpath), upsert-through-staging semantics, and the pinned
  * MariaDB statement shapes that production would execute. */
class HfcJdbcSpec extends SparkTestBase {

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", d.toString)
    d
  }
  private lazy val url = s"jdbc:derby:${dbDir.resolve("hfc")};create=true"

  /** one deterministic typed row per table (field i gets a value from
    * its position so every column is distinguishable) */
  private def rowFor(table: String, salt: Int): Row = {
    val schema = Schemas.all(table)
    Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case StringType => s"${table.take(8)}_c${i}_$salt"
        case IntegerType => i * 10 + salt
        case LongType => i.toLong * 100L + salt
        case BooleanType => (i + salt) % 2 == 0
        case TimestampType => java.sql.Timestamp.valueOf(s"2024-03-0${(salt % 8) + 1} 10:00:00")
        case other => fail(s"unhandled type $other")
      }
    }.toIndexedSeq)
  }

  private def df(table: String, salts: Int*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(salts.map(rowFor(table, _)): _*), Schemas.all(table))

  test("createTables is idempotent and covers all 17 tables") {
    HfcJdbc.createTables(url)
    HfcJdbc.createTables(url) // second call must be a no-op
    Schemas.writeOrder.foreach { t =>
      assert(HfcJdbc.read(spark, url, t).count() == 0, t)
    }
  }

  test("append + read round-trips every table with schema parity") {
    HfcJdbc.createTables(url)
    Schemas.writeOrder.foreach { t =>
      val in = df(t, 1, 2)
      HfcJdbc.append(in, url, t)
      val back = HfcJdbc.read(spark, url, t)
      // names in order; types up to JDBC equivalence (nullability is
      // metadata the JDBC reader may widen)
      assert(back.schema.fieldNames.toSeq == in.schema.fieldNames.toSeq, t)
      back.schema.fields.zip(in.schema.fields).foreach { case (g, e) =>
        assert(g.dataType == e.dataType, s"$t.${e.name}")
      }
      val key = Schemas.primaryKeys(t)
      val got = back.orderBy(key.head, key.tail: _*).collect().toSeq
      val want = in.orderBy(key.head, key.tail: _*).collect().toSeq
      assert(got == want, t)
    }
  }

  test("upsertJdbc: new keys insert, existing keys take the batch's values") {
    val t = "repository"
    val url2 = s"jdbc:derby:${dbDir.resolve("hfc_upsert")};create=true"
    HfcJdbc.createTables(url2)
    HfcJdbc.append(df(t, 1, 2), url2, t)
    // batch: salt-1 key with salt-9 values (an update) + salt-3 (new)
    val schema = Schemas.all(t)
    val updated = Row.fromSeq(rowFor(t, 9).toSeq.updated(
      schema.fieldIndex("id"), rowFor(t, 1).getAs[String](schema.fieldIndex("id"))))
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(updated, rowFor(t, 3)), schema)
    HfcJdbc.upsertJdbc(batch, url2, t)
    val back = HfcJdbc.read(spark, url2, t).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("name")).toMap
    assert(back.size == 3)
    // salt-1's row now carries salt-9's name; salt-2 untouched; salt-3 new
    assert(back(rowFor(t, 1).getAs[String](schema.fieldIndex("id")))
      == rowFor(t, 9).getAs[String](schema.fieldIndex("name")))
    assert(back.contains(rowFor(t, 2).getAs[String](schema.fieldIndex("id"))))
    assert(back.contains(rowFor(t, 3).getAs[String](schema.fieldIndex("id"))))
    // idempotence: same batch again changes nothing
    HfcJdbc.upsertJdbc(batch, url2, t)
    assert(HfcJdbc.read(spark, url2, t).count() == 3)
    // the staging table was dropped inside the transaction
    assert(intercept[Exception] {
      HfcJdbc.read(spark, url2, s"${t}__stage").count()
    } != null)
  }

  test("upsertJdbc resolves batch-internal duplicate keys last-wins (seqCol)") {
    val t = "tag"
    val url3 = s"jdbc:derby:${dbDir.resolve("hfc_dups")};create=true"
    HfcJdbc.createTables(url3)
    import spark.implicits._
    val batch = Seq(("a", 1L), ("a", 2L), ("b", 1L))
      .toDF("name", "seq")
    HfcJdbc.upsertJdbc(batch.select("name"), url3, t, seqCol = None)
    assert(HfcJdbc.read(spark, url3, t).count() == 2)
  }

  test("MariaDB statement shapes are pinned (production dialect)") {
    // all-key tables degrade to the reference's K3 INSERT IGNORE — a
    // bare INSERT would raise ERROR 1062 on any idempotent re-run
    // (review finding; Derby's MERGE stand-in cannot catch it live)
    assert(HfcJdbc.mariadbUpsertSql("tag")
      == "INSERT IGNORE INTO `tag` (`name`) SELECT `name` FROM `tag__stage`")
    assert(HfcJdbc.mariadbUpsertSql("commit_parents").startsWith("INSERT IGNORE INTO"))
    val repo = HfcJdbc.mariadbUpsertSql("repository")
    assert(repo.startsWith("INSERT INTO `repository` (`id`, "))
    assert(repo.contains("ON DUPLICATE KEY UPDATE `name` = VALUES(`name`)"))
    assert(!repo.contains("`id` = VALUES(`id`)")) // keys never in the SET list
    val ddl = HfcJdbc.createTableSql("repository", "jdbc:mysql://x/hfc")
    assert(ddl.contains("`id` VARCHAR(256)"))     // key: indexable
    assert(ddl.contains("`card_data` LONGTEXT"))  // blob: unbounded
    assert(ddl.contains("PRIMARY KEY (`id`)"))
    val dn = HfcJdbc.createTableSql("discussion", url)
    assert(dn.contains("""PRIMARY KEY ("num", "repo_id")"""))
  }
  test("interop triangle: mysqldump -> typed tables -> Derby -> read-back") {
    // the full path a reference user would walk: their published dump
    // loads, lands in a real database through the K2 upsert protocol,
    // and reads back intact
    val dump =
      """INSERT INTO `author` VALUES ('alice',NULL,1,'Alice A','user','hf');
        |INSERT INTO `repository` VALUES ('models/alice/m1','alice/m1','model','alice','abc','2024-03-01 10:00:00',0,'{\'license\': \'mit\'}','0',5,0);
        |INSERT INTO `model` VALUES ('models/alice/m1','text-classification',1000,'transformers',NULL,'{\'model_type\': \'bert\'}');
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft-triangle")
    java.nio.file.Files.write(dir.resolve("dump.sql"), dump.getBytes("UTF-8"))
    val tables = SqlDump.load(spark, dir.resolve("dump.sql").toString)
    val url4 = s"jdbc:derby:${dbDir.resolve("hfc_triangle")};create=true"
    HfcJdbc.writeAll(tables, url4)
    val back = HfcJdbc.readAll(spark, url4)
    assert(back("repository").count() == 1)
    assert(back("author").count() == 1)
    val r = back("repository").collect().head
    assert(r.getAs[String]("id") == "models/alice/m1")
    assert(r.getAs[Int]("likes") == 5)
    // the repr blob survived the triangle and still parses via compat
    val mt = HfcViews.withConfigViewCompat(back("model"))
      .selectExpr("config_parsed.model_type").collect().head.getString(0)
    assert(mt == "bert")
    // re-running writeAll is idempotent (K2 upsert semantics end to end)
    HfcJdbc.writeAll(tables, url4)
    assert(HfcJdbc.readAll(spark, url4)("repository").count() == 1)
  }
}
