package graft.hfc

import graft.SparkTestBase

class HfcCatalogSpec extends SparkTestBase {

  test("createAll registers 17 typed empty tables, idempotently (E2)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    try {
      HfcCatalog.createAll(spark, wh)
      HfcCatalog.createAll(spark, wh)   // idempotent
      val tables = spark.sql(s"SHOW TABLES IN ${HfcCatalog.Database}")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(tables == Schemas.all.keySet)
      val repo = HfcCatalog.table(spark, "repository")
      // parquet read-back relaxes nullability; names+types must match
      assert(repo.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
             Schemas.repository.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(repo.count() == 0)
      // a declared-schema table accepts a conforming write + read-back
      HfcCatalog.empty(spark, "tag").write.mode("append")
        .format("parquet").saveAsTable(s"${HfcCatalog.Database}.tag")
      assert(HfcCatalog.table(spark, "tag").count() == 0)
    } finally HfcCatalog.dropAll(spark)
  }
}
