package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("repoId builds plural-prefixed canonical ids (SURVEY §1.5.1)") {
    assert(one(Transforms.repoId(lit("model"), lit("org/name"))) == "models/org/name")
    assert(one(Transforms.repoId(lit("dataset"), lit("d"))) == "datasets/d")
  }

  test("cloneUrl leaves models unprefixed (databaseImport.py:338-341)") {
    assert(one(Transforms.cloneUrl("https://hub", lit("model"), lit("m"))) == "https://hub/m")
    assert(one(Transforms.cloneUrl("https://hub", lit("space"), lit("s"))) == "https://hub/spaces/s")
  }

  test("surrogate keys are deterministic sha256 (P1/P2)") {
    val k1 = one(Transforms.repoFileId(lit("models/a/b"), lit("README.md")))
    val k2 = one(Transforms.repoFileId(lit("models/a/b"), lit("README.md")))
    assert(k1 == k2 && k1.length == 64)
    // P3: conflicting-files linkage recomputes P1's hash exactly
    assert(one(Transforms.repoFileId(lit("x"), lit("y"))) ==
           one(sha2(lit("x_y"), 256)))
  }

  test("capDiff replaces oversized diffs with the sentinel (P8)") {
    val big = "x" * 32
    val df = Seq(("ok", "small"), ("big", big)).toDF("k", "diff")
    val out = df.select($"k", Transforms.capDiff($"diff", maxBytes = 16).as("diff"))
      .as[(String, String)].collect().toMap
    assert(out("ok") == "small")
    assert(out("big") == Transforms.DiffSentinel)
  }

  test("effectivePath picks old_path only for DELETE (P9)") {
    assert(one(Transforms.effectivePath(lit("DELETE"), lit("old"), lit("new"))) == "old")
    assert(one(Transforms.effectivePath(lit("MODIFY"), lit("old"), lit("new"))) == "new")
  }

  test("normalizeGated nulls manual/auto (P10, databaseImport.py:721-723)") {
    val vals = Seq("manual", "auto", "True", null).toDF("g")
      .select(Transforms.normalizeGated($"g")).as[Option[String]].collect().toSeq
    assert(vals == Seq(None, None, Some("True"), None))
  }

  test("cleanText strips emoji but keeps text/newlines (P6)") {
    val out = Seq("hi 😀 there\nok").toDF("t")
      .select(Transforms.cleanText($"t")).as[String].head()
    assert(out == "hi  there\nok")
  }

  test("bucketize covers the domain with disjoint half-open ranges") {
    val vals = Seq(0.5, 1.0, 4.9, 5.0, 99.0).toDF("v")
      .select(Transforms.bucketize($"v", Seq(1, 5, 10)).as("b")).as[String].collect().toSeq
    assert(vals == Seq("<1", "[1,5)", "[1,5)", "[5,10)", ">=10"))
  }
}
