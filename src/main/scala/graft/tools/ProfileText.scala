package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the text-function hotspots (dev tool): native
  * expression vs HOF reference, min-of-3 noop-sink runs each. */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-text")
    val docs = Tables(spark, dir).documents
    def best(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-28s min ${ts.min}%6.2f s  runs ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    import spark.implicits._
    best("fingerprint native") {
      docs.select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
    }
    best("fingerprint hof-shingles") {
      docs.select($"doc_id",
        array_join(slice(array_sort(TextFunctions.shingleHashesHof($"text")), 1, 4), "|").as("fp"))
    }
    best("simhash native") { docs.select($"doc_id", TextFunctions.simhash16($"text").as("s")) }
    best("simhash hof") { docs.select($"doc_id", TextFunctions.simhash16Hof($"text").as("s")) }
    spark.stop()
  }
}
