package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain blocklist filtering — the UT1/RefinedWeb-style gate a web
  * corpus passes BEFORE any content heuristic runs: a document whose
  * host falls under a blocked registrable domain (the host itself or
  * any parent-domain suffix, so `cdn.ads.example.net` is killed by the
  * rule `ads.example.net`), or whose path contains a blocked keyword,
  * never enters the pipeline.
  *
  * Scale shape: the host's suffix chain is a bounded explode (a host
  * has ≤ ~10 labels, so ≤ ~9 suffixes) joined against the blocklist
  * with a LEFT SEMI join. Real blocklists (UT1 adult ≈ 4M domains) are
  * tens of MB — broadcast by default so the corpus never shuffles; for
  * a pathological blocklist the same join degrades gracefully to a
  * shuffle keyed on the suffix, still linear in corpus size. Path
  * rules are a pure per-row predicate (zero shuffle).
  */
object UrlFilter {

  /** All parent-domain suffixes of `host` with at least two labels,
    * longest first: `a.b.c.d` → `[a.b.c.d, b.c.d, c.d]`. A one-label
    * "host" (no dot) yields just itself. */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 1, array(host)).otherwise(
      transform(sequence(lit(0), size(labels) - 2),
        i => array_join(slice(labels, i + 1, size(labels) - i), ".")))
  }

  /** Annotate every row with its block decision.
    *
    * @param docs      corpus with a full-URL column
    * @param blocklist one `domain` column of blocked registrable
    *                  domains (suffix semantics); broadcast — pass a
    *                  pre-bucketed frame and drop the hint upstream if
    *                  a blocklist ever outgrows broadcast range
    * @param pathKeywords literal substrings that block on the URL path
    * @return input columns + `host`, `blocked`, `reason`
    *         (`domain` beats `path`; NULL when kept)
    */
  def applyBlocklist(docs: DataFrame, blocklist: DataFrame,
                     pathKeywords: Seq[String],
                     urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val withHost = docs.withColumn("host",
      regexp_extract(col(urlCol), "^https?://([^/]+)", 1))
    // (id, suffix) → semi-join the blocklist → the set of domain-blocked ids
    val domainHits = withHost
      .select(col(idCol), explode(domainSuffixes(col("host"))).as("domain"))
      .join(broadcast(blocklist.select(col("domain"))), Seq("domain"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("domain_blocked", lit(true))
    val pathHit = pathKeywords
      .map(k => col(urlCol).contains(k))
      .reduceOption(_ || _).getOrElse(lit(false))
    withHost
      .join(domainHits, Seq(idCol), "left")
      .withColumn("reason",
        when(coalesce(col("domain_blocked"), lit(false)), lit("domain"))
          .when(pathHit, lit("path")))
      .withColumn("blocked", col("reason").isNotNull)
      .drop("domain_blocked")
  }
}
