package graft.sources

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 face of the live Hub API — the `spark.read` spelling
  * of [[HttpHfhSource]], mirroring [[GitHistoryDataSource]]:
  *
  * {{{
  *   spark.read.format("hfh")
  *     .option("baseUrl", "https://huggingface.co")
  *     .option("table", "listing")          // or "files" / "discussions"
  *     .option("type", "model")             // listing: repo type
  *     .option("limit", "1000")             // listing: pushed to the API
  *     .option("repos", "models/a,models/b")// files: the listed slice
  *     .option("reposPerPartition", "32")   // files: fan-out granularity
  *     .load()
  * }}}
  *
  * Planning: `listing` is ONE partition — it IS one API call with the
  * sort/limit pushed (databaseImport.py:597's params). `files` is the
  * N+1 detail fan-out: repo ids are grouped into partitions so the
  * fetches parallelize across executors, each partition pacing itself
  * with [[ResilientFetch]]'s limiter/backoff; a repo that exhausts
  * retries emits a row with `fetch_error` set and null file columns —
  * quarantine as data, one `filter` away, never a task failure.
  * Rows stream out as each repo's JSON arrives (no per-partition
  * buffering beyond one repo's siblings).
  */
class HfhDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "hfh"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HfhDataSource.schemaFor(options.getOrDefault("table", "listing"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HfhTable(HfhDataSource.Config(
      table = opts.getOrDefault("table", "listing"),
      baseUrl = Option(opts.get("baseUrl")).getOrElse(
        throw new IllegalArgumentException("hfh source requires a baseUrl option")),
      repoType = opts.getOrDefault("type", "model"),
      limit = opts.getInt("limit", 1000),
      repos = opts.getOrDefault("repos", ""),
      reposPerPartition = opts.getInt("reposPerPartition", 32),
      token = Option(opts.get("token")),
      maxAttempts = opts.getInt("maxAttempts", 4),
      perPartitionRps = opts.getDouble("perPartitionRps", 5.0)))
  }
}

object HfhDataSource {

  /** one listing row — the [[graft.hfc.Normalize.repositories]] bronze
    * shape plus the prefixed repo_id. Field names here are the LEGAL
    * Scala spellings; the published column names (`type`, `private`)
    * live in [[listingSchema]] and the serializer maps positionally. */
  case class ListingRow(name: String, repoType: String, author: String, sha: String,
                        lastModified: java.sql.Timestamp, isPrivate: Boolean,
                        cardData: String, gated: String, disabled: Boolean,
                        likes: Long, repoId: String)

  private[sources] val listingSchema: StructType = {
    val enc = ExpressionEncoder[ListingRow]().schema
    // positional rename to the bronze contract's reserved-word columns
    val names = Seq("name", "type", "author", "sha", "last_modified", "private",
      "card_data", "gated", "disabled", "likes", "repo_id")
    StructType(enc.fields.zip(names).map { case (f, n) => f.copy(name = n) })
  }

  /** one file row — siblings flattened to the silver-adjacent shape;
    * `fetch_error` non-null marks a quarantined repo (file cols null) */
  case class FileRow(repo_id: String, rfilename: String, size: Option[Long],
                     blob_id: String, lfs_size: Option[Long], lfs_sha256: String,
                     lfs_pointer_size: Option[Long], fetch_error: String)

  /** one discussion row (all pages concatenated per repo);
    * `fetch_error` non-null marks a quarantined repo */
  case class DiscussionRow(repo_id: String, num: Option[Long], title: String,
                           status: String, created_at: java.sql.Timestamp,
                           author: String, is_pull_request: Boolean,
                           full_data: String, fetch_error: String)

  final case class Config(table: String, baseUrl: String, repoType: String,
                          limit: Int, repos: String, reposPerPartition: Int,
                          token: Option[String], maxAttempts: Int,
                          perPartitionRps: Double) extends Serializable {
    def policy: ResilientFetch.Policy =
      ResilientFetch.Policy(maxAttempts = maxAttempts, perPartitionRps = perPartitionRps)
  }

  private[sources] def schemaFor(table: String): StructType = table match {
    case "listing"     => listingSchema
    case "files"       => ExpressionEncoder[FileRow]().schema
    case "discussions" => ExpressionEncoder[DiscussionRow]().schema
    case other => throw new IllegalArgumentException(
      s"hfh table must be 'listing', 'files' or 'discussions', got '$other'")
  }

  private[sources] def get(cfg: Config, url: String): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30)).GET()
    cfg.token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = java.net.http.HttpClient.newHttpClient()
      .send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw ResilientFetch.HttpStatusException(resp.statusCode(), url)
    resp.body()
  }

  private[sources] def plural(t: String): String = t match {
    case "model" => "models"; case "dataset" => "datasets"; case "space" => "spaces"
    case other => throw new IllegalArgumentException(s"unknown repoType: $other")
  }

  private def textOrNull(n: JsonNode, field: String): String = {
    val f = n.get(field)
    if (f == null || f.isNull) null
    else if (f.isTextual) f.asText()
    else f.toString
  }

  private[sources] def parseListing(cfg: Config, json: String): Iterator[ListingRow] = {
    val p = plural(cfg.repoType)
    new ObjectMapper().readTree(json).elements().asScala.map { n =>
      val name = textOrNull(n, "id")
      ListingRow(name, cfg.repoType, textOrNull(n, "author"), textOrNull(n, "sha"),
        Option(textOrNull(n, "lastModified"))
          .map(s => java.sql.Timestamp.from(java.time.Instant.parse(s))).orNull,
        Option(n.get("private")).exists(_.asBoolean(false)),
        textOrNull(n, "cardData"), textOrNull(n, "gated"),
        Option(n.get("disabled")).exists(_.asBoolean(false)),
        Option(n.get("likes")).map(_.asLong(0L)).getOrElse(0L),
        s"$p/$name")
    }
  }

  /** page through /discussions?p=K until an empty page; one concatenated
    * row iterator (the reference's get_repo_discussions generator —
    * databaseImport.py:467 — collapsed per repo) */
  private[sources] def fetchDiscussions(cfg: Config, repoId: String,
                                        maxPages: Int = 100): Iterator[DiscussionRow] = {
    val mapper = new ObjectMapper()
    Iterator.from(0).take(maxPages)
      .map { p =>
        val page = mapper.readTree(
          get(cfg, s"${cfg.baseUrl.stripSuffix("/")}/api/$repoId/discussions?p=$p"))
        Option(page.get("discussions")).toSeq.flatMap(_.elements().asScala)
      }
      .takeWhile(_.nonEmpty)
      .flatten
      .map { d =>
        DiscussionRow(repoId,
          Option(d.get("num")).filterNot(_.isNull).map(_.asLong()),
          textOrNull(d, "title"), textOrNull(d, "status"),
          Option(textOrNull(d, "createdAt"))
            .map(s => java.sql.Timestamp.from(java.time.Instant.parse(s))).orNull,
          Option(d.get("author")).map(a => textOrNull(a, "name")).orNull,
          Option(d.get("isPullRequest")).exists(_.asBoolean(false)),
          d.toString, fetch_error = null)
      }
  }

  private[sources] def parseSiblings(repoId: String, json: String): Iterator[FileRow] = {
    val sibs = new ObjectMapper().readTree(json).get("siblings")
    if (sibs == null || !sibs.elements().hasNext) Iterator.empty
    else sibs.elements().asScala.map { s =>
      val lfs = s.get("lfs")
      FileRow(repoId, textOrNull(s, "rfilename"),
        Option(s.get("size")).filterNot(_.isNull).map(_.asLong()),
        textOrNull(s, "blobId"),
        Option(lfs).flatMap(l => Option(l.get("size")).filterNot(_.isNull)).map(_.asLong()),
        Option(lfs).map(l => textOrNull(l, "sha256")).orNull,
        Option(lfs).flatMap(l => Option(l.get("pointerSize")).filterNot(_.isNull)).map(_.asLong()),
        fetch_error = null)
    }
  }
}

private[sources] class HfhTable(cfg: HfhDataSource.Config)
    extends Table with SupportsRead {
  override def name(): String = s"hfh(${cfg.table})"
  override def schema(): StructType = HfhDataSource.schemaFor(cfg.table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema()
      override def toBatch: Batch = this
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        require(cfg.table == "listing",
          s"hfh streaming supports only the listing table, got '${cfg.table}'")
        new HfhListingStream(cfg)
      }
      override def planInputPartitions(): Array[InputPartition] = cfg.table match {
        case "listing" => Array(new HfhPartition(Seq.empty))
        case "files" | "discussions" =>
          cfg.repos.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
            .grouped(math.max(1, cfg.reposPerPartition))
            .map(new HfhPartition(_)).toArray
        case other => throw new IllegalArgumentException(s"unknown hfh table '$other'")
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new HfhReaderFactory(cfg)
    }
}

private[sources] class HfhPartition(val repoIds: Seq[String]) extends InputPartition

/** offset = (poll counter, listing content hash) — the hash makes
  * change detection survive restarts (a resumed query re-polls; same
  * hash → no duplicate snapshot batch) */
private[sources] case class HfhOffset(n: Long, h: String) extends Offset {
  override def json: String = s"""{"n":$n,"h":"$h"}"""
}
private[sources] object HfhOffset {
  def fromJson(j: String): HfhOffset = {
    val node = new ObjectMapper().readTree(j)
    HfhOffset(node.get("n").asLong(), node.get("h").asText())
  }
}

/** Streaming face of the listing table: each trigger polls the listing
  * endpoint; a batch is emitted ONLY when the content hash changes —
  * the continuous form of the reference's periodic re-crawl, feeding
  * foreachBatch + [[graft.hfc.MergeWriter]] upserts (the E1 incremental
  * loop as a stream). Snapshot semantics: every emitted batch is the
  * FULL current listing (bounded by the pushed limit); downstream MERGE
  * makes it incremental. The snapshot rides inside the InputPartition —
  * executors never re-fetch what the driver already paid for. */
private[sources] class HfhListingStream(cfg: HfhDataSource.Config)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  @volatile private var lastSeen: HfhOffset = HfhOffset(0, "")
  // AvailableNow: the offset frozen at prepare time, so the run drains
  // exactly what existed when it started (no mid-run chasing)
  @volatile private var fixedTarget: Offset = _
  // snapshots for planned-but-unread batch ends (replay after restart refetches)
  private val snapshots = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, String]()

  private def listingUrl: String =
    s"${cfg.baseUrl.stripSuffix("/")}/api/${HfhDataSource.plural(cfg.repoType)}" +
      s"?sort=lastModified&direction=-1&limit=${cfg.limit}"

  override def initialOffset(): Offset = HfhOffset(0, "")

  private def pollOnce(): Offset = {
    val json = HfhDataSource.get(cfg, listingUrl)
    val h = java.security.MessageDigest.getInstance("MD5").digest(json.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (h == lastSeen.h) lastSeen
    else {
      lastSeen = HfhOffset(lastSeen.n + 1, h)
      snapshots.put(lastSeen.n, json)
      lastSeen
    }
  }

  override def latestOffset(): Offset = pollOnce()

  // SupportsTriggerAvailableNow / admission control
  override def prepareForTriggerAvailableNow(): Unit = fixedTarget = pollOnce()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    if (fixedTarget != null) fixedTarget else pollOnce()
  override def reportLatestOffset(): Offset = lastSeen

  override def deserializeOffset(json: String): Offset = {
    val o = HfhOffset.fromJson(json)
    // resume: remember the committed hash so an unchanged listing does
    // not re-emit after restart
    if (o.n >= lastSeen.n) lastSeen = o
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HfhOffset]
    val e = end.asInstanceOf[HfhOffset]
    // the change-detection contract is HASH inequality, not counter
    // order: a restarted run's counter restarts at 0, so its first
    // poll can collide with the committed n while carrying new content
    if (e.h == s.h || e.h.isEmpty) Array.empty
    else {
      // replay after restart: the snapshot cache is empty → refetch
      val snap = Option(snapshots.get(e.n))
        .getOrElse(HfhDataSource.get(cfg, listingUrl))
      Array(new HfhSnapshotPartition(snap))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HfhSnapshotReaderFactory(cfg)

  override def commit(end: Offset): Unit = {
    val n = end.asInstanceOf[HfhOffset].n
    snapshots.keySet().removeIf((k: java.lang.Long) => k <= n)
  }

  override def stop(): Unit = snapshots.clear()
}

private[sources] class HfhSnapshotPartition(val snapshot: String) extends InputPartition

private[sources] class HfhSnapshotReaderFactory(cfg: HfhDataSource.Config)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val snap = partition.asInstanceOf[HfhSnapshotPartition].snapshot
    new PartitionReader[InternalRow] {
      private val ser = ExpressionEncoder[HfhDataSource.ListingRow]().createSerializer()
      private val rows = HfhDataSource.parseListing(cfg, snap).map(r => ser(r).copy())
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] class HfhReaderFactory(cfg: HfhDataSource.Config)
    extends PartitionReaderFactory {
  import HfhDataSource._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val repoIds = partition.asInstanceOf[HfhPartition].repoIds
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = cfg.table match {
        case "listing" =>
          val ser = ExpressionEncoder[ListingRow]().createSerializer()
          val url = s"${cfg.baseUrl.stripSuffix("/")}/api/${plural(cfg.repoType)}" +
            s"?sort=lastModified&direction=-1&limit=${cfg.limit}"
          parseListing(cfg, HfhDataSource.get(cfg, url)).map(r => ser(r).copy())
        case "files" =>
          val ser = ExpressionEncoder[FileRow]().createSerializer()
          val limiter = new ResilientFetch.RateLimiter(
            cfg.perPartitionRps, () => System.nanoTime(), Thread.sleep)
          repoIds.iterator.flatMap { id =>
            val url = s"${cfg.baseUrl.stripSuffix("/")}/api/$id"
            val out = ResilientFetch.fetchOne[String](id, _ => HfhDataSource.get(cfg, url),
              cfg.policy, limiter, Thread.sleep)
            out.value match {
              case Some(json) => parseSiblings(id, json)
              case None => Iterator.single(
                FileRow(id, null, None, null, None, null, None, out.error.orNull))
            }
          }.map(r => ser(r).copy())
        case "discussions" =>
          val ser = ExpressionEncoder[DiscussionRow]().createSerializer()
          val limiter = new ResilientFetch.RateLimiter(
            cfg.perPartitionRps, () => System.nanoTime(), Thread.sleep)
          repoIds.iterator.flatMap { id =>
            // retry/quarantine wrap the WHOLE repo's pagination walk
            val out = ResilientFetch.fetchOne[Seq[DiscussionRow]](
              id, _ => fetchDiscussions(cfg, id).toSeq, cfg.policy, limiter, Thread.sleep)
            out.value match {
              case Some(rows) => rows.iterator
              case None => Iterator.single(DiscussionRow(
                id, None, null, null, null, null, is_pull_request = false,
                null, out.error.orNull))
            }
          }.map(r => ser(r).copy())
        case other => throw new IllegalArgumentException(s"unknown hfh table '$other'")
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
