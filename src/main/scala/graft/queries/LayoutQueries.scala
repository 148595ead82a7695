package graft.queries

import graft.Tables
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout plane: the write-side ordering decisions that make
  * 100 TB scans skippable — Z-order clustering audits and the
  * scale-safe global ordinal. Oracle-checked against DuckDB bit
  * arithmetic / ROW_NUMBER.
  */
object LayoutQueries {

  /** qz01: Z-order layout audit over (doc_id, n_chars) mod 64 — the
    * per-bucket count and per-dimension min/max spans a z-ordered
    * write would expose as file statistics (16 z-prefix buckets ==
    * the 4x4 quadrant grid; both columns' spans shrink to 1/4 of the
    * domain in every bucket). Pure bit-arithmetic projection + one
    * aggregation. */
  def zorderLayout(t: Tables): DataFrame = {
    import t.spark.implicits._
    Layout.zorderAudit(t.documents, $"doc_id" % 64, $"n_chars" % 64,
        bits = 6, bucketBits = 4)
      .orderBy($"bucket")
  }

  val zorderLayoutSql: String =
    """WITH b AS (SELECT doc_id % 64 AS x, n_chars % 64 AS y FROM documents),
      |z AS (SELECT x, y, CAST(list_sum(list_transform(range(0,6), i ->
      |    ((x >> i) & 1) * (1::BIGINT << (2*i)) + ((y >> i) & 1) * (1::BIGINT << (2*i+1))
      |  )) AS BIGINT) z FROM b)
      |SELECT z >> 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin

  /** qz03: Hilbert-curve layout audit over the SAME (doc_id, n_chars)
    * mod-64 domain as qz01 — the jump-free curve: a range-partitioned
    * write on `hd` cuts the plane into contiguous tiles (consecutive
    * curve positions are always grid neighbors — HilbertSpec pins
    * that property exhaustively, and that Z-order violates it). The
    * oracle replays the identical MSB-down reflect+swap walk as a
    * generated chain of per-round CTEs. */
  def hilbertLayout(t: Tables): DataFrame = {
    import t.spark.implicits._
    Layout.hilbertAudit(t.documents, $"doc_id" % 64, $"n_chars" % 64,
        bits = 6, bucketBits = 4)
      .orderBy($"bucket")
  }

  val hilbertLayoutSql: String = {
    val bits = 6
    val lim = 1L << bits
    val rounds = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val prev = if (k == 0) "b" else s"h${k - 1}"
      s"""h$k AS (SELECT x, y,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${lim - 1} - hy ELSE hy END) ELSE hx END hx,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${lim - 1} - hx ELSE hx END) ELSE hy END hy,
         |  hd + ${s * s} * xor(3 * rx, ry) hd
         |  FROM (SELECT x, y, hx, hy, hd,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END ry FROM $prev))""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT doc_id % 64 AS x, n_chars % 64 AS y,
       |    doc_id % 64 AS hx, n_chars % 64 AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM documents),
       |$rounds
       |SELECT hd >> 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
       |FROM h${bits - 1} GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** qz02: deterministic global rank of every document by doc_id —
    * value-range buckets + broadcast offsets + bounded per-bucket
    * windows, never a single-partition window over the corpus. The
    * oracle is the definition itself: ROW_NUMBER() OVER (ORDER BY
    * doc_id). */
  def globalOrdinal(t: Tables): DataFrame = {
    import t.spark.implicits._
    Layout.globalOrdinal(t.documents.select($"doc_id", $"lang"), "doc_id",
        numBuckets = 8)
      .select($"doc_id", $"lang", $"ordinal".cast("long").as("ordinal"))
      .orderBy($"ordinal")
  }

  val globalOrdinalSql: String =
    """SELECT doc_id, lang,
      |  ROW_NUMBER() OVER (ORDER BY doc_id) AS ordinal
      |FROM documents ORDER BY ordinal""".stripMargin

  /** qz04: the layout DECISION artifact — what qz01/qz03's audits
    * exist to answer: for a 16×16 rectangle predicate on the (doc_id,
    * n_chars) mod-64 domain, how many of each layout's 16 files must
    * be read? Natural (ingestion-order ranges of doc_id) clusters one
    * dimension only, so every file spans the full y domain and the
    * predicate reads ALL of them; Z-order and Hilbert files are
    * quadtree tiles whose min/max stats exclude most. A file is read
    * iff its bounding box intersects the predicate — exactly the
    * parquet row-group min/max pruning rule. Pure arithmetic over the
    * audit frames; the selected-row count is layout-invariant (sanity
    * column). */
  def layoutSkipping(t: Tables): DataFrame = {
    import t.spark.implicits._
    val (lo, hi) = (8L, 23L)
    def reads(audit: DataFrame, layout: String): DataFrame =
      audit.select(lit(layout).as("layout"),
          (!($"x_max" < lo || $"x_min" > hi || $"y_max" < lo || $"y_min" > hi))
            .cast("long").as("rd"))
        .groupBy($"layout")
        .agg(count(lit(1)).as("n_files"), sum($"rd").as("files_read"))
    val x = ($"doc_id" % 64).as("x")
    val y = ($"n_chars" % 64).as("y")
    val n = t.documents.count() // driver scalar: the natural-layout divisor
    val natural = t.documents.select(
        least(floor($"doc_id" * 16 / lit(n)), lit(15L)).cast("long").as("bucket"), x, y)
      .groupBy($"bucket")
      .agg(min($"x").as("x_min"), max($"x").as("x_max"),
           min($"y").as("y_min"), max($"y").as("y_max"))
    val z = Layout.zorderAudit(t.documents, $"doc_id" % 64, $"n_chars" % 64,
      bits = 6, bucketBits = 4)
    val h = Layout.hilbertAudit(t.documents, $"doc_id" % 64, $"n_chars" % 64,
      bits = 6, bucketBits = 4)
    val selected = t.documents.select(x, y)
      .filter($"x" >= lo && $"x" <= hi && $"y" >= lo && $"y" <= hi)
      .agg(count(lit(1)).as("rows_selected"))
    reads(natural, "natural")
      .unionByName(reads(z, "zorder"))
      .unionByName(reads(h, "hilbert"))
      .crossJoin(broadcast(selected))
      .select($"layout", $"n_files", $"files_read",
        round($"files_read".cast("double") / $"n_files".cast("double"), 6)
          .as("read_frac"),
        $"rows_selected")
      .orderBy($"layout")
  }

  val layoutSkippingSql: String = {
    val bits = 6
    val lim = 1L << bits
    val rounds = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val prev = if (k == 0) "b" else s"h${k - 1}"
      s"""h$k AS (SELECT x, y,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${lim - 1} - hy ELSE hy END) ELSE hx END hx,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${lim - 1} - hx ELSE hx END) ELSE hy END hy,
         |  hd + ${s * s} * xor(3 * rx, ry) hd
         |  FROM (SELECT x, y, hx, hy, hd,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END ry FROM $prev))""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT doc_id, doc_id % 64 AS x, n_chars % 64 AS y,
       |    doc_id % 64 AS hx, n_chars % 64 AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM documents),
       |$rounds,
       |nn AS (SELECT COUNT(*) n FROM documents),
       |nat AS (SELECT least(CAST(FLOOR(doc_id * 16 / nn.n) AS BIGINT), 15) bucket,
       |    MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max
       |  FROM b CROSS JOIN nn GROUP BY 1),
       |zb AS (SELECT CAST(list_sum(list_transform(range(0,6), i ->
       |    ((x >> i) & 1) * (1::BIGINT << (2*i)) + ((y >> i) & 1) * (1::BIGINT << (2*i+1))
       |  )) AS BIGINT) >> 8 AS bucket, MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max
       |  FROM b GROUP BY 1),
       |hb AS (SELECT hd >> 8 AS bucket,
       |    MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max
       |  FROM h${bits - 1} GROUP BY 1),
       |sel AS (SELECT CAST(COUNT(*) AS BIGINT) rows_selected FROM b
       |  WHERE x BETWEEN 8 AND 23 AND y BETWEEN 8 AND 23),
       |r AS (
       |  SELECT 'natural' layout, CAST(COUNT(*) AS BIGINT) n_files,
       |    CAST(SUM(CASE WHEN NOT (x_max < 8 OR x_min > 23 OR y_max < 8 OR y_min > 23)
       |             THEN 1 ELSE 0 END) AS BIGINT) files_read FROM nat
       |  UNION ALL
       |  SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(CASE WHEN NOT (x_max < 8 OR x_min > 23 OR y_max < 8 OR y_min > 23)
       |             THEN 1 ELSE 0 END) AS BIGINT) FROM zb
       |  UNION ALL
       |  SELECT 'hilbert', CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(CASE WHEN NOT (x_max < 8 OR x_min > 23 OR y_max < 8 OR y_min > 23)
       |             THEN 1 ELSE 0 END) AS BIGINT) FROM hb)
       |SELECT layout, n_files, files_read,
       |  round(CAST(files_read AS DOUBLE) / CAST(n_files AS DOUBLE), 6) read_frac,
       |  sel.rows_selected
       |FROM r CROSS JOIN sel ORDER BY layout""".stripMargin
  }

  /** qz05: PC1 as a LAYOUT KEY — the embedding-plane twin of qz04:
    * lay the embedding corpus into 16 files either by ingestion order
    * (vec_id ranges) or by equal-width PC1 value ranges (the 1-D sort
    * key [[graft.operators.Pca.projected]] exists to provide), then
    * evaluate parquet-style min/max file skipping for the "top 20% of
    * the PC1 value range" predicate. Ingestion-order files each span
    * nearly the full PC1 domain (read ~everything); PC1-range files
    * prune to the tail. Pure arithmetic over broadcast extents — no
    * sampling, no ordinal, no data-scale window; the oracle replays
    * the full PCA trajectory plus the binning. */
  def pc1Layout(t: Tables): DataFrame = {
    import t.spark.implicits._
    // r15: fit + projection share one source scan (Pca.fitAndProject)
    val (c, proj) = graft.operators.Pca.fitAndProject(
      t.embeddings, "embedding", "vec_id", iters = 3)
    val k = c.v.indices.maxBy(j => (math.abs(c.v(j)), -j))
    val flip = if (c.v(k) < 0) -1.0 else 1.0
    val scored = proj
      .select($"vec_id", (lit(flip) * $"pc1").as("pc1")).localCheckpoint()
    // driver scalars: 4 broadcast extents, the justified-collect class
    val mm = scored.agg(min($"pc1"), max($"pc1"), min($"vec_id"), max($"vec_id")).head()
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val (ia, ib) = (mm.getLong(2), mm.getLong(3))
    val lo = mn + 0.8 * (mx - mn)
    def reads(keyCol: org.apache.spark.sql.Column, keyMn: Double, keySpan: Double,
              layout: String): DataFrame =
      scored.select(
          (if (keySpan == 0.0) lit(0L)
           else least(floor((keyCol.cast("double") - lit(keyMn)) / lit(keySpan) * 16),
             lit(15L)).cast("long")).as("bucket"),
          $"pc1")
        .groupBy($"bucket").agg(max($"pc1").as("p_max"))
        .select(lit(layout).as("layout"), ($"p_max" >= lit(lo)).cast("long").as("rd"))
        .groupBy($"layout").agg(count(lit(1)).as("n_files"), sum($"rd").as("files_read"))
    val selected = scored.filter($"pc1" >= lo).agg(count(lit(1)).as("rows_selected"))
    reads($"vec_id", ia.toDouble, (ib - ia).toDouble, "natural")
      .unionByName(reads($"pc1", mn, mx - mn, "pc1"))
      .crossJoin(broadcast(selected))
      .select($"layout", $"n_files", $"files_read",
        round($"files_read".cast("double") / $"n_files".cast("double"), 6).as("read_frac"),
        $"rows_selected")
      .orderBy($"layout")
  }

  val pc1LayoutSql: String =
    s"""WITH ${PipelineQueries.pcaCtes(3)},
       |dq AS (SELECT w.vec_id,
       |    floor(list_dot_product(list_transform(range(1,65), i -> w.e[i] - m.mu[i]), p.vv)*1e6+0.5)/1e6 dot
       |  FROM v w, mu m, p3 p),
       |sc AS (SELECT d.vec_id, fl.f * d.dot pc1 FROM dq d, flip fl),
       |mm AS (SELECT MIN(pc1) mn, MAX(pc1) mx, MIN(vec_id) ia, MAX(vec_id) ib FROM sc),
       |th AS (SELECT mn + 0.8 * (mx - mn) lo FROM mm),
       |nb AS (SELECT CASE WHEN ib = ia THEN 0
       |    ELSE LEAST(CAST(floor((CAST(vec_id AS DOUBLE) - CAST(ia AS DOUBLE))
       |      / CAST(ib - ia AS DOUBLE) * 16) AS BIGINT), 15) END bucket, pc1 FROM sc, mm),
       |pb AS (SELECT CASE WHEN mx = mn THEN 0
       |    ELSE LEAST(CAST(floor((pc1 - mn) / (mx - mn) * 16) AS BIGINT), 15) END bucket, pc1
       |  FROM sc, mm),
       |nf AS (SELECT 'natural' layout, CAST(COUNT(*) AS BIGINT) n_files,
       |    CAST(SUM(CASE WHEN p_max >= lo THEN 1 ELSE 0 END) AS BIGINT) files_read
       |  FROM (SELECT bucket, MAX(pc1) p_max FROM nb GROUP BY bucket), th),
       |pf AS (SELECT 'pc1' layout, CAST(COUNT(*) AS BIGINT) n_files,
       |    CAST(SUM(CASE WHEN p_max >= lo THEN 1 ELSE 0 END) AS BIGINT) files_read
       |  FROM (SELECT bucket, MAX(pc1) p_max FROM pb GROUP BY bucket), th),
       |sel AS (SELECT CAST(COUNT(*) AS BIGINT) rows_selected FROM sc, th WHERE pc1 >= lo)
       |SELECT layout, n_files, files_read,
       |  round(CAST(files_read AS DOUBLE) / CAST(n_files AS DOUBLE), 6) read_frac,
       |  rows_selected
       |FROM (SELECT * FROM nf UNION ALL SELECT * FROM pf), sel
       |ORDER BY layout""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qz01_zorder_layout"  -> ((s: SparkSession, d: String) => zorderLayout(Tables(s, d))),
    "qz02_global_ordinal" -> ((s: SparkSession, d: String) => globalOrdinal(Tables(s, d))),
    "qz03_hilbert_layout" -> ((s: SparkSession, d: String) => hilbertLayout(Tables(s, d))),
    "qz04_layout_skipping" -> ((s: SparkSession, d: String) => layoutSkipping(Tables(s, d))),
    "qz05_pc1_layout"     -> ((s: SparkSession, d: String) => pc1Layout(Tables(s, d))),
  )

  def oracles: Map[String, String] = Map(
    "qz01_zorder_layout"  -> zorderLayoutSql,
    "qz02_global_ordinal" -> globalOrdinalSql,
    "qz03_hilbert_layout" -> hilbertLayoutSql,
    "qz04_layout_skipping" -> layoutSkippingSql,
    "qz05_pc1_layout"     -> pc1LayoutSql,
  )
}
