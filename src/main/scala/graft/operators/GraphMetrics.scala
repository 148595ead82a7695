package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph metrics over an edge table — the census queries a
  * pipeline runs on derived similarity / co-occurrence graphs (dedup
  * candidate graphs, user co-activity graphs) before acting on them.
  *
  * [[triangleCount]] is the degree-oriented ("compact-forward") exact
  * triangle count: every edge is oriented from its lower endpoint to
  * its higher endpoint under the total order (degree, id), wedges are
  * enumerated only from each vertex's oriented out-neighborhood, and a
  * wedge closes iff its endpoints are adjacent. Orientation bounds
  * every vertex's out-degree by O(√m) regardless of skew — the hub
  * vertex that breaks the naive a<b<c id-ordered join (its entire
  * neighborhood becomes wedges) has high degree, so almost all its
  * edges point INTO it and it apexes almost no wedges. The count is
  * identical to the naive formulation (each triangle has exactly one
  * apex under any total order); only the join volume changes.
  *
  * Scale: two shuffles to build degrees + orientation, one self-join
  * on the apex key (bounded fan-out by the orientation), one semi-join
  * against the canonical edge set to close wedges. All counts exact
  * integers — no float drift anywhere.
  */
object GraphMetrics {

  /** Canonicalize an edge list: undirected, deduped, no self-loops,
    * `a < b`. Input columns `a`, `b`. */
  def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(least(col("a"), col("b")).as("a"),
                 greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Exact triangle count plus node/edge census of the undirected
    * graph. One output row: `n_nodes, n_edges, n_triangles`. */
  def triangleCount(edges0: DataFrame): DataFrame = {
    val edges = canonicalEdges(edges0)
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient low → high under (degree, id); out-degree ≤ O(√m)
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges from each apex's out-neighborhood; id-ordered so each
    // unordered out-pair appears once
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
      .select(col("u"), col("x").as("a"), col("y").as("b"))
    // semi join is a filter: each (u, a, b) wedge row survives iff
    // (a, b) is an edge — distinct apexes of the same closing edge
    // each keep their own row
    val triangles = wedges.join(edges, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .crossJoin(broadcast(triangles))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
