package graft.hfc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade — GDPR-style deletion propagated
  * through a foreign-key graph: deleting a set of root entities must
  * also delete every row that (transitively) references them, and the
  * run must produce an AUDIT of exactly what died where — the part
  * compliance actually asks for.
  *
  * The reference's schema is exactly this shape (repository → files /
  * discussions → comments; Schemas.scala's K6 topological write order
  * is the same DAG walked in reverse), and a training-corpus lakehouse
  * has the identical problem when a source requests takedown.
  *
  * Scale shape: one LEFT SEMI (dead rows) + LEFT ANTI (survivors)
  * join per table, keyed on the FK — the dead-key set is usually tiny
  * relative to the table, so it broadcasts; nothing else shuffles.
  * The walk is breadth-first over the FK DAG, so each table is
  * scanned once regardless of how many parents feed it. Rows with a
  * NULL foreign key never match a dead parent and survive (a NULL FK
  * references nothing).
  */
object Deletion {

  /** `child.fkCol` references `parent`'s primary key. */
  final case class Edge(childTable: String, fkCol: String, parentTable: String)

  final case class Node(name: String, df: DataFrame, key: String)

  final case class CascadeResult(retained: Map[String, DataFrame],
                                 deleted: Map[String, DataFrame],
                                 report: DataFrame)

  /** Propagate the deletion of `deadRootKeys` (single column, any
    * name) from `rootTable` through the FK DAG. Returns survivors and
    * casualties per table plus the audit report
    * (table, n_rows, n_deleted, n_retained). */
  def cascade(nodes: Seq[Node], edges: Seq[Edge],
              rootTable: String, deadRootKeys: DataFrame): CascadeResult = {
    require(nodes.exists(_.name == rootTable), s"unknown root table $rootTable")
    edges.foreach { e =>
      require(nodes.exists(_.name == e.childTable) && nodes.exists(_.name == e.parentTable),
        s"edge references unknown table: $e")
    }
    val byName = nodes.map(n => n.name -> n).toMap
    val deadKeys = scala.collection.mutable.Map[String, DataFrame]()
    val deadRows = scala.collection.mutable.Map[String, DataFrame]()

    val root = byName(rootTable)
    val rootKeyCol = deadRootKeys.columns.head
    deadRows(rootTable) = root.df.join(
      broadcast(deadRootKeys.select(col(rootKeyCol).as("__dk")).distinct()),
      root.df(root.key) === col("__dk"), "left_semi")
    deadKeys(rootTable) = deadRows(rootTable).select(col(root.key))

    // BFS over the DAG: an edge fires once its parent's dead set exists
    var remaining = edges
    var progress = true
    while (remaining.nonEmpty && progress) {
      val (ready, later) = remaining.partition(e => deadKeys.contains(e.parentTable))
      progress = ready.nonEmpty
      ready.foreach { e =>
        val child = byName(e.childTable)
        val dead = child.df.join(
          broadcast(deadKeys(e.parentTable).select(col(byName(e.parentTable).key).as("__dk"))),
          child.df(e.fkCol) === col("__dk"), "left_semi")
        // a table can die through several parents — union the verdicts
        deadRows(e.childTable) = deadRows.get(e.childTable)
          .map(_.unionByName(dead).dropDuplicates(child.key))
          .getOrElse(dead)
        deadKeys(e.childTable) = deadRows(e.childTable).select(col(child.key))
      }
      remaining = later
    }
    require(remaining.isEmpty,
      s"FK edges unreachable from $rootTable's cascade: $remaining")

    val retained = nodes.map { n =>
      n.name -> deadKeys.get(n.name).map { dk =>
        n.df.join(broadcast(dk.select(col(n.key).as("__dk"))),
          n.df(n.key) === col("__dk"), "left_anti")
      }.getOrElse(n.df)
    }.toMap
    val report = nodes.map { n =>
      val total = n.df.agg(count(lit(1)).as("n_rows"))
      val dead = deadRows.get(n.name)
        .map(_.agg(count(lit(1)).as("n_deleted")))
        .getOrElse(total.sparkSession.range(1).select(lit(0L).as("n_deleted")))
      total.crossJoin(broadcast(dead))
        .select(lit(n.name).as("tbl"), col("n_rows"),
          col("n_deleted"), (col("n_rows") - col("n_deleted")).as("n_retained"))
    }.reduce(_ unionByName _).orderBy(col("tbl"))
    CascadeResult(retained, deadRows.toMap, report)
  }
}
