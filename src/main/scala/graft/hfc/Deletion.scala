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
  * join per incoming FK edge — the dead-key set is usually tiny
  * relative to the table, so it broadcasts; nothing else shuffles.
  * Tables are walked in TOPOLOGICAL order over the FK DAG: a table's
  * dead set is final (every parent's deaths unioned in) before any of
  * its own children consult it — firing edges eagerly under-deletes
  * below a diamond re-convergence. Rows with a NULL foreign key never
  * match a dead parent and survive (a NULL FK references nothing).
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

    // Cascade scope = tables reachable from the root over parent→child
    // edges. Every edge's parent must be in scope — an edge hanging off
    // a table the cascade can never reach is a config error, not a no-op.
    val childrenOf = edges.groupBy(_.parentTable)
    val scope = {
      val seen = scala.collection.mutable.Set(rootTable)
      var frontier = List(rootTable)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(t => childrenOf.getOrElse(t, Nil).map(_.childTable))
          .filterNot(seen)
        seen ++= next
        frontier = next.distinct
      }
      seen.toSet
    }
    val outOfScope = edges.filterNot(e => scope(e.parentTable))
    require(outOfScope.isEmpty,
      s"FK edges unreachable from $rootTable's cascade: $outOfScope")

    // Topological order over in-scope tables: a table's dead set is
    // FINAL only once every incoming edge has contributed, so its own
    // outgoing edges must not fire before then. (Firing edges as soon
    // as the parent has SOME dead set under-deletes in a diamond whose
    // re-converged table has descendants: the descendant edge can fire
    // before the second parent's deaths arrive, and it never re-fires.)
    val inDeg = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    edges.foreach(e => inDeg(e.childTable) += 1)
    val order = scala.collection.mutable.ArrayBuffer[String]()
    var ready = scope.filter(t => inDeg(t) == 0).toList.sorted
    val deg = scala.collection.mutable.Map[String, Int]() ++ scope.map(t => t -> inDeg(t))
    while (ready.nonEmpty) {
      val t = ready.head
      ready = ready.tail
      order += t
      childrenOf.getOrElse(t, Nil).foreach { e =>
        deg(e.childTable) -= 1
        if (deg(e.childTable) == 0) ready = (e.childTable :: ready).sorted
      }
    }
    require(order.size == scope.size,
      s"FK graph has a cycle among ${scope -- order}; cascade requires a DAG")

    val survivors = scala.collection.mutable.Map[String, DataFrame]()
    val root = byName(rootTable)
    val rootKeyCol = deadRootKeys.columns.head
    val rootDead = broadcast(deadRootKeys.select(col(rootKeyCol).as("__dk")).distinct())
    deadRows(rootTable) = root.df.join(rootDead, root.df(root.key) === col("__dk"), "left_semi")
    survivors(rootTable) = root.df.join(rootDead, root.df(root.key) === col("__dk"), "left_anti")
    deadKeys(rootTable) = deadRows(rootTable).select(col(root.key))

    val incomingOf = edges.groupBy(_.childTable)
    order.filterNot(_ == rootTable).foreach { tbl =>
      val child = byName(tbl)
      // ALL parents' verdicts land before this table is considered
      // final. Per edge: semi = dead via THIS parent among rows not
      // already dead, anti = still standing — so the dead parts are
      // disjoint by construction and no row is double-counted even
      // when the table's own key is non-unique (e.g. a child keyed by
      // the very FK it passes downstream).
      val incoming = incomingOf.getOrElse(tbl, Nil).filter(e => deadKeys.contains(e.parentTable))
      if (incoming.nonEmpty) {
        var remaining = child.df
        val deadParts = Seq.newBuilder[DataFrame]
        incoming.foreach { e =>
          val pk = broadcast(
            deadKeys(e.parentTable).select(col(byName(e.parentTable).key).as("__dk")).distinct())
          deadParts += remaining.join(pk, remaining(e.fkCol) === col("__dk"), "left_semi")
          remaining = remaining.join(pk, remaining(e.fkCol) === col("__dk"), "left_anti")
        }
        deadRows(tbl) = deadParts.result().reduce(_ unionByName _)
        survivors(tbl) = remaining
        deadKeys(tbl) = deadRows(tbl).select(col(child.key))
      }
    }

    val retained = nodes.map(n => n.name -> survivors.getOrElse(n.name, n.df)).toMap
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
