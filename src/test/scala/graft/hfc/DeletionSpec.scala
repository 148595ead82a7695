package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DeletionSpec extends SparkTestBase {
  import spark.implicits._
  import Deletion._

  private def fixture() = {
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "name")
    val posts = Seq((10L, Some(1L)), (11L, Some(1L)), (12L, Some(2L)),
                    (13L, Option.empty[Long])).toDF("pid", "uid")
    val comments = Seq((100L, 10L), (101L, 12L), (102L, 13L)).toDF("cid", "pid")
    (Seq(Node("users", users, "uid"), Node("posts", posts, "pid"),
         Node("comments", comments, "cid")),
     Seq(Edge("posts", "uid", "users"), Edge("comments", "pid", "posts")))
  }

  test("cascade kills transitively; NULL FKs survive; audit reconciles") {
    val (nodes, edges) = fixture()
    val res = cascade(nodes, edges, "users", Seq(1L).toDF("k"))
    assert(res.retained("users").select("uid").as[Long].collect().toSet == Set(2L, 3L))
    // posts 10, 11 die with user 1; the orphan post 13 (NULL uid) survives
    assert(res.retained("posts").select("pid").as[Long].collect().toSet == Set(12L, 13L))
    // comment 100 dies with post 10; comments on surviving posts stay
    assert(res.retained("comments").select("cid").as[Long].collect().toSet == Set(101L, 102L))
    val rep = res.report.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == Map("users" -> ((3L, 1L, 2L)),
                      "posts" -> ((4L, 2L, 2L)),
                      "comments" -> ((3L, 1L, 2L))))
    // invariant: retained + deleted partitions each table exactly
    nodes.foreach { n =>
      assert(res.retained(n.name).count() + res.deleted.get(n.name).map(_.count()).getOrElse(0L)
        == n.df.count(), s"partition broken for ${n.name}")
    }
  }

  test("empty deletion set: everything survives, audit shows zero deletions") {
    val (nodes, edges) = fixture()
    val res = cascade(nodes, edges, "users", Seq.empty[Long].toDF("k"))
    assert(res.report.filter($"n_deleted" =!= 0L).count() == 0L)
    assert(res.retained("comments").count() == 3L)
  }

  test("diamond: a table reachable through two parents dies once per row") {
    // users → posts, users → likes, and views references BOTH posts and likes
    val users = Seq((1L, "a"), (2L, "b")).toDF("uid", "name")
    val posts = Seq((10L, 1L), (11L, 2L)).toDF("pid", "uid")
    val likes = Seq((20L, 1L), (21L, 2L)).toDF("lid", "uid")
    val views = Seq((30L, 10L, 21L), (31L, 11L, 20L), (32L, 11L, 21L))
      .toDF("vid", "pid", "lid")
    val res = cascade(
      Seq(Node("users", users, "uid"), Node("posts", posts, "pid"),
          Node("likes", likes, "lid"), Node("views", views, "vid")),
      Seq(Edge("posts", "uid", "users"), Edge("likes", "uid", "users"),
          Edge("views", "pid", "posts"), Edge("views", "lid", "likes")),
      "users", Seq(1L).toDF("k"))
    // view 30 dies via post 10 AND via like 20? no: 30 references post 10
    // (dead) and like 21 (alive) → dies once; 31 references like 20 (dead)
    // → dies; 32 references post 11 + like 21 (both alive) → survives
    assert(res.retained("views").select("vid").as[Long].collect().toSet == Set(32L))
    val rep = res.report.filter($"tbl" === "views")
      .as[(String, Long, Long, Long)].collect().head
    assert(rep == (("views", 3L, 2L, 1L)), "multi-parent casualty double-counted")
  }

  test("diamond with a descendant below the re-converged table: deaths via the " +
       "SECOND parent still reach the descendant, under adversarial edge order") {
    // users → posts, users → likes; views references BOTH (diamond apex);
    // stats sits BELOW views. Edge list deliberately interleaves stats←views
    // between views←posts and views←likes: a walker that fires an edge as
    // soon as its parent has SOME dead set would compute stats' deaths from
    // views' partial (posts-only) dead set and never revisit.
    val users = Seq((1L, "a"), (2L, "b")).toDF("uid", "name")
    val posts = Seq((10L, 1L), (11L, 2L)).toDF("pid", "uid")
    val likes = Seq((20L, 1L), (21L, 2L)).toDF("lid", "uid")
    // view 30 dies via post 10; view 31 dies ONLY via like 20 (the second
    // parent); view 32 survives
    val views = Seq((30L, 10L, 21L), (31L, 11L, 20L), (32L, 11L, 21L))
      .toDF("vid", "pid", "lid")
    // stat 40 hangs off the view that dies via the second parent
    val stats = Seq((40L, 31L), (41L, 30L), (42L, 32L)).toDF("sid", "vid")
    val res = cascade(
      Seq(Node("users", users, "uid"), Node("posts", posts, "pid"),
          Node("likes", likes, "lid"), Node("views", views, "vid"),
          Node("stats", stats, "sid")),
      Seq(Edge("views", "pid", "posts"),
          Edge("stats", "vid", "views"),   // adversarial: listed before views←likes
          Edge("views", "lid", "likes"),
          Edge("posts", "uid", "users"), Edge("likes", "uid", "users")),
      "users", Seq(1L).toDF("k"))
    assert(res.retained("views").select("vid").as[Long].collect().toSet == Set(32L))
    // stat 40 (via view 31, dead only through likes) and 41 must BOTH die
    assert(res.retained("stats").select("sid").as[Long].collect().toSet == Set(42L),
      "descendant below the diamond apex missed deaths from the second parent")
    assert(res.deleted("stats").select("sid").as[Long].collect().toSet == Set(40L, 41L))
  }

  test("guardrails: unknown root and unreachable edges fail loudly") {
    val (nodes, edges) = fixture()
    intercept[IllegalArgumentException](cascade(nodes, edges, "nope", Seq(1L).toDF("k")))
    // a genuinely unreachable edge: child references a table with no dead set
    val nodes2 = nodes :+ Node("tags", Seq((500L, 1L)).toDF("tid", "x"), "tid")
    intercept[IllegalArgumentException](
      cascade(nodes2, edges :+ Edge("posts", "uid", "tags"), "users", Seq(1L).toDF("k")))
  }
}
