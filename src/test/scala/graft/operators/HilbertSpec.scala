package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  /** reference single-threaded xy2d (the classic reflect+swap walk) */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def fullGrid(bits: Int) = {
    val n = 1 << bits
    (0 until n * n).map(i => (i.toLong % n, i.toLong / n)).toDF("gx", "gy")
  }

  test("audit index matches the reference walk exhaustively (8x8)") {
    // bucketBits = 2*bits => bucket IS the full hilbert index
    val got = Layout.hilbertAudit(fullGrid(3), $"gx", $"gy", bits = 3, bucketBits = 6)
      .select($"x_min".as("x"), $"y_min".as("y"), $"bucket")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 64)
    for (x <- 0L until 8L; y <- 0L until 8L)
      assert(got((x, y)) == xy2d(3, x, y), s"($x,$y)")
  }

  test("consecutive curve positions are always grid neighbors; Z-order's are not") {
    val cells = Layout.hilbertAudit(fullGrid(6), $"gx", $"gy", bits = 6, bucketBits = 12)
      .select($"bucket", $"x_min", $"y_min")
      .orderBy($"bucket").as[(Long, Long, Long)].collect()
    assert(cells.length == 4096)
    assert(cells.map(_._1).toSeq == (0L until 4096L))
    val jumps = cells.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(jumps.forall(_ == 1L), s"max hilbert jump ${jumps.max}")
    // the same walk along the Morton curve has seams (jump > 1)
    val zCells = fullGrid(6)
      .select($"gx", $"gy", Layout.zValue2($"gx", $"gy", bits = 6).as("z"))
      .orderBy($"z").as[(Long, Long, Long)].collect()
    val zJumps = zCells.sliding(2).map { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(zJumps.max > 1L, "expected Morton diagonal seams")
  }

  test("top-bucket tiles are the same tight quadtree cells as Z-order's") {
    val h = Layout.hilbertAudit(fullGrid(6), $"gx", $"gy", bits = 6, bucketBits = 4)
      .select($"bucket", $"n_rows", $"x_max" - $"x_min", $"y_max" - $"y_min")
      .as[(Long, Long, Long, Long)].collect()
    assert(h.length == 16)
    assert(h.forall { case (_, n, dx, dy) => n == 256 && dx == 15 && dy == 15 })
  }

  test("guards: NULL and out-of-domain inputs fail loudly") {
    val bad = Seq((1L, 70L)).toDF("gx", "gy") // y outside [0, 64)
    val e = intercept[Exception] {
      Layout.hilbertAudit(bad, $"gx", $"gy", bits = 6, bucketBits = 4).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](
      Layout.hilbertAudit(fullGrid(3), $"gx", $"gy", bits = 3, bucketBits = 9))
  }
}
