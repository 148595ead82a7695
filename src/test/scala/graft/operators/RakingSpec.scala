package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class RakingSpec extends SparkTestBase {

  import spark.implicits._

  private def cells(rows: (String, String, Long)*): DataFrame =
    rows.toDF("r", "c", "n")

  private def targets(key: String, rows: (String, Double)*): DataFrame =
    rows.toDF(key, "target")

  private def fit(cs: DataFrame, rt: DataFrame, ct: DataFrame, sweeps: Int): Map[(String, String), Double] =
    Raking.rake(cs, "r", "c", "n", rt, ct, sweeps).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap

  // seed [[10, 30], [60, absent]], row targets (50, 50), col targets (40, 60):
  //   row sweep: r1 sum 40 → ×1.25 → (12.5, 37.5); r2 sum 60 → ×5/6 → 50
  //   col sweep: c1 sum 62.5 → ×0.64 → (8, 32); c2 sum 37.5 → ×1.6 → 60
  test("one sweep reproduces the hand-computed row-then-column scaling") {
    val got = fit(cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L)),
      targets("r", "r1" -> 50.0, "r2" -> 50.0),
      targets("c", "c1" -> 40.0, "c2" -> 60.0), sweeps = 1)
    assert(got === Map(("r1", "c1") -> 8.0, ("r1", "c2") -> 60.0, ("r2", "c1") -> 32.0))
  }

  test("column marginals match their targets exactly after the final column step") {
    val got = fit(cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L), ("r2", "c2", 5L)),
      targets("r", "r1" -> 30.0, "r2" -> 70.0),
      targets("c", "c1" -> 55.0, "c2" -> 45.0), sweeps = 3)
    val c1 = got(("r1", "c1")) + got(("r2", "c1"))
    val c2 = got(("r1", "c2")) + got(("r2", "c2"))
    assert(math.abs(c1 - 55.0) < 1e-4 && math.abs(c2 - 45.0) < 1e-4)
  }

  test("row marginals converge geometrically with sweeps") {
    val cs = cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L), ("r2", "c2", 5L))
    val rt = targets("r", "r1" -> 30.0, "r2" -> 70.0)
    val ct = targets("c", "c1" -> 55.0, "c2" -> 45.0)
    def rowDev(sweeps: Int): Double = {
      val got = fit(cs, rt, ct, sweeps)
      math.abs(got(("r1", "c1")) + got(("r1", "c2")) - 30.0) +
        math.abs(got(("r2", "c1")) + got(("r2", "c2")) - 70.0)
    }
    // strongly-associated seed (odds ratio 0.028) → slow-but-geometric:
    // host replay gives devs 24.06 / 11.13 / 1.90 / 0.043
    val devs = Seq(1, 2, 4, 8).map(rowDev)
    assert(devs.sliding(2).forall(w => w(1) < w(0)), s"not converging: $devs")
    assert(devs.last < 0.1)
  }

  test("raking preserves the seed's odds ratio (association is untouched)") {
    val got = fit(cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L), ("r2", "c2", 5L)),
      targets("r", "r1" -> 30.0, "r2" -> 70.0),
      targets("c", "c1" -> 55.0, "c2" -> 45.0), sweeps = 6)
    val seedOdds = (10.0 * 5.0) / (30.0 * 60.0)
    val fitOdds = (got(("r1", "c1")) * got(("r2", "c2"))) /
      (got(("r1", "c2")) * got(("r2", "c1")))
    assert(math.abs(fitOdds - seedOdds) / seedOdds < 1e-3,
      s"odds ratio moved: seed $seedOdds fitted $fitOdds")
  }

  test("structural zeros stay absent: an unoccupied cell never materializes") {
    val got = fit(cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L)),
      targets("r", "r1" -> 50.0, "r2" -> 50.0),
      targets("c", "c1" -> 40.0, "c2" -> 60.0), sweeps = 4)
    assert(got.size === 3 && !got.contains(("r2", "c2")))
  }

  test("fit is invariant to the input partitioning") {
    val cs = cells(("r1", "c1", 10L), ("r1", "c2", 30L), ("r2", "c1", 60L), ("r2", "c2", 5L))
    val rt = targets("r", "r1" -> 30.0, "r2" -> 70.0)
    val ct = targets("c", "c1" -> 55.0, "c2" -> 45.0)
    val a = fit(cs, rt, ct, 3)
    val b = fit(cs.repartition(7), rt, ct, 3)
    assert(a === b)
  }

  test("non-positive sweeps are rejected loudly") {
    val cs = cells(("r1", "c1", 1L))
    intercept[IllegalArgumentException] {
      Raking.rake(cs, "r", "c", "n", targets("r", "r1" -> 1.0), targets("c", "c1" -> 1.0), 0)
    }
  }

  test("a cell key with no target row fails fast instead of silently dropping mass") {
    val cs = cells(("r1", "c1", 10L), ("r2", "c1", 5L))
    val e = intercept[IllegalArgumentException] {
      fit(cs, targets("r", "r1" -> 15.0), targets("c", "c1" -> 15.0), 1)
    }
    assert(e.getMessage.contains("r2"), s"should name the missing key: ${e.getMessage}")
  }

  test("non-positive targets are rejected loudly") {
    val cs = cells(("r1", "c1", 10L), ("r2", "c1", 5L))
    intercept[IllegalArgumentException] {
      fit(cs, targets("r", "r1" -> 15.0, "r2" -> 0.0), targets("c", "c1" -> 15.0), 1)
    }
  }

  test("a key whose observed marginal is zero is rejected (scale factor undefined)") {
    val cs = cells(("r1", "c1", 0L), ("r2", "c1", 5L))
    val e = intercept[IllegalArgumentException] {
      fit(cs, targets("r", "r1" -> 2.0, "r2" -> 3.0), targets("c", "c1" -> 5.0), 1)
    }
    assert(e.getMessage.contains("marginal"), e.getMessage)
  }

  // r14: the driver-side sweep fast path (grids under driverGridCap)
  // must be BIT-identical to the distributed loop — same decimal-exact
  // marginal sums, same HALF_UP re-quantization. Awkward masses (thirds
  // and sevenths) force non-terminating decimal expansions so any
  // arithmetic divergence shows up in the 6th decimal.
  test("driver fast path and distributed loop produce bit-identical fits") {
    val cs = cells(("r1", "c1", 10L), ("r1", "c2", 31L), ("r2", "c1", 59L),
      ("r2", "c2", 7L), ("r3", "c2", 3L))
    val rt = targets("r", "r1" -> (100.0 / 3.0), "r2" -> (100.0 / 3.0), "r3" -> (100.0 / 3.0))
    val ct = targets("c", "c1" -> (100.0 / 7.0), "c2" -> (600.0 / 7.0))
    def fitWith(cap: Long): Map[(String, String), Double] =
      Raking.rake(cs, "r", "c", "n", rt, ct, sweeps = 3, driverGridCap = cap)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    val driver = fitWith(1000000L)
    val dist = fitWith(0L) // force the distributed fallback
    assert(driver.keySet === dist.keySet)
    driver.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(dist(k)), s"cell $k: $v vs ${dist(k)}")
    }
  }
}
