package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the standard memory lever for
  * embedding stores at retrieval scale: per-dimension min/max scaling
  * into 0..255 cuts a float32 corpus 4× (float64 8×), which at 100 TB
  * is the difference between an in-memory ANN tier and a disk-bound
  * one. Search runs on DEQUANTIZED vectors; recall loss is bounded by
  * the per-dimension step size (spec-measured against exact search).
  *
  * Scale shape: the calibration table is one posexplode + per-dim
  * min/max aggregation — `dim` rows total, pivoted into two array
  * literals and BROADCAST; quantization itself is then a pure
  * projection (one `transform` per row), so the corpus is scanned
  * once and never shuffled.
  *
  * Cross-engine determinism: scaling is pure IEEE arithmetic in a
  * fixed expression order (no transcendentals), `round(_, 0)` is
  * half-up in both engines for the non-negative scaled values, and
  * the quantized code is kept as an integer-valued double so the
  * dequantized reconstruction is bit-identical.
  */
object Quantization {

  /** Per-id quantized codes (`q8`, integer-valued 0..255) and the
    * dequantized reconstruction (`deq`) used for search. Constant
    * dimensions (max == min) code to 0 and reconstruct the constant. */
  def int8(emb: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val byDim = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cal = byDim.agg(
      transform(array_sort(collect_list(struct(col("i"), col("mn")))), s => s.getField("mn"))
        .as("mins"),
      transform(array_sort(collect_list(struct(col("i"), col("mx")))), s => s.getField("mx"))
        .as("maxs"))
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
      .crossJoin(broadcast(cal))
      .select(col(idCol),
        transform(col("e"), (x, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          when(mx === mn, lit(0.0))
            .otherwise(round((x - mn) / (mx - mn) * lit(255.0), 0))
        }).as("q8"),
        col("mins"), col("maxs"))
      .select(col(idCol), col("q8"),
        transform(col("q8"), (q, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          mn + q / lit(255.0) * (mx - mn)
        }).as("deq"))
  }
}
