package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs (builder brief).
  *
  * The actual codecs are NOT in this container, so decoding is a
  * pluggable [[Decoder]]; the default [[StubDecoder]] is a
  * deterministic fake (dims/durations derived from the bytes). The
  * Spark-side plumbing is real and what matters at 100 TB:
  *
  *  - media rides in `binary` columns next to its metadata (parquet
  *    stores it page-compressed; column pruning skips it when a query
  *    touches only metadata — the scan never reads media pages),
  *  - decode runs batch-at-a-time inside `mapPartitions` (the Scala
  *    twin of `mapInPandas`: one decoder instance per partition, rows
  *    streamed through it, no per-row setup cost),
  *  - outputs are typed structs declared up front, so downstream
  *    queries stay fully columnar.
  */
object Multimodal {

  /** batch decode interface — swap in a real codec outside this container */
  trait Decoder extends Serializable {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int)         // width, height, channels
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Deterministic fake: metadata from byte content, "resize" scales
    * the payload, "frames" are contiguous byte slices. Replaces the
    * `???` a real codec would fill; keeps every pipeline test runnable
    * and reproducible. */
  object StubDecoder extends Decoder {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (64 + (b0 % 192), 64 + (b1 % 192), 3)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, math.min(bytes.length, w * h * 3 / 1024 + 1))
      java.util.Arrays.copyOf(bytes, target)
    }
    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) Seq.empty
      else {
        val stride = math.max(1, bytes.length / n)
        (0 until n).map { i =>
          val from = math.min(i * stride, bytes.length - 1)
          java.util.Arrays.copyOfRange(bytes, from, math.min(from + stride, bytes.length))
        }
      }
    }
  }

  /** Real in-JVM codec over `javax.imageio` — JPEG/PNG/GIF/BMP, the
    * formats the JDK ships readers for; no native libraries, no
    * network. [[StubDecoder]] stays the default where cross-engine
    * oracle determinism matters (the stub's outputs are pure byte
    * functions both engines can mirror); this is the production path
    * for real image corpora.
    *
    *  - `imageMeta`: decoded width/height plus the color model's
    *    component count (3 for RGB JPEG, 4 for RGBA PNG, 1 for gray).
    *  - `resize`: bilinear rescale, re-encoded as PNG (lossless, so
    *    repeated pipeline passes don't compound JPEG artifacts).
    *  - `frameSample`: multi-frame containers the JDK can read
    *    (animated GIF) yield n evenly-spaced frames as PNG; a
    *    single-frame image yields itself once.
    *
    * Throws on undecodable payloads — wrap in [[FailSoft]] when the
    * corpus may contain garbage (at 100 TB it will). */
  object ImageIoDecoder extends Decoder {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def decode(bytes: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "payload not decodable by any registered ImageIO reader")
      img
    }

    def imageMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val img = decode(bytes)
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
      val img = decode(bytes)
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      require(n > 0, s"n must be positive, got $n")
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "payload not decodable by any registered ImageIO reader")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val total = reader.getNumImages(true)
          val idxs =
            if (total <= n) 0 until total
            else (0 until n).map(i => i * total / n)
          idxs.map { i =>
            val bos = new ByteArrayOutputStream()
            ImageIO.write(reader.read(i), "png", bos)
            bos.toByteArray
          }
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Corruption guard for real corpora: delegates to `inner`, mapping
    * any decode failure to sentinel outputs ((-1,-1,-1) meta, empty
    * payloads) instead of failing the task — one bad JPEG must not
    * kill a 100 TB pass. Pair with a downstream
    * `filter($"image_meta.width" >= 0)` quarantine. */
  final case class FailSoft(inner: Decoder) extends Decoder {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int) =
      try inner.imageMeta(bytes) catch { case scala.util.control.NonFatal(_) => (-1, -1, -1) }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      try inner.resize(bytes, w, h) catch { case scala.util.control.NonFatal(_) => Array.emptyByteArray }
    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      try inner.frameSample(bytes, n) catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  /** Attach a decoded `image_meta` struct column. Runs the decoder
    * partition-batch-wise via `mapPartitions` over the full row —
    * schema declared explicitly so the result stays columnar. */
  def withImageMeta(df: DataFrame, binCol: String,
                    decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("image_meta", imageMetaType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // one decoder per partition: per-batch setup cost, not per-row
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (w, h, c) = decoder.imageMeta(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, c, bytes.length.toLong))
      }
    }(enc)
  }

  /** Thumbnail pass: replace the payload with a resized one, keeping
    * provenance columns. */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int,
              decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("thumb", BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ decoder.resize(bytes, w, h))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (video → image
    * rows), exploding partition-locally with no shuffle. */
  def frameSampled(df: DataFrame, binCol: String, idCol: String, n: Int,
                   decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", df.schema(idCol).dataType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        decoder.frameSample(bytes, n).zipWithIndex.map { case (fr, i) =>
          Row(r.get(idIdx), i, fr)
        }
      }
    }(enc)
  }
}
