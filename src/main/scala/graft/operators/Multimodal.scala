package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Multimodal column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The decode path is REAL: [[ImageIoCodec]] parses the payload bytes with
  * the in-JDK `javax.imageio` readers (PNG/JPEG/GIF/BMP — no external
  * dependency) and reports the decoder's own width/height/frame-count.
  * [[StubCodec]] remains only as the documented fallback shape for media
  * formats the JDK lacks codecs for (video containers, audio) — a
  * production deployment drops an FFI decoder behind the same
  * [[MediaCodec]] interface without touching any of the plumbing.
  *
  * Scale design: decode runs inside `mapPartitions`, batched, so (a) the
  * decoder is driven once per partition, not re-dispatched per row, and
  * (b) each task holds at most `batchSize` payloads decoded at once —
  * payload bytes stream through the task rather than accumulating. With
  * binary files at 100 TB you'd pair this with
  * `spark.sql.files.maxPartitionBytes` sized so one task's batch of
  * decoded frames fits executor memory.
  */
object Multimodal {

  /** Decoded-metadata schema appended by [[decodeMeta]]. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  final case class Meta(mime: String, width: Int, height: Int,
      nFrames: Int, nBytes: Long)

  /** Batched media decoder — the signature a vectorized native codec
    * wants: one call per batch, not per row. */
  trait MediaCodec extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Meta]
  }

  /** Real image decode via the JDK's built-in `javax.imageio` readers.
    * Width/height/frame-count come from the actual decoder, not from any
    * side-channel metadata; unrecognized payloads degrade to
    * `application/octet-stream` with zeroed geometry rather than failing
    * the batch (a 100 TB corpus always contains corrupt files). */
  object ImageIoCodec extends MediaCodec {
    // keep ImageIO off its disk scratch cache: payloads are in-memory
    // byte arrays and a tmp-file round-trip per row would dominate
    ImageIO.setUseCache(false)

    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Meta] =
      payloads.map { bytes =>
        val iis = new MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            Meta("application/octet-stream", 0, 0, 0, bytes.length.toLong)
          else {
            val reader = readers.next()
            try {
              // seekForwardOnly=false so getNumImages(true) may scan the
              // whole stream (frame count of animated GIFs)
              reader.setInput(iis, false, true)
              Meta("image/" + reader.getFormatName.toLowerCase,
                reader.getWidth(0), reader.getHeight(0),
                reader.getNumImages(true), bytes.length.toLong)
            } finally reader.dispose()
          }
        } finally iis.close()
      }
  }

  /** Fallback codec shape for formats the JDK has no reader for (video /
    * audio containers): deterministic fake metadata derived from payload
    * length, clearly marked. Production swaps in an FFI decoder behind
    * [[MediaCodec]]; everything else stays. */
  object StubCodec extends MediaCodec {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Meta] =
      payloads.map { bytes =>
        val n = bytes.length
        Meta("media/stub", (n % 640) + 1, (n % 480) + 1, (n % 16) + 1,
          n.toLong)
      }
  }

  /** Deterministic gray value for pixel (x, y) of frame `frame` of doc
    * `id` — the synthetic-image "sensor". Pure integer math so specs can
    * assert decoded pixels bit-exactly. */
  def pixelValue(id: Long, frame: Int, x: Int, y: Int): Int =
    ((id * 31 + frame * 17 + x * 7 + y * 13) & 0xff).toInt

  /** Geometry formulas for the synthetic corpus: derived from text length
    * only, so a SQL oracle over the raw table predicts what the decoder
    * must report. Every 4th doc is an animated GIF (multi-frame); the
    * rest are PNGs (single frame). */
  def synthWidth(len: Int): Int = len % 96 + 1
  def synthHeight(len: Int): Int = len % 64 + 1
  def synthIsGif(id: Long): Boolean = id % 4 == 0
  def synthFrames(id: Long, len: Int): Int =
    if (synthIsGif(id)) len % 8 + 2 else 1

  private def renderFrame(id: Long, frame: Int, w: Int, h: Int)
      : BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixelValue(id, frame, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode one synthetic media payload: real PNG bytes, or a real
    * multi-frame animated GIF for every 4th doc (exercises the frame
    * counter). Deterministic in (id, text length). */
  def renderPayload(id: Long, len: Int): Array[Byte] = {
    val (w, h) = (synthWidth(len), synthHeight(len))
    val out = new ByteArrayOutputStream()
    if (synthIsGif(id)) {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = new MemoryCacheImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until synthFrames(id, len)).foreach { f =>
          writer.writeToSequence(
            new IIOImage(renderFrame(id, f, w, h), null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
    } else {
      val ios = new MemoryCacheImageOutputStream(out)
      try ImageIO.write(renderFrame(id, 0, w, h), "png", ios)
      finally ios.close()
    }
    out.toByteArray
  }

  /** Synthesize a REAL image payload column (PNG / animated GIF bytes)
    * from the id + text columns — stands in for reading real media files;
    * keeps the pipeline runnable on the driver testdata while forcing
    * [[decodeMeta]] to do genuine byte-level decoding. */
  def attachImagePayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", payloadCol: String = "payload")
      : DataFrame = {
    val render = udf((id: Long, text: String) =>
      renderPayload(id, if (text == null) 0 else text.length))
    docs.withColumn(payloadCol, render(col(idCol), col(textCol)))
  }

  /** Synthesize a binary payload column from a text column (raw UTF-8
    * bytes, NOT an image) — the fixture for byte-level feature paths like
    * [[featureHistogram]] whose oracle replays the bytes from SQL. */
  def attachPayload(docs: DataFrame, textCol: String = "text",
      payloadCol: String = "payload"): DataFrame =
    docs.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Decode media metadata for every row, batched per partition. Output =
    * input columns minus the payload, plus [[MetaSchema]]'s fields. */
  def decodeMeta(media: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64, codec: MediaCodec = ImageIoCodec): DataFrame = {
    val spark = media.sparkSession
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    val keptIdx = media.schema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(media.schema.fields) ++ MetaSchema.fields)
    val decoded = media.rdd.mapPartitions { it =>
      // one grouped iterator per partition = one decoder init per task;
      // at most batchSize payloads held decoded at a time
      it.grouped(batchSize).flatMap { batch =>
        val metas = codec.decodeBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.lazyZip(metas).map { (row, m) =>
          Row.fromSeq(keptIdx.map(row.get) ++
            Seq(m.mime, m.width, m.height, m.nFrames, m.nBytes))
        }
      }
    }
    spark.createDataFrame(decoded, outSchema)
  }

  /** Feature extraction over the raw payload: a byte histogram per
    * row — a REAL computation on the binary column (not a stub),
    * standing in the pipeline position where an image embedding / audio
    * spectrogram extractor runs. Pure per-row arithmetic needs no codec
    * init, so unlike [[decodeMeta]] it does NOT drop to an RDD: the
    * native [[graft.functions.expr.ByteHistogram]] expression keeps the
    * whole scan → histogram pipeline inside Tungsten codegen (requires
    * [[graft.GraftExtensions]] on the session). */
  def featureHistogram(media: DataFrame, payloadCol: String = "payload",
      bins: Int = 16): DataFrame =
    media
      .withColumn("byte_hist",
        call_function("byte_hist", col(payloadCol), lit(bins)))
      .drop(payloadCol)

  /** Resize plan: target geometry per row from the decoded metadata —
    * the scheduling half of a resize (the pixel work lives in the
    * codec). Aspect-preserving fit into a `maxDim` box, integer math. */
  def resizePlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val scaleNum = lit(maxDim)
    val longest = greatest(col("width"), col("height"))
    // floor() explicitly: Spark's double->int cast truncates but other
    // engines round, and the oracle must agree
    decoded
      .withColumn("out_w",
        when(longest <= maxDim, col("width"))
          .otherwise(floor((col("width") * scaleNum).divide(longest))
            .cast("int")))
      .withColumn("out_h",
        when(longest <= maxDim, col("height"))
          .otherwise(floor((col("height") * scaleNum).divide(longest))
            .cast("int")))
  }

  /** Frame-sampling plan for multi-frame rows: every `step`-th frame
    * index up to n_frames — the downstream extract works off
    * (doc, frame_idx) pairs. Pure column math; pairs with
    * [[decodeMeta]]'s n_frames (real GIF frame counts). */
  def sampleFrames(decoded: DataFrame, step: Int,
      idCol: String = "doc_id"): DataFrame =
    decoded.select(col(idCol),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))
}
