package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The Spark-side mechanics here are real and tested — schema, per-batch
  * decode shape, partition sizing — while the actual media decode is a
  * clearly-marked deterministic STUB ([[StubCodec]]): the container has no
  * image/audio libraries, and a production deployment swaps the stub for
  * a JNI/FFI decoder without touching any of the plumbing.
  *
  * Scale design: decode runs inside `mapPartitions`, batched, so (a) the
  * decoder library is initialized once per partition, not per row, and
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

  /** STUB media codec. A real deployment replaces `decodeBatch` with the
    * native decoder (libjpeg/ffmpeg/...); everything else stays. The stub
    * is a pure function of the payload bytes so the DuckDB oracle can
    * reproduce it. */
  object StubCodec {
    final case class Meta(mime: String, width: Int, height: Int,
        nFrames: Int, nBytes: Long)

    /** Batched decode — the signature a vectorized native codec wants:
      * one call per batch, not per row. */
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Meta] =
      payloads.map { bytes =>
        // STUB: deterministic fake metadata derived from payload length.
        val n = bytes.length
        Meta("image/fake", (n % 640) + 1, (n % 480) + 1, (n % 16) + 1,
          n.toLong)
      }
  }

  /** Synthesize a binary payload column from a text column — stands in
    * for reading real media files; keeps the pipeline runnable on the
    * driver testdata. */
  def attachPayload(docs: DataFrame, textCol: String = "text",
      payloadCol: String = "payload"): DataFrame =
    docs.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Decode media metadata for every row, batched per partition. Output =
    * input columns minus the payload, plus [[MetaSchema]]'s fields. */
  def decodeMeta(media: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    val keptIdx = media.schema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(media.schema.fields) ++ MetaSchema.fields)
    val decoded = media.rdd.mapPartitions { it =>
      // one grouped iterator per partition = one decoder init per task;
      // at most batchSize payloads held decoded at a time
      it.grouped(batchSize).flatMap { batch =>
        val metas = StubCodec.decodeBatch(
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
    * the scheduling half of a resize (the pixel work lives in the codec
    * stub). Aspect-preserving fit into a `maxDim` box, integer math. */
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

  /** Frame-sampling plan for "video" rows: every `step`-th frame index up
    * to n_frames — the downstream extract works off (doc, frame_idx)
    * pairs. Pure column math; pairs with [[decodeMeta]]'s n_frames. */
  def sampleFrames(decoded: DataFrame, step: Int,
      idCol: String = "doc_id"): DataFrame =
    decoded.select(col(idCol),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))
}
