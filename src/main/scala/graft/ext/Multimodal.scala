package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` content
 * with a typed metadata struct. The Spark-side machinery — schema,
 * partition-wise batch processing, column layout — is real and tested;
 * the decode kernels are DETERMINISTIC STUBS (this container has no
 * image/audio codecs). Swap `decodeStub` for a real codec per modality;
 * everything else is production-shaped.
 *
 * Scale notes: all transforms run as `mapPartitions` over binary batches —
 * one pass, no shuffle, no driver collection. Feature extraction emits
 * fixed-width Array[Float] (histogram stub) matching what a real
 * CNN/fbank extractor would produce shape-wise.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("format", StringType))))))

  /** Deterministic fake media: bytes derived from (id, text) — stands in
    * for real image/audio payloads so the pipeline is exercisable. */
  def synthesize(df: DataFrame, idCol: String, textCol: String,
                 modality: String = "image"): DataFrame = {
    val withContent = df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      // fake payload: repeated sha2 of the text, truncated to a size
      // derived from the id — deterministic, variable-length
      substring(repeat(sha2(col(textCol), 256), 8),
        lit(1), (pmod(col(idCol), lit(512)) + 64).cast(IntegerType))
        .cast(BinaryType).as("content"))
    withContent.withColumn("meta", struct(
      (pmod(col("media_id"), lit(640)) + 32).cast(IntegerType).as("width"),
      (pmod(col("media_id"), lit(480)) + 32).cast(IntegerType).as("height"),
      lit(3).as("channels"),
      lit(16000).as("sample_rate"),
      lit(if (modality == "image") "png" else "wav").as("format")))
  }

  private val featureDim = 16

  /**
   * STUB decode + feature extraction: a real implementation would decode
   * the codec and run a feature net; the stub computes a normalized
   * byte-histogram (deterministic, fixed 16-dim output). The mapPartitions
   * batch shape — iterate rows, emit (media_id, features) — is exactly the
   * real pipeline's.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val hist = new Array[Float](featureDim)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) % featureDim) += 1f
            i += 1
          }
          var j = 0
          while (j < featureDim) { hist(j) /= bytes.length; j += 1 }
        }
        Row(id, hist.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** STUB resize: deterministic byte re-sampling to w*h "pixels". */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(mediaSchema.fields.map {
      case f if f.name == "content" => f
      case f => f
    })
    val schema = media.schema
    val idI = schema.fieldIndex("media_id"); val moI = schema.fieldIndex("modality")
    val coI = schema.fieldIndex("content"); val meI = schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](coI)
        val out = new Array[Byte](w * h)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < out.length) {
            out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
            i += 1
          }
        }
        val m = r.getStruct(meI)
        Row(r.getLong(idI), r.getString(moI), out,
          Row(w, h, m.get(2), m.get(3), m.get(4)))
      }
    }(RowEncoder.encoderFor(mediaSchema))
  }

  /** STUB frame sampling: n evenly-spaced byte windows ("frames"). */
  def sampleFrames(media: DataFrame, n: Int, frameSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](coI)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { f =>
          val start = (f.toLong * bytes.length / n).toInt
          val end = math.min(start + frameSize, bytes.length)
          Row(r.getLong(idI), f, java.util.Arrays.copyOfRange(bytes, start, end))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
