package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them. The Spark-side
  * plumbing (schema, batch iteration, partitioning, output shape) is real;
  * the actual codec call is STUBBED with a deterministic fake — this
  * container has no image/audio libraries. Swap [[FakeCodec.decode]] for a
  * real binding (e.g. javacv / TwelveMonkeys) to productionize; nothing
  * else changes.
  *
  * Scale posture: decode runs inside `mapPartitions` (one codec context
  * per task, no per-row setup), metadata extraction is pure codegen'd
  * expressions, and frame sampling is `posexplode` — all
  * shuffle-free, scan-parallel operations.
  */
object Multimodal {

  /** Deterministic fake payload: what an ingest job would have fetched.
    * A 16-byte fake header (magic + dims derived from the content hash)
    * followed by the content bytes. */
  def attachBinary(df: DataFrame, textCol: String, outCol: String = "payload"): DataFrame =
    df.withColumn(outCol,
      concat(
        lit("IMG0").cast("binary"),
        substring(sha2(col(textCol).cast("binary"), 256), 1, 12).cast("binary"),
        col(textCol).cast("binary")))

  /** Pure-expression metadata over the binary column: byte length, content
    * digest, magic prefix. No decode required — this is the cheap path
    * that runs over 100 TB without touching a codec. */
  def extractMeta(df: DataFrame, binCol: String): DataFrame =
    df
      .withColumn("n_bytes", length(col(binCol)))
      .withColumn("digest", md5(col(binCol)))
      .withColumn("magic", substring(col(binCol), 1, 4).cast("string"))

  /** STUB codec: deterministic pseudo-decode of the fake header.
    * A real implementation binds an image library here; the signature —
    * bytes in, (width, height, n_frames) out — is the real contract. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      // fake: derive dims from the first header bytes; stable across runs
      val h = java.util.Arrays.hashCode(bytes.take(16))
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h / 1024) % 1024)
      val frames = 1 + math.abs(h % 8)
      (w, ht, frames)
    }
  }

  /** Decode pass: `mapPartitions` so a real codec would be initialized
    * once per task; appends width/height/n_frames. */
  def decode(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // real impl: val codec = Codec.open() here, once per partition
      it.map { r =>
        val (w, h, f) =
          if (r.isNullAt(idx)) (0, 0, 0)
          else FakeCodec.decode(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(Encoders.row(schema))
  }

  /** Sample up to `n` evenly-spaced frame indices per decoded row —
    * the "video → frames" fan-out as a generator (explode), no shuffle.
    * k = min(n, n_frames) indices at `i * n_frames / k` (i in [0, k)). */
  def frameSample(decoded: DataFrame, n: Int): DataFrame = {
    val k = least(col("n_frames"), lit(n))
    decoded
      .withColumn("frame_idx", explode(
        when(col("n_frames") <= 0, array())
          .otherwise(transform(sequence(lit(0), k - 1),
            i => (i * col("n_frames") / k).cast("int")))))
      .withColumn("frame_key", concat_ws("#", col("digest"), col("frame_idx")))
  }

  /** Deterministic fake feature vector per frame (real impl: model
    * embedding). Pure expressions: stable hash → 8 pseudo-floats. */
  def featureStub(frames: DataFrame): DataFrame =
    frames.withColumn("features",
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("frame_key"), i), lit(1000)).cast("double") / 1000.0)))
}
