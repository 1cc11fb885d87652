package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build as a typed `Aggregator`: one serialized filter per
  * group, over pre-hashed 64-bit keys.
  *
  * `df.stat.bloomFilter` builds ONE filter for a whole DataFrame on the
  * driver; a per-FILE (or per-partition, per-day, …) bloom index needs the
  * build to be a grouped aggregate. This aggregator is that: partial buffers
  * are `BloomFilter` sketches, `merge` is the filters' bitwise OR
  * (`mergeInPlace` — sound because both sides were created with identical
  * size parameters from the same aggregator instance), so the build is
  * map-side combinable and the shuffle carries one fixed-size bit array per
  * (partition × group), never the keys.
  *
  * Keys are `xxhash64`-hashed to long BEFORE the aggregator (probe side must
  * hash identically — [[graft.engine.Skipping.readPoint]] does); buffers
  * serialize via the sketch's own Serializable implementation. */
class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(buf: BloomFilter, key: Long): BloomFilter = {
    buf.putLong(key)
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def finish(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization(classOf[BloomFilter])

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAggregator {
  /** Untyped column form: `groupBy(g).agg(bloom_agg(n, fpp)(xxhash64(key)))`
    * → binary serialized [[BloomFilter]]. */
  def bloomAgg(expectedItems: Long, fpp: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BloomAggregator(expectedItems, fpp), Encoders.scalaLong)

  /** Deserialize the aggregator's output bytes back into a probe-able filter. */
  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
