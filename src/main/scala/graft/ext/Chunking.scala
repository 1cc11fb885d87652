package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-layer dedup primitive for
  * near-identical payloads (crawl snapshots, doc revisions, shard re-exports).
  *
  * Fixed-size chunking loses ALL sharing after a one-byte shift: every block
  * boundary moves. CDC instead places boundaries where a hash of the local
  * content window satisfies a mask (here `h60("cdc:" ‖ window) % mask = 0`,
  * the public gear/Rabin-style rule — LBFS, Muthitacharoen et al. 2001), so
  * boundaries RE-SYNCHRONIZE right after an edit and every chunk beyond it
  * is shared again. Expected chunk length = `mask` characters.
  *
  * Everything is a pure row/position function on the portable hash family —
  * no state, no RNG — so chunkings are identical across partitionings and
  * engines (the oracle replays boundary-by-boundary).
  *
  * Scale: the position stream is one explode LINEAR in bytes scanned (the
  * same license as scanning the text at all); per-doc boundary lists are
  * bounded by doc length (collected per doc, never globally); the dedup
  * stat is one count-distinct. At 100 TB the chunk table IS the dedup
  * store — its key is the chunk hash, its dedup join is hash-keyed.
  */
object Chunking {

  /** CDC chunks of every doc: position 1 always starts a chunk; positions
    * 2..len−window+1 start one iff the window hash passes the mask.
    * Output: `(doc, chunk)` — one row per chunk, text preserved in order
    * of the starts array. Docs shorter than window+1 chars are one chunk. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 8, maskMod: Long = 16L): DataFrame = {
    require(window >= 1, s"cdcChunks: window must be >= 1, got $window")
    require(maskMod >= 1, s"cdcChunks: maskMod must be >= 1, got $maskMod")
    val base = docs.select(col(idCol).as("doc"), col(textCol).as("txt"))
    val bounds = base
      .filter(length(col("txt")) >= window + 1)
      .select(col("doc"), col("txt"),
        explode(expr(s"sequence(2, length(txt) - ${window - 1})")).as("pos"))
      .filter(pmod(PortableHash.hash60(
        concat(lit("cdc:"), expr(s"substr(txt, pos, $window)"))), lit(maskMod)) === 0)
      .groupBy(col("doc")).agg(sort_array(collect_list(col("pos"))).as("bpos"))
    base.join(bounds, Seq("doc"), "left")
      .withColumn("starts",
        expr("concat(array(1), coalesce(bpos, CAST(array() AS ARRAY<INT>)))"))
      .select(col("doc"), col("txt"), explode(expr(
        "transform(starts, (s, i) -> struct(s AS s, " +
          "CASE WHEN i = size(starts) - 1 THEN length(txt) + 1 " +
          "ELSE element_at(starts, i + 2) END AS e))")).as("c"))
      .select(col("doc"), expr("substr(txt, c.s, c.e - c.s)").as("chunk"))
  }

  /** Fixed-size chunks — the baseline CDC is measured against. */
  def fixedChunks(docs: DataFrame, idCol: String, textCol: String,
                  size: Int): DataFrame = {
    require(size >= 1, s"fixedChunks: size must be >= 1, got $size")
    docs.select(col(idCol).as("doc"), col(textCol).as("txt"))
      .filter(length(col("txt")) >= 1)
      .select(col("doc"), col("txt"),
        explode(expr(s"sequence(1, length(txt), $size)")).as("s"))
      .select(col("doc"), expr(s"substr(txt, s, $size)").as("chunk"))
  }

  /** One-row dedup summary of a chunk stream: total, distinct, and the
    * dedup win `(total − distinct)·1000 DIV total` permille. */
  def chunkDedupStats(chunks: DataFrame, scheme: String): DataFrame =
    chunks.agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk")).as("n_distinct"))
      .select(lit(scheme).as("scheme"), col("n_chunks"), col("n_distinct"),
        expr("(n_chunks - n_distinct) * 1000 DIV n_chunks").as("dedup_permille"))
}
