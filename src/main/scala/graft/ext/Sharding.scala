package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-assignment schemes and their rebalance cost, as pure row functions.
  *
  * At 100 TB the question "what moves when the shard count changes" is a
  * migration bill measured in re-written terabytes: naive `hash(key) % n`
  * remaps ~(1 − 1/n') of all keys when n → n', while rendezvous (HRW,
  * Thaler & Ravishankar 1998 — public literature) moves only the ~1/n'
  * fraction that lands on the new shard. Both schemes here are pure
  * per-row expressions over the portable md5-60 hash family
  * ([[PortableHash.hash60]]), so assignments are identical across
  * partitionings, reruns, AND engines — the DuckDB oracle replays them
  * arithmetically. No shuffle is needed to ASSIGN shards (a projection);
  * the audit's only shuffle is the final two-row aggregate.
  *
  * Reference scope: the reference engine has no sharding primitive; this is
  * part of the large-scale training-data layer (export sharding at
  * `Sampling.shardForExport` uses mod-hash; this module quantifies when
  * that choice matters).
  */
object Sharding {

  /** Rendezvous (highest-random-weight) shard of `key` among `n` shards:
    * argmax over s ∈ [0, n) of hash60("hrw:key:s"). Ties (probability
    * ~2⁻⁶⁰) break to the SMALLEST shard id on both engines: the struct
    * max carries (h, −s), so max h then max −s = min s, matching the
    * oracle's `list_indexof(l, list_max(l))` first-occurrence semantics. */
  def hrwShard(key: Column, n: Int, salt: String = "hrw"): Column = {
    require(n >= 1 && n <= 64, s"hrwShard: n must be in [1, 64], got $n")
    val entries = (0 until n).map { s =>
      struct(
        PortableHash.hash60(concat(lit(salt + ":"), key.cast("string"), lit(":" + s))).as("h"),
        lit(-s).as("negs"))
    }
    -array_max(array(entries: _*)).getField("negs")
  }

  /** Mod-hash shard: hash60("mod:key") % n — the cheap baseline whose
    * rebalance cost the audit exposes. */
  def modShard(key: Column, n: Int, salt: String = "mod"): Column = {
    require(n >= 1, s"modShard: n must be >= 1, got $n")
    pmod(PortableHash.hash60(concat(lit(salt + ":"), key.cast("string"))), lit(n.toLong))
  }

  /** Rebalance audit for growing `nFrom` → `nTo` shards: one row per scheme
    * (`hrw`, `mod`) with the exact moved-key count and permille. One scan,
    * one two-row aggregate — the per-key work is O(nFrom + nTo) hashes for
    * HRW, O(1) for mod. Expected moved_permille: ≈ 1000·(1 − nFrom/nTo)·
    * (nFrom/nTo ... ) ≈ 1000/nTo for HRW vs ≈ 1000·(1 − 1/nTo) for mod. */
  def rebalanceAudit(keys: DataFrame, keyCol: String, nFrom: Int, nTo: Int): DataFrame = {
    val k = col(keyCol)
    val marked = keys.select(
      (hrwShard(k, nFrom) =!= hrwShard(k, nTo)).cast("long").as("hrw_moved"),
      (modShard(k, nFrom) =!= modShard(k, nTo)).cast("long").as("mod_moved"))
    marked
      .agg(count(lit(1)).as("n_keys"),
        sum(col("hrw_moved")).as("hrw_m"),
        sum(col("mod_moved")).as("mod_m"))
      .select(expr("stack(2, 'hrw', hrw_m, 'mod', mod_m) AS (scheme, n_moved)"),
        col("n_keys"))
      .select(col("scheme"), col("n_keys"), col("n_moved"),
        expr("n_moved * 1000 DIV n_keys").as("moved_permille"))
  }
}
