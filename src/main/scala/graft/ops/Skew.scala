package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4 scale toolkit).
  *
  * First-line defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it.
  * Salting is the explicit fallback for when skew is known up front or
  * AQE can't help (e.g. the skewed side feeds an aggregation, or the
  * join is a broadcast candidate that doesn't fit memory): the hot key's
  * rows scatter across `numSalts` reducers instead of serializing
  * through one.
  */
object Skew {

  /** The salt the big side is scattered by: a whole-row hash mod
    * numSalts, so identical-key rows (the hot key's) land on different
    * salts as long as any payload column differs. Exposed as the one
    * seam SkewSpec's spread test drives — hashing only the key column
    * here would collapse every hot-key row onto one salt and break the
    * whole point of salting, and the spec must fail when that happens.
    */
  private[graft] def saltCol(df: DataFrame, numSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(numSalts))

  /** Equi-join `big ⋈ small` on `key`, salted: the big side gets a
    * deterministic salt derived from its whole row (identical-key rows
    * spread across salts), the small side is replicated once per salt,
    * and the join key becomes (key, salt). Result equals the plain
    * inner equi-join; the shuffle spreads each hot key over `numSalts`
    * partitions at the cost of a `numSalts`x replication of the small
    * side — same trade Spark's own skew hints make.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    // a name no input can collide with: withColumn would silently
    // REPLACE a user column named "_salt" (and the final drop would
    // then destroy it), breaking the equals-the-plain-join contract
    var salt = "_salt"
    while (big.columns.contains(salt) || small.columns.contains(salt))
      salt += "_"
    val saltedBig = big.withColumn(salt, saltCol(big, numSalts))
    val saltedSmall = small.withColumn(salt,
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(saltedSmall, Seq(key, salt)).drop(salt)
  }

  /** Per-key frequency above a threshold — the cheap pre-pass that
    * decides whether to salt at all (run on a sample at scale).
    */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
