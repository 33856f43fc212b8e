package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) splits oversized sort-merge partitions at runtime;
  * these helpers cover what AQE does not: skewed *aggregation* keys
  * with large reduce-side state, and hash joins where one hot key
  * floods a single task.
  *
  * Both use the standard salt pattern: spread each hot key over
  * `salts` sub-keys, do the heavy operation per (key, salt), then
  * combine. The join result is independent of how rows are salted, so
  * determinism is preserved.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), final aggregate on key. The aggregate must be
    * decomposable, expressed as its two phases — e.g.
    * `saltedAggregate(df, $"k", 16, sum, sum, $"v", "total")`.
    *
    * CONTRACT — how rows spread across salts:
    *   - Default (`saltCol = None`): the salt hashes the WHOLE row's
    *     content. Value-only hashing puts a hot key's rows in one
    *     bucket when the value is constant (counting `lit(1)`), and
    *     row-position ids (`monotonically_increasing_id`) are not
    *     stable under partial stage recomputation — a fetch-failure
    *     retry could re-salt rows differently from the already-fetched
    *     map outputs and silently corrupt the aggregate (the
    *     SPARK-23207 class). Full-row content hashing is deterministic
    *     AND spreads — but ONLY across distinct rows: bytewise-
    *     identical duplicates of a hot key (e.g. a frame pre-projected
    *     to the key alone) all land in one salt bucket and stay
    *     skewed.
    *   - For such inputs pass `saltCol = Some(c)` where `c` is a
    *     STABLE, roughly-unique discriminator the caller owns — a
    *     source row id, `input_file_name()` + offset, a pre-assigned
    *     uuid column. It must be deterministic under recomputation
    *     (same row ⇒ same value), which is exactly what position ids
    *     are not.
    */
  def saltedAggregate(df: DataFrame, key: Column, salts: Int,
      partial: Column => Column, finalAgg: Column => Column, valueCol: Column,
      outName: String, saltCol: Option[Column] = None): DataFrame = {
    val discriminator = saltCol.getOrElse(hash(df.columns.map(col).toIndexedSeq: _*))
    df.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(partial(valueCol).as("__part"))
      .groupBy(col("k"))
      .agg(finalAgg(col("__part")).as(outName))
  }

  /** Skewed equi-join: replicate the build side `salts` times, salt
    * each probe row into one replica, join on (key, salt). Every hot
    * probe key now spreads over `salts` tasks; the build side pays a
    * `salts`× replication (it must be the smaller side).
    *
    * CONTRACT — probe salt: unlike [[saltedAggregate]], the join
    * RESULT is salt-independent (every salt value meets the same
    * replicated build rows), so a recompute-unstable discriminator
    * cannot corrupt output — it only determines load balance. The
    * default position-id salt spreads even bytewise-identical
    * duplicate rows; pass `saltCol` (a stable row id) when you also
    * need the salt — and therefore the task-level row placement — to
    * be reproducible across retries (e.g. debugging a straggler).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String, buildKey: String,
      salts: Int, saltCol: Option[Column] = None): DataFrame = {
    val saltDf = build.sparkSession.range(salts.toLong)
      .select(col("id").cast("int").as("__bsalt"))
    val saltedBuild = build.crossJoin(saltDf)
    val discriminator = saltCol.getOrElse(monotonically_increasing_id())
    val saltedProbe = probe.withColumn("__psalt",
      pmod(hash(col(probeKey), discriminator), lit(salts)))
    // dataframe-qualified key refs: with probeKey == buildKey (the
    // common case) bare col() would be AMBIGUOUS_REFERENCE
    val joined = saltedProbe.join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey) && col("__psalt") === col("__bsalt"))
      .drop("__psalt", "__bsalt")
    if (probeKey == buildKey) joined.drop(saltedBuild(buildKey)) else joined
  }
}
