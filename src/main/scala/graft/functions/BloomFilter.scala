package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Long-key Bloom filter for runtime join pruning.
  *
  * The big-table side of a selective join pays its shuffle for every
  * row, including the overwhelming majority that the join will drop.
  * A Bloom filter built over the small side's keys and evaluated
  * AGAINST THE SCAN OUTPUT removes most non-matching rows before the
  * exchange — the "runtime filter" every warehouse engine ships
  * (Spark's own `spark.sql.optimizer.runtime.bloomFilter` does this
  * inside AQE for shuffle joins; this is the explicit, pipeline-author
  *-controlled variant with a deterministic hash family, usable where
  * the planner's heuristic won't fire — e.g. ahead of a semi-join
  * whose small side is itself a computed frame).
  *
  * Construction is distributed: positions are computed per key with
  * [[Mix64]] (k independent probes via golden-ratio seed offsets), a
  * `bit_or` aggregation folds them into `m/64` word rows, and only
  * that word table — sized by the FILTER, not the data (2^17 bits =
  * 16 KiB here) — is collected. Bounded by construction, same
  * sanctioned-kilobyte class as the IVF centroid collect
  * (`Similarity.scala`). Membership is a native codegen'd expression:
  * 4 multiplies + 4 array probes per row, zero allocation, inside
  * whole-stage codegen.
  *
  * False positives pass the Bloom (rate (set bits / m)^k — ~4e-6 at
  * the gated sizing); callers keep the exact join AFTER the filter,
  * so the filter changes cost, never results. No false negatives:
  * membership probes the same [[Mix64]] positions construction set.
  */
object BloomFilter {

  /** Golden-ratio increment — the probe-seed spacing (same constant
    * SplitMix64 uses for stream splitting).
    */
  val SeedStep = 0x9e3779b97f4a7c15L

  val DefaultBits = 1 << 17 // 16 KiB of filter for ~10^3..10^4 keys

  /** Probe position of `key` under seed index `s`, in [0, mBits). */
  def position(key: Long, s: Int, mBits: Int): Int =
    java.lang.Math.floorMod(Mix64.mix(key + s * SeedStep), mBits.toLong).toInt

  /** Distributed build: fold `keys` (a single long column) into an
    * `mBits`-bit filter. One narrow projection (explode over the k
    * seeds), one `bit_or` aggregation, and a collect of at most
    * `mBits/64` word rows.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Int = DefaultBits,
      k: Int = 4): Array[Long] = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64, s"mBits must be a power of two >= 64, got $mBits")
    // probe positions come from BloomPosition (wrapping arithmetic in
    // the JVM — ANSI-mode column arithmetic would overflow-throw on
    // the deliberate 2^64 wraparound of the seed offset)
    val posCols = (0 until k).map { s =>
      GraftColumnBridge.column(BloomPosition(
        GraftColumnBridge.expression(col("key")), s, mBits))
    }
    val words = keys
      .select(col(keyCol).cast("long").as("key"))
      // null keys (or null-producing casts) would propagate to a null
      // word group and NPE below; Bloom semantics for null are "not a
      // member", so drop them
      .filter(col("key").isNotNull)
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership column over a long key: true ⇔ every probe bit set. */
  def mightContain(key: Column, bits: Array[Long], k: Int = 4): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(key.cast("long")), bits, k))

  /** Called from generated code. */
  def contains(bits: Array[Long], key: Long, k: Int): Boolean = {
    val mBits = bits.length * 64
    var s = 0
    while (s < k) {
      val pos = position(key, s, mBits)
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      s += 1
    }
    true
  }
}

/** Probe position of a long key under seed index `s` — the build
  * side's half of the one hash definition ([[BloomFilter.position]])
  * that [[BloomMightContain]] probes at read time.
  */
case class BloomPosition(child: Expression, s: Int, mBits: Int) extends UnaryExpression {
  override def prettyName: String = "graft_bloom_position"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomFilter.position(input.asInstanceOf[Long], s, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomFilter.position($c, $s, $mBits)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `key might-be-in filter` as a native expression: interpreted and
  * generated paths share [[BloomFilter.contains]], and the filter
  * words ride the plan as a reference object (shipped once per task
  * via closure serialization, like any broadcast literal).
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomFilter.contains(bits, input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomFilter.contains($bitsRef, $c, $k)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
