package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftcol.{toColumn, toExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter runtime join pruning — the "runtime filter" every large
  * engine applies to a selective join (Spark's own InjectRuntimeFilter,
  * Trino's dynamic filtering): aggregate the SMALL side's join keys into a
  * bit set, broadcast it, and drop big-side rows whose key provably isn't
  * in the build side BEFORE they pay the shuffle. False positives pass the
  * pre-filter and are removed by the exact join that follows, so the result
  * is exact for ANY filter quality; false negatives are impossible by
  * construction — the filter only ever removes provably-joinless rows.
  *
  * Both sides hash with the engine's `xxhash64` (codegen'd, same value in
  * build and probe), and the k probe positions derive from that one 64-bit
  * hash Kirsch–Mitzenmacher-style (same derivation as
  * [[graft.dedup.MinHashLSH]]'s signature family) — no per-position rehash.
  *
  * Scale shape: the build is one partial-aggregated pass over the small
  * side (bit-array OR-merge, combiner-friendly); the probe is a codegen'd
  * bit test fused into the big side's scan stage, upstream of the join
  * exchange — the rows it drops never shuffle.
  */
object Bloom {

  /** Size a power-of-two bit count for `n` keys at ~`bitsPerKey` bits each
    * (10 bits/key + 5 probes ≈ 1 % false-positive rate).
    */
  def sizeBits(n: Long, bitsPerKey: Int = 10): Int = {
    val want = math.max(64L, n * bitsPerKey)
    java.lang.Long.highestOneBit(math.min(1L << 30, want * 2 - 1)).toInt
  }

  /** i-th probe position for hash `h` in `mBits` bits (Kirsch–Mitzenmacher:
    * pos_i = h1 + i·h2 with h2 forced odd). Identical on build and probe.
    * h2 MUST derive from the hash's HIGH half: `mBits` is a power of two, so
    * `% mBits` keeps only low bits — were h2 a function of the low bits too
    * (e.g. `h * C`, whose low bits depend only on h's low bits), two keys
    * sharing low-log2(m) hash bits would share their ENTIRE probe set and
    * the false-positive rate degrades from (1-e^(-kn/m))^k to ~n/m
    * (measured: 5.7 % instead of 0.1 % at 16 bits/key).
    */
  private def position(h: Long, i: Int, mBits: Long): Long = {
    val h2 = ((h >>> 32) * 0x9E3779B97F4A7C15L) | 1L
    ((h + i.toLong * h2) & Long.MaxValue) % mBits
  }

  def add(bits: Array[Long], k: Int, h: Long): Unit = {
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = position(h, i, m)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Static probe shared by interpreted eval and generated code. */
  def mightContain(bits: Array[Long], k: Int, h: Long): Boolean = {
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = position(h, i, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column-API probe: true when `hash64` (an `xxhash64` value) may be in
    * the filter.
    */
  def mightContainCol(hash64: Column, bits: Array[Long], k: Int): Column =
    toColumn(BloomMightContain(toExpression(hash64), bits, k))

  /** Probe over a PER-ROW bit array (the sidecar-row shape) — shared by
    * interpreted eval and generated code; reads Catalyst's ArrayData in
    * place, zero per-row copies.
    */
  def mightContainRow(bits: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int, h: Long): Boolean = {
    val m = bits.numElements().toLong * 64
    var i = 0
    while (i < k) {
      val pos = position(h, i, m)
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Column-API probe where the BIT SET IS A COLUMN (one filter per
    * sidecar row) — the engine-side index probe: membership evaluates on
    * the executors over the sidecar scan, so an index of a million files
    * never rides to the driver; callers collect only admitted names.
    */
  def mightContainRowCol(bits: Column, k: Column, hash64: Column): Column =
    toColumn(BloomMightContainRow(toExpression(bits), toExpression(k),
      toExpression(hash64)))
}

/** Typed Aggregator building the bit set from `xxhash64` key values: fixed
  * `numBits/64` longs of state per partial buffer, OR-merge, one pass.
  */
final class BloomBuild(numBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0, "numBits: power of two >= 64")
  require(k >= 1 && k <= 16, "k probes in [1, 16]")

  override def zero: Array[Long] = new Array[Long](numBits / 64)
  override def reduce(b: Array[Long], h: Long): Array[Long] = { Bloom.add(b, k, h); b }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  override def outputEncoder: Encoder[Array[Long]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
}

/** Codegen'd membership probe over a driver-built bit set (carried to
  * executors as a task-closure reference object, like a broadcast literal).
  * Input is the row's `xxhash64(key)`; output false ONLY when the key is
  * provably absent from the build side.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a BIGINT hash, got ${child.dataType.simpleString}")

  override def nullSafeEval(h: Any): Any =
    Bloom.mightContain(bits, k, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.Bloom.mightContain($bitsRef, $k, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // the bit array is payload, not identity — keep equals/hashCode cheap and
  // stable so plan transforms don't hash megabytes per comparison
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain => (b.child == child) && (b.k == k) && (b.bits eq bits)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k), Integer.valueOf(System.identityHashCode(bits)))
}

/** Codegen'd membership probe where the bit set is a PER-ROW column (the
  * index-sidecar shape: one row per data file, `bits ARRAY<BIGINT>`,
  * `k INT`): evaluates on the executors inside the sidecar scan, the
  * engine-side twin of [[BloomMightContain]]'s driver-built form.
  */
case class BloomMightContainRow(bits: Expression, k: Expression,
    hash: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = bits
  override def second: Expression = k
  override def third: Expression = hash

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = bits.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      bits.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType == LongType &&
      k.dataType == org.apache.spark.sql.types.IntegerType &&
      hash.dataType == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain_row expects (ARRAY<BIGINT> bits, INT k, " +
        s"BIGINT hash), got (${bits.dataType.simpleString}, " +
        s"${k.dataType.simpleString}, ${hash.dataType.simpleString})")
  }

  override def nullSafeEval(b: Any, kk: Any, h: Any): Any =
    Bloom.mightContainRow(
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      kk.asInstanceOf[Int], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, kk, h) =>
      s"${ev.value} = graft.functions.Bloom.mightContainRow($b, $kk, $h);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(bits = newFirst, k = newSecond, hash = newThird)
}
