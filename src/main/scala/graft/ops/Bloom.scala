package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import TextKit._

/** Distributed Bloom filter over BIGINT keys, built as a typed Aggregator
  * (bitwise-OR merge — associative/commutative, so Spark runs it with
  * map-side partial aggregation: the shuffle carries one numBits/64-long
  * array per partition, never the key stream) and probed with pure
  * codegen'd column arithmetic (md5-based double hashing + shiftright/AND
  * bit tests over the broadcast literal word array — no UDF).
  *
  * The point at 100 TB is [[Bloom.rejectFilter]]: a rejection anti-join
  * where the blocklist is too large to broadcast-hash-join outright but
  * its BITS fit anywhere. Rows the filter proves absent (the overwhelming
  * majority in a typical curation pass) are kept with ZERO shuffle; only
  * possible members — true rejects plus the small false-positive slice —
  * travel through the exact anti-join. False positives therefore cost
  * only wasted join work, never a wrong answer.
  */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 8, s"numHashes must be in [1,8], got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    // both digests computed ONCE per key, not once per hash index
    val h1 = Bloom.md5Long60(id.toString)
    val h2 = Bloom.md5Long60("1" + id.toString)
    var i = 0
    while (i < numHashes) {
      val p = Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      buf(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object Bloom {

  /** JVM mirror of TextKit.md5Long: delegates to the SAME
    * graft.functions.Md5Long60.hash the expression form runs (cached
    * per-thread digest — no JCA provider lookup per key), so the
    * aggregator and the column probe agree bit for bit by construction. */
  private[graft] def md5Long60(s: String): Long =
    graft.functions.Md5Long60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /** Build the filter's word array over a BIGINT key column. Bit
    * position i of a key is double hashing h1 + i*h2 (mod numBits), with
    * h1 = md5Long(id), h2 = md5Long("1" || id) — the seeded form
    * TextKit.md5Long(c, seed=1) produces. Both operands are < 2^60 and
    * i <= 7, so the Java-wrapping sum matches Spark's wrapping long
    * arithmetic exactly; floorMod matches pmod on the column side.
    * Distributed:
    * partitions fold keys into local bit arrays, merge is a bitwise OR;
    * only the final numBits/64 longs reach the driver. */
  def build(keys: DataFrame, keyCol: String, numBits: Int = 1 << 16,
      numHashes: Int = 4): Array[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    // NULL keys match nothing in the exact anti-join, so dropping them
    // here preserves rejectFilter's equality with the plain left_anti
    // (and .as[Long] would throw on a null otherwise)
    keys.select(col(keyCol).cast(LongType))
      .filter(col(keyCol).isNotNull).as[Long]
      .select(new BloomAgg(numBits, numHashes).toColumn.name("bloom"))
      .head()
  }

  /** Membership probe as a pure column expression over the literal word
    * array: for each of the numHashes positions, shiftright the word and
    * test the low bit. All integer arithmetic, fully codegen'd; `words`
    * rides into the task binary as a literal (8 KiB at the default 2^16
    * bits). */
  def mightContain(words: Array[Long], key: Column, numBits: Int = 1 << 16,
      numHashes: Int = 4): Column = {
    val arr = typedlit(words.toSeq)
    val h1 = md5Long(key.cast(StringType))
    val h2 = md5Long(key.cast(StringType), seed = Some(1))
    (0 until numHashes).map { i =>
      val p = pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))
      val word = element_at(arr,
        call_function("shiftright", p.cast(IntegerType), lit(6)) + 1)
      call_function("shiftright", word, pmod(p, lit(64L)).cast(IntegerType))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Auto-size sentinel for [[rejectFilter]]: pick numBits from the
    * measured blocklist cardinality. */
  val AutoBits: Int = -1

  /** ~10 bits/key (≈1.2% FPR at 4 hashes), rounded up to a multiple of
    * 64, floored at 2^16 (8 KiB — free to ship) and capped at 2^26
    * (8 MiB of task-binary literal — beyond that the filter's broadcast
    * cost starts competing with the anti-join it avoids). A fixed 2^16
    * default would silently saturate past ~10^4 keys: the result stays
    * correct, but every row then pays the exact anti-join — the fast
    * path vanishing with no signal at exactly the advertised scale
    * (round-4 advice). Above ~6.7M keys the cap reintroduces that decay,
    * so the sizing is logged and oversized blocklists should skip the
    * Bloom pre-filter entirely (the exact anti-join is the right plan
    * once the blocklist rivals the big side). */
  def sizeBits(nKeys: Long): Int = {
    val want = math.max(1L << 16, ((nKeys * 10 + 63) / 64) * 64)
    math.min(want, 1L << 26).toInt
  }

  /** Exact rejection filter: rows of `big` whose `idCol` is NOT in
    * `blocklist.blockCol`, equal to a plain left_anti join but with the
    * Bloom fast path: definite non-members short-circuit with no shuffle,
    * only possible members pay the exact anti-join.
    *
    * `numBits` defaults to [[AutoBits]]: sized from `blocklist.count()`
    * via [[sizeBits]] — the count is one cheap job over the (small by
    * contract) blocklist, and it is what keeps the false-positive rate,
    * and with it the zero-shuffle fast path, intact as the blocklist
    * grows. Pass an explicit power-of-64 to pin the size. */
  def rejectFilter(big: DataFrame, idCol: String, blocklist: DataFrame,
      blockCol: String, numBits: Int = AutoBits, numHashes: Int = 4): DataFrame = {
    val bits =
      if (numBits == AutoBits) sizeBits(blocklist.count()) else numBits
    val words = build(blocklist, blockCol, bits, numHashes)
    // probe the SAME key representation the builder hashed (cast to
    // BIGINT first): hashing the raw string of a non-bigint id column
    // ("007", "7.0") would silently diverge from the join's coerced
    // equality and mis-route true rejects to the definite-keep branch.
    // A NULL id (or a value that cannot cast) hashes to NULL and would
    // vanish from BOTH filter branches; route it to the suspects side,
    // whose anti-join keeps it — matching the plain left_anti exactly.
    val maybe = coalesce(
      mightContain(words, col(idCol).cast(LongType), bits, numHashes),
      lit(true))
    val definite = big.filter(!maybe)
    val suspects = big.filter(maybe)
      .join(blocklist.select(col(blockCol).cast(LongType).as(idCol)),
        Seq(idCol), "left_anti")
    definite.unionByName(suspects)
  }
}
