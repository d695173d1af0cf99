package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Packed-bloom-words aggregate for the zone-map manifest's point-lookup
  * bands ([[graft.sources.Tables.writeStatsManifest]]): per group (= per
  * data file), OR together the two probe-position bits of every row into a
  * `words`-long packed bit array.
  *
  * The inputs are the two probe POSITIONS, already computed by the shared
  * `bloomPositions` Spark expressions (`pmod(xxhash64(c), bits)` twice with
  * different seeds) — this aggregate only sets bits, so build and probe
  * still evaluate the exact same xxhash64 and cannot disagree on a bit.
  * A negative position is the null-key sentinel (a point probe for null is
  * not meaningful): the row contributes nothing, matching the previous
  * formulation's `case when c is null then 0`.
  *
  * Why an Aggregator and not one `bit_or` per word (the round-13 shape):
  * the word-wise form re-evaluated BOTH xxhash64 calls once per word per
  * row — at q254's sf0.1 sizing (586 words) that is ~1,172 hash
  * evaluations per row and a 586-expression aggregate too wide for
  * whole-stage codegen; measured 126 s / 1.9e6 ms CPU for the one query.
  * This buffer does 2 hash evaluations and 2 bit-sets per row, O(words)
  * only at merge/finish — per-row cost independent of the filter size,
  * which is what lets 1 M-row files carry the documented 2^20-bit blooms.
  */
case class BloomWordsAgg(words: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
  require(words >= 1, "words >= 1")

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    if (in._1 >= 0) { // negative = null-key sentinel: contributes nothing
      // both positions come from the same when(isNull) wrapper, so they are
      // negative together; fail loudly on a contract-violating call site
      // instead of letting (-1)/64 silently set a wrong bit in word 0
      require(in._2 >= 0,
        s"bloom positions must be negative together (got ${in._1}, ${in._2})")
      buf((in._1 / 64).toInt) |= 1L << (in._1 % 64).toInt
      buf((in._2 / 64).toInt) |= 1L << (in._2 % 64).toInt
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BloomWordsAgg {
  /** `bloomWords(words)(p1, p2)` — array<long> of packed bloom words per
    * group; p1/p2 are the `bloomPositions` columns, −1 for a null key.
    */
  def bloomWords(words: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(BloomWordsAgg(words))
}
