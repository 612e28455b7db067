package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The packed-long argmin/argmax convention (e28/e33/e34/e39): a
  * (value, id) election packed into ONE non-negative long so grouped
  * min/max stays an UnsafeRow-mutable HashAggregate with map-side
  * partials — a struct-valued buffer would plan SortAggregate (the
  * Amplify 77 GB-spill shape).
  *
  * The packing is only lexicographic while BOTH fields sit inside
  * their declared bit widths; an out-of-bounds id used to silently
  * corrupt the election (r11 advice). [[packChecked]] closes that:
  * the bounds are enforced IN-PLAN with `assert_true`, so a violating
  * input fails the job loudly with the offending values instead of
  * mis-electing a keeper. Cost is two codegen'd compares per row on
  * the aggregate's input projection — noise next to the hash probe. */
private[graft] object Packing {

  /** `hi << bits | lo`, guarded: raises unless 0 ≤ hi < 2^(63−bits)
    * and 0 ≤ lo < 2^bits. min/max over the result is lexicographic
    * (hi, lo) exactly. */
  def packChecked(hi: Column, bits: Int, lo: Column, ctx: String): Column = {
    require(bits > 0 && bits < 63, s"pack width out of range: $bits")
    val ok = hi >= 0 && hi < lit(1L << (63 - bits)) &&
      lo >= 0 && lo < lit(1L << bits)
    when(assert_true(ok, concat(
        lit(s"$ctx: packed-long bounds exceeded (need hi < 2^${63 - bits}, " +
          s"lo < 2^$bits): hi="),
        hi.cast("string"), lit(" lo="), lo.cast("string"))).isNull,
      shiftleft(hi, bits) + lo)
  }
}
