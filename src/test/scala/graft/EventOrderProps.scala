package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.Row
import graft.streaming.EventOrder

/**
 * Property tests for the typed event-order comparison used by the
 * streaming stateful scans/joins — specifically covering negative and
 * extreme values, where the former zero-padded string encoding reversed
 * the sort ("-…05" < "-…10") and Long.MinValue broke its fixed width.
 */
object EventOrderProps extends Properties("graft.eventOrder") {

  private val anyLong: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(Long.MinValue, Long.MaxValue, -1L, 0L, 1L))

  property("long comparison matches numeric order incl. negatives and extremes") =
    forAll(anyLong, anyLong) { (a, b) =>
      Integer.signum(EventOrder.compareValues(a, b)) ==
        Integer.signum(java.lang.Long.compare(a, b))
    }

  property("int comparison matches numeric order") =
    forAll(Gen.choose(Int.MinValue, Int.MaxValue), Gen.choose(Int.MinValue, Int.MaxValue)) {
      (a, b) =>
        Integer.signum(EventOrder.compareValues(a, b)) == Integer.signum(Integer.compare(a, b))
    }

  property("double comparison matches numeric order (no lexicographic 10.5 < 9.5)") =
    forAll(Gen.choose(-1e12, 1e12), Gen.choose(-1e12, 1e12)) { (a, b) =>
      Integer.signum(EventOrder.compareValues(a, b)) ==
        Integer.signum(java.lang.Double.compare(a, b))
    }

  property("mixed numeric widths compare by value") =
    forAll(Gen.choose(Int.MinValue, Int.MaxValue), anyLong) { (a, b) =>
      Integer.signum(EventOrder.compareValues(a, b)) ==
        Integer.signum(java.lang.Long.compare(a.toLong, b))
    }

  property("row ordering sorts rows like sortBy on the typed tuples") =
    forAll(Gen.listOf(Gen.zip(anyLong, Gen.choose(-1000, 1000)))) { pairs =>
      val rows = pairs.map { case (l, i) => Row(l, i) }
      val sorted = rows.sorted(EventOrder.rowOrdering(Seq(0, 1)))
      val expect = pairs.sorted.map { case (l, i) => Row(l, i) }
      sorted == expect
    }

  property("seq comparison is lexicographic with shorter prefix first") =
    forAll(Gen.listOf(anyLong), Gen.listOf(anyLong)) { (a, b) =>
      val as: Seq[Any] = a
      val bs: Seq[Any] = b
      val expect = Integer.signum(
        Ordering.Implicits.seqOrdering[Seq, Long].compare(a, b))
      Integer.signum(EventOrder.compareSeqs(as, bs)) == expect
    }
}
