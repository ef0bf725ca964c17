package graft.api

import java.time.DayOfWeek

/** Window-alignment helpers (Milan `TimeWindow.offsetWithWeekStartingOn`,
  * `lang/TimeWindow.scala:13`). */
object TimeWindows {

  /**
   * Offset aligning weekly tumbling windows so each window starts at
   * midnight UTC on the given weekday: pass as the `offset` argument with
   * a "7 days" window size. Epoch (1970-01-01) was a Thursday.
   */
  def weeklyOffset(startDay: DayOfWeek): String = {
    val epochDay = DayOfWeek.THURSDAY.getValue // 4
    val days = ((startDay.getValue - epochDay) % 7 + 7) % 7
    s"$days days"
  }

  /** Same alignment in integral units for the exact-arithmetic windows. */
  def weeklyOffsetUnits(startDay: DayOfWeek, unitsPerDay: Long): Long = {
    val days = ((startDay.getValue - DayOfWeek.THURSDAY.getValue) % 7 + 7) % 7
    days * unitsPerDay
  }
}
