package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateParse

/** P5 goldens — the exact shapes the reference tests pin
  * (`tests/test_csvs_to_sqlite.py:584-604, 739-766`; FIXTURES.md §3/4/6).
  */
class DateParseSpec extends AnyFunSuite {

  test("ordinal day: '3rd May 2017' -> 2017-05-03") {
    assert(DateParse.parseDateIso("3rd May 2017") === "2017-05-03")
  }

  test("US slash date: '04/30/2005' -> 2005-04-30") {
    assert(DateParse.parseDateIso("04/30/2005") === "2005-04-30")
  }

  test("meridiem prefix: '10pm on April 4 1938' -> 1938-04-04T22:00:00") {
    assert(DateParse.parseDatetimeIso("10pm on April 4 1938") === "1938-04-04T22:00:00")
  }

  test("time prefix: '5:45 10 December 2009' -> 2009-12-10T05:45:00") {
    assert(DateParse.parseDatetimeIso("5:45 10 December 2009") === "2009-12-10T05:45:00")
  }

  test("custom format list wins: %y/%d/%m on '03/02/01' -> 2003-01-02") {
    assert(DateParse.parseDateIso("03/02/01", Seq("%y/%d/%m")) === "2003-01-02")
  }

  test("literal words in format: '%d of %B in the year %Y'") {
    val fmt = Seq("%d of %B in the year %Y")
    assert(DateParse.parseDateIso("6 of December in the year 2002", fmt) === "2002-12-06")
    assert(DateParse.parseDateIso("19 of June in the year 1997", fmt) === "1997-06-19")
    assert(DateParse.parseDateIso("9 of June in the year 1996", fmt) === "1996-06-09")
  }

  test("date variant truncates datetime input to the date") {
    assert(DateParse.parseDateIso("10pm on April 4 1938") === "1938-04-04")
  }

  test("NULL/blank passthrough; unparseable input raises (reference error propagation)") {
    assert(DateParse.parseDateIso(null) === null)
    assert(DateParse.parseDateIso("  ") === null)
    intercept[IllegalArgumentException] { DateParse.parseDateIso("not a date at all") }
  }

  test("iso and common shapes parse via fallback chain") {
    assert(DateParse.parseDateIso("2017-05-03") === "2017-05-03")
    assert(DateParse.parseDatetimeIso("2017-05-03T10:20:30") === "2017-05-03T10:20:30")
    assert(DateParse.parseDateIso("May 3, 2017") === "2017-05-03")
  }
}
