package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Pagination

class PaginationSpec extends AnyFunSuite {

  test("follows cursors until the source stops returning one") {
    val pages = Map(
      None -> (Seq(1, 2), Some("p2")),
      Some("p2") -> (Seq(3), Some("p3")),
      Some("p3") -> (Seq(4, 5), None))
    var calls = 0
    val out = Pagination.fetchAll[Int]({ c => calls += 1; pages(c) })
    assert(out === Seq(1, 2, 3, 4, 5))
    assert(calls === 3)
  }

  test("maxPages bounds a source that never exhausts") {
    val out = Pagination.fetchAll[Int](c => (Seq(1), Some("again")), maxPages = 7)
    assert(out === Seq.fill(7)(1))
  }
}
