package graft.enrich

import scala.collection.mutable.ListBuffer

/** S5 — cursor-paginated source loop (reference:
  * src/lib/commands/gatherGames.ts:9-40 follows `nextSortsPageToken` until
  * the API returns no cursor). Pagination is inherently sequential — each
  * page's cursor comes from the previous response — so this runs on the
  * DRIVER (SURVEY §7.4: don't force-parallelize); the resulting snapshot
  * becomes a DataFrame via createDataset and enters the distributed
  * merge-upsert path (`pipeline.Commands.gatherGames`).
  */
object Pagination {

  /** Follow cursors until exhausted; `maxPages` guards a server that keeps
    * returning cursors forever. */
  def fetchAll[T](
      fetch: Option[String] => (Seq[T], Option[String]),
      maxPages: Int = 10000): Seq[T] = {
    val out = ListBuffer.empty[T]
    var cursor: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val (items, next) = fetch(cursor)
      out ++= items
      pages += 1
      next match {
        case Some(c) => cursor = Some(c)
        case None => done = true
      }
    }
    out.toList
  }
}
