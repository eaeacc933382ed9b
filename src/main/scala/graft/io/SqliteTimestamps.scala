package graft.io

import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Timestamp text in a reference-produced jobs.db comes in TWO formats
  * (reference: src/lib/jobManager.ts):
  *
  *   - `created_at` — SQLite's `datetime('now')` column default,
  *     `"YYYY-MM-DD HH:MM:SS"` in UTC (jobManager.ts:51);
  *   - `started_at` / `completed_at` — written from JS via
  *     `Date.toISOString()`, `"YYYY-MM-DDTHH:MM:SS.sssZ"`
  *     (jobManager.ts:168,173).
  *
  * Both are UTC instants; only the rendering differs. Accept both here so
  * seeding from a real jobs.db (mixed formats in one row) never throws.
  */
object SqliteTimestamps {
  def parse(s: String): Instant =
    if (s.endsWith("Z")) Instant.parse(s)
    else LocalDateTime.parse(s.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
}
