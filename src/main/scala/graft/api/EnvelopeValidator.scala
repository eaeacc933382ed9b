package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Response-schema validation at the API boundary, mirroring the
  * reference's zod safeParse of every handler result before sending
  * (reference: src/api.ts:33-41): a payload that does not match its
  * endpoint's response schema is replaced by a 500
  * `{success:false, message:"Invalid response format"}`.
  *
  * Schemas are structural checks over the rendered JSON, one per endpoint
  * family, transcribed from the per-file zod `responseSchema` declarations
  * under `src/endpoints`. Like `apiResponse` (apiResponseSchema.ts:15-30),
  * every endpoint also accepts the failure envelope
  * `{success:false, message}` — handlers return failures in-band.
  *
  * Documented divergence: the reference responds with `parseResult.data`
  * (api.ts:34-36), so zod STRIPS keys not in the schema before sending;
  * this validator passes the handler's original body through unchanged on
  * success. Observable only for a payload carrying extra keys — our
  * handlers construct exact payloads, so no live endpoint differs — and
  * kept this way so validation stays a read-only check rather than a
  * rewrite of the rendered bytes.
  */
object EnvelopeValidator {

  type Check = JValue => Boolean

  private val num: Check = {
    case _: JLong | _: JInt | _: JDouble | _: JDecimal => true
    case _ => false
  }
  private val str: Check = { case JString(_) => true; case _ => false }
  private def nullable(c: Check): Check = v => v == JNull || c(v)
  private def oneOf(vals: String*): Check =
    { case JString(s) => vals.contains(s); case _ => false }
  private def arrayOf(c: Check): Check =
    { case JArray(items) => items.forall(c); case _ => false }
  private val any: Check = _ => true

  /** z.object: required fields must be present and match; optional fields
    * must match when present; unknown keys pass (zod strips, not rejects). */
  private def obj(required: Seq[(String, Check)], optional: Seq[(String, Check)] = Nil): Check = {
    case JObject(fields) =>
      val m = fields.toMap
      required.forall { case (k, c) => m.get(k).exists(c) } &&
        optional.forall { case (k, c) => m.get(k).forall(c) }
    case _ => false
  }

  private val statusEnum = oneOf("pending", "running", "completed", "failed")

  /** The 5-column game row shared by /games and the search endpoints
    * (games.get.ts:6-14). */
  private def gameRow(extra: (String, Check)*): Check = obj(
    Seq("universeId" -> num, "rootPlaceId" -> num, "name" -> str,
      "description" -> nullable(str), "gameplayDescription" -> nullable(str))
      ++ extra)

  /** jobSchema (jobsList.get.ts:6-22 / job.get.ts:5-21). */
  private val job: Check = obj(
    required = Seq("id" -> str, "command" -> str, "status" -> statusEnum,
      "created_at" -> str),
    optional = Seq(
      "progress" -> obj(Seq("current" -> num, "total" -> num),
        Seq("message" -> str)),
      "result" -> any,
      "error" -> nullable(str),
      "started_at" -> str,
      "completed_at" -> str))

  private val jobStats: Check = obj(Seq(
    "pending" -> num, "running" -> num, "completed" -> num,
    "failed" -> num, "total" -> num))

  private val postResult: Check =
    obj(Seq("jobId" -> str, "message" -> str, "status" -> statusEnum))

  /** Endpoint path → data schema (the zod `responseSchema` per file). */
  private[api] def dataSchemaFor(method: String, path: String): Option[Check] =
    (method, path) match {
      case ("GET", "/games") => Some(arrayOf(gameRow()))
      case ("GET", "/search") => Some(arrayOf(gameRow(
        "matchType" -> oneOf("title", "description", "gameplayDescription"),
        "relevanceScore" -> num)))
      case ("GET", "/vector-search") => Some(arrayOf(gameRow("similarity" -> num)))
      case ("GET", p) if p.startsWith("/similar-search/") =>
        Some(arrayOf(gameRow("similarity" -> num)))
      case ("GET", "/stats") => Some(obj(Seq(
        "totalGames" -> num, "gamesLackingIcons" -> num,
        "gamesLackingThumbnails" -> num, "gamesLackingDescriptions" -> num,
        "gamesLackingGameplayDescriptions" -> num,
        "gamesLackingEmbeddings" -> num)))
      case ("GET", "/jobs") => Some(obj(Seq(
        "jobs" -> arrayOf(job), "stats" -> jobStats)))
      case ("GET", p) if p.startsWith("/jobs/") => Some(job)
      case ("POST", _) => Some(postResult)
      case _ => None
    }

  /** safeParse of a rendered envelope: true iff the payload matches the
    * endpoint's response schema (or is a well-formed failure envelope).
    * Unroutable paths validate trivially — they 404 before this runs. */
  def valid(method: String, path: String, body: String): Boolean = {
    val parsed =
      try JsonMethods.parse(body)
      catch { case _: Throwable => return false }
    parsed match {
      case JObject(fields) =>
        val m = fields.toMap
        m.get("success") match {
          case Some(JBool(false)) => m.get("message").exists(str)
          case Some(JBool(true)) =>
            m.contains("data") &&
              dataSchemaFor(method, path).forall(c => c(m("data")))
          case _ => false
        }
      case _ => false
    }
  }
}
