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

  private val str: Check = { case JString(_) => true; case _ => false }

  /** The AST interpreter — semantics unchanged from the hand-rolled
    * checks this replaced (round 10 moved the shapes into [[ApiSchema]]
    * so the OpenAPI doc derives from the same table). */
  private[api] def check(s: ApiSchema.S): Check = s match {
    case ApiSchema.SNum => {
      case _: JLong | _: JInt | _: JDouble | _: JDecimal => true
      case _ => false
    }
    case ApiSchema.SStr => str
    case ApiSchema.SBool => { case JBool(_) => true; case _ => false }
    case ApiSchema.SNullable(inner) =>
      v => v == JNull || check(inner)(v)
    case ApiSchema.SEnum(vals) =>
      { case JString(x) => vals.contains(x); case _ => false }
    case ApiSchema.SArr(item) =>
      { case JArray(items) => items.forall(check(item)); case _ => false }
    case ApiSchema.SObj(required, optional) => {
      case JObject(fields) =>
        val m = fields.toMap
        required.forall { case (k, c) => m.get(k).exists(check(c)) } &&
          optional.forall { case (k, c) => m.get(k).forall(check(c)) }
      case _ => false
    }
    case ApiSchema.SAny => _ => true
  }

  /** Endpoint path → data schema check, from [[ApiSchema.endpoints]]. */
  private[api] def dataSchemaFor(method: String, path: String): Option[Check] =
    ApiSchema.endpointFor(method, path).map(e => check(e.data))

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
