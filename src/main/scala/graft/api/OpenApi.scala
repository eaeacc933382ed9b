package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenAPI 3.0 document generator — the S16 counterpart (reference:
  * scripts/generate-swagger.ts:65-111, the last reference file with no
  * engine-side analogue). The reference scans its built endpoint modules
  * and emits `swagger.json` with, per route: summary, tags, a 200
  * response whose example is mechanically derived from the JSON schema
  * (string → "string", number → 0, boolean → true), and a global error
  * response as the `default`. This generator derives the same document
  * from [[ApiSchema.endpoints]] — the exact table the live
  * [[EnvelopeValidator]] checks against, so doc and validation cannot
  * drift (ApiServerSpec proves every documented example envelope passes
  * the live validator).
  *
  * Documented divergence: for enum schemas the reference's
  * `exampleFromJsonSchema` falls back to the plain string example
  * ("string", generate-swagger.ts:37); this emits the FIRST enum member
  * instead, so the examples validate against the schemas they document.
  *
  * `runMain graft.api.OpenApi [out.json]` is the script counterpart
  * (default `swagger.json`).
  */
object OpenApi {

  import ApiSchema._

  /** JSON Schema of an AST node (the zod-to-json-schema step). */
  private[api] def jsonSchema(s: S): JValue = s match {
    case SNum => JObject("type" -> JString("number"))
    case SStr => JObject("type" -> JString("string"))
    case SBool => JObject("type" -> JString("boolean"))
    case SEnum(vals) => JObject("type" -> JString("string"),
      "enum" -> JArray(vals.map(JString(_)).toList))
    case SNullable(inner) =>
      JObject("anyOf" -> JArray(List(jsonSchema(inner),
        JObject("type" -> JString("null")))))
    case SArr(item) => JObject("type" -> JString("array"),
      "items" -> jsonSchema(item))
    case SObj(required, optional) =>
      JObject(
        "type" -> JString("object"),
        "properties" -> JObject(
          (required ++ optional).map { case (k, v) => k -> jsonSchema(v) }.toList),
        "required" -> JArray(required.map(r => JString(r._1)).toList))
    case SAny => JObject()
  }

  /** Mechanical example (generate-swagger.ts `exampleFromJsonSchema`):
    * string → "string", number → 0, boolean → true, nullable → null,
    * object/array recurse; enums diverge as documented above. */
  def example(s: S): JValue = s match {
    case SNum => JInt(0)
    case SStr => JString("string")
    case SBool => JBool(true)
    case SEnum(vals) => JString(vals.head)
    case SNullable(_) => JNull
    case SArr(item) => JArray(List(example(item)))
    case SObj(required, optional) =>
      JObject((required ++ optional).map { case (k, v) => k -> example(v) }.toList)
    case SAny => JNull
  }

  /** The success envelope schema of one endpoint: the reference wraps
    * every payload in `{success: true, data}` (apiResponseSchema.ts). */
  private def envelopeSchema(data: S): JValue =
    jsonSchema(SObj(Seq("success" -> SBool, "data" -> data)))

  def envelopeExample(data: S): JValue =
    JObject("success" -> JBool(true), "data" -> example(data))

  /** `default` response — transcribed from generate-swagger.ts:48-63. */
  private val globalErrorResponse: JValue = JObject(
    "description" -> JString("Global error response"),
    "content" -> JObject("application/json" -> JObject(
      "example" -> JObject("success" -> JBool(false),
        "message" -> JString("Error message")),
      "schema" -> jsonSchema(SObj(Seq(
        "success" -> SBool, "message" -> SStr))))))

  def document: JValue = JObject(
    "openapi" -> JString("3.0.0"),
    "paths" -> JObject(
      endpoints.groupBy(_.path).toSeq.sortBy(_._1).map { case (path, eps) =>
        path -> JObject(eps.sortBy(_.method).map { e =>
          e.method -> JObject(
            "summary" -> JString(e.summary),
            "parameters" -> JArray(Nil),
            "tags" -> JArray(List(JString(e.tag))),
            "responses" -> JObject(
              "200" -> JObject(
                "description" -> JString("Successful response"),
                "content" -> JObject("application/json" -> JObject(
                  "schema" -> envelopeSchema(e.data),
                  "example" -> envelopeExample(e.data)))),
              "default" -> globalErrorResponse))
        }.toList)
      }.toList))

  /** The rendered doc (2-space pretty print, the reference's
    * `JSON.stringify(swagger, null, 2)`). */
  def render: String = JsonMethods.pretty(JsonMethods.render(document))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("swagger.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      render.getBytes("UTF-8"))
    println(s"Swagger docs generated to $out")
  }
}
