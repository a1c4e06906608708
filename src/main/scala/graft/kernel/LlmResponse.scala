package graft.kernel

/** Executable spec of the reference's defensive LLM-response → text ladder
  * (operator A6, `/root/reference/app/services/llm_service.py:255-317`
  * `_extract_text_from_api_response`). The reference NEVER raises from this
  * function: every malformed-response shape maps to a fixed Chinese string
  * returned AS the result text — those strings are data under the byte
  * contract, so the full taxonomy is modeled and each literal is reachable.
  *
  * The envelope shapes mirror the reference's checks in ladder order:
  *
  *   reference check (llm_service.py)          → model case    → literal
  *   ------------------------------------------------------------------
  *   not isinstance(resp, dict)         (:270) → NotDict       → :272 "API响应格式无效，无法提取文本内容"
  *   "choices" missing/empty            (:276) → NoChoices     → :278 "API响应中没有找到文本内容"
  *   "message" missing                  (:282) → NoMessage     → :284 same literal
  *   "content" missing or falsy         (:288) → NoContent     → :290 same literal
  *   content truthy, str() coercion ""  (:296-302) → NonStringContent("") → :302 "API响应中提取到的文本内容为空"
  *   content truthy, str() non-empty    (:296) → NonStringContent(repr) → repr
  *   content a non-empty string         (:292) → Content(text) → text
  *   any exception inside the ladder    (:312-317) → (extractFailed) → :317 "提取文本内容失败: {e}"
  *
  * Note the reference subtlety preserved here: an EMPTY STRING content hits
  * the falsy-content check first (:288-290) and returns the "没有找到"
  * literal, NOT the :302 "内容为空" literal — :302 is reachable only when
  * content is truthy but str-coerces to empty (a non-string content value).
  */
object LlmResponseModel {

  sealed trait LlmResponse
  /** response is not a JSON object (llm_service.py:270-272) */
  case object NotDict extends LlmResponse
  /** "choices" key missing or empty list (llm_service.py:276-278) */
  case object NoChoices extends LlmResponse
  /** choices[0] has no "message" (llm_service.py:282-284) */
  case object NoMessage extends LlmResponse
  /** message has no "content", or content is falsy — includes "" (llm_service.py:288-290) */
  case object NoContent extends LlmResponse
  /** content is truthy but not a string; repr = its str() coercion (llm_service.py:294-302) */
  final case class NonStringContent(repr: String) extends LlmResponse
  /** content is a string (llm_service.py:292) */
  final case class Content(text: String) extends LlmResponse

  /** The ladder itself — total, never throws (llm_service.py:255-317). */
  def extractText(r: LlmResponse): String = r match {
    case NotDict              => MergeSpec.LlmBadFormat
    case NoChoices            => MergeSpec.LlmNoText
    case NoMessage            => MergeSpec.LlmNoText
    case NoContent            => MergeSpec.LlmNoText
    case Content("")          => MergeSpec.LlmNoText // falsy content, :288 fires first
    case NonStringContent("") => MergeSpec.LlmEmptyText // :302, the only path to it
    case NonStringContent(r)  => r
    case Content(t)           => t
  }

  /** Catch-all literal for an exception inside the ladder
    * (llm_service.py:312-317) — used by the kernel when per-unit
    * extraction itself fails under the llm profile.
    */
  def extractFailed(msg: String): String = s"提取文本内容失败: $msg"

  /** Deterministic envelope for one extraction unit. `faulty = false`
    * (production semantics): a well-formed response whose content is the
    * extracted text — empty extraction therefore lands on the :290 "没有
    * 找到" literal, exactly like an LLM returning "" for a blank page.
    *
    * `faulty = true` is the flaky-upstream simulation profile
    * (Profile("llm", "faulty")): a deterministic ~4% slice of units, keyed
    * by xxhash64(url#unit), degrades to each malformed envelope shape so
    * every A6 literal is reachable AS DATA in a registered query (the
    * in-sandbox stand-in for a real API's failure modes; the reference's
    * HTTP layer is where these shapes originate).
    */
  def envelope(url: String, unit: Int, extracted: String, faulty: Boolean): LlmResponse = {
    if (!faulty) return Content(extracted)
    val h = java.lang.Math.floorMod(
      graft.operators.XxHash.hashUtf8(url + "#" + unit), 101L).toInt
    h match {
      case 0 => NotDict
      case 1 => NoChoices
      case 2 => NoMessage
      case 3 => NoContent
      case 4 => NonStringContent("")
      case _ => Content(extracted)
    }
  }
}
