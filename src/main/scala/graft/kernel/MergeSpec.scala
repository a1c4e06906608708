package graft.kernel

/** Executable spec of the reference's ordered page merge + summary footer
  * (operator A8) — the byte-identity crux of the whole engine.
  *
  * Format (reference /root/reference/app/utils/pdf_utils.py:140-172,
  * duplicated verbatim at app/services/llm_service.py:409-448):
  *   - page i (0-based), success: "--- 第{i+1}页 ---\n{page_text}"
  *     (pdf_utils.py:153)
  *   - page i, failure:          "--- 第{i+1}页（处理失败）---"
  *     (full-width parens, pdf_utils.py:158)
  *   - all parts joined with "\n\n" (pdf_utils.py:161)
  *   - footer, some failures (pdf_utils.py:165):
  *     "\n\n--- 处理摘要 ---\n总页数: {N}\n成功页数: {N-F}\n失败页数: {F}\n失败页码: {p1, p2}"
  *     (failed page numbers 1-based, joined with ", ")
  *   - footer, no failures (pdf_utils.py:167):
  *     "\n\n--- 处理摘要 ---\n总页数: {N}\n所有页面处理成功"
  *
  * This single function is shared by the extraction kernel and the golden
  * fixture generator so the byte contract has exactly one definition.
  */
object MergeSpec {

  /** Merge per-page outcomes. Left = failure (error message ignored in the
    * merged text, exactly as the reference drops the exception message at
    * pdf_utils.py:158); Right = page text.
    * Returns (merged text, failed page count).
    */
  def mergePages(pages: Seq[Either[String, String]]): (String, Int) = {
    val (text, nFailed, _) = mergePagesWithSpans(pages)
    (text, nFailed)
  }

  /** Merge + character spans: one span per SUCCESSFUL page covering its
    * text content (header excluded), kind "page". The merged string is
    * byte-identical to `mergePages` — spans are derived bookkeeping, not
    * a format change.
    */
  def mergePagesWithSpans(
      pages: Seq[Either[String, String]]): (String, Int, Seq[graft.model.Span]) = {
    val sb = new java.lang.StringBuilder(256)
    val spans = Seq.newBuilder[graft.model.Span]
    var failedCount = 0
    val failedNums = Seq.newBuilder[Int]
    pages.zipWithIndex.foreach { case (page, i) =>
      if (i > 0) sb.append("\n\n")
      page match {
        case Right(t) =>
          sb.append("--- 第").append(i + 1).append("页 ---\n")
          val start = sb.length().toLong
          sb.append(t)
          spans += graft.model.Span(start, sb.length().toLong, "page")
        case Left(_) =>
          failedCount += 1
          failedNums += (i + 1)
          sb.append("--- 第").append(i + 1).append("页（处理失败）---")
      }
    }
    if (failedCount > 0)
      sb.append("\n\n--- 处理摘要 ---\n总页数: ").append(pages.length)
        .append("\n成功页数: ").append(pages.length - failedCount)
        .append("\n失败页数: ").append(failedCount)
        .append("\n失败页码: ").append(failedNums.result().mkString(", "))
    else
      sb.append("\n\n--- 处理摘要 ---\n总页数: ").append(pages.length)
        .append("\n所有页面处理成功")
    (sb.toString, failedCount, spans.result())
  }

  // ---- Error-string literals that are *data* (must match the reference
  //      byte-for-byte; SURVEY.md §7.4 item 2) ----

  /** Unsupported payload type (ocr_service.py:280: "不支持的文件类型: {ext}").
    * The reference formats the file extension; we format the sniffed-magic
    * label (documented divergence: content sniffing replaces ext dispatch).
    */
  def unsupportedType(extLabel: String): String = s"不支持的文件类型: $extLabel"

  /** Empty payload (routes.py:93-95, code EMPTY_FILE). */
  val EmptyFile: String = "文件内容为空"

  /** Payload over the 10 MB cap (routes.py:63-68, code FILE_TOO_LARGE;
    * cap from config.py:15).
    */
  val FileTooLarge: String = "文件大小超过限制"

  /** Max payload bytes (config.py:15 MAX_CONTENT_LENGTH). */
  val MaxContentLength: Int = 10 * 1024 * 1024

  /** Image resolution cap (API.md:473: "图片分辨率: 最大 4096x4096").
    * The reference DOCUMENTS the limit but ships no enforcement code or
    * error literal, so this string is ours, styled after its sibling
    * validation literals (文件大小超过限制 pattern). Checked against
    * header-parsed dimensions (kernel.ImageHeader) in the kernel's
    * validation ladder, right after the size cap.
    */
  val MaxImageDim: Int = 4096
  def resolutionTooLarge(w: Int, h: Int): String = s"图片分辨率超过限制: ${w}x$h"

  /** Engine whitelist (the upload gate's ocr_type check, routes.py:36-39):
    * an invalid engine is rejected AT SUBMISSION with the reference's
    * literal, not mapped to per-row failures. "graft-ocr" is this
    * engine's own addition (in-sandbox glyph OCR, kernel.GlyphOcr) —
    * the reference's three stay byte-compatible.
    */
  val ValidEngines: Set[String] = Set("standard", "llm", "ollama", "graft-ocr")

  /** routes.py:39: "不支持的OCR类型: {ocr_type}", code INVALID_OCR_TYPE. */
  def invalidOcrType(t: String): String = s"不支持的OCR类型: $t"

  // ---- llm-profile literals (A6, llm_service.py:255-317): defensive
  //      response handling returns these fixed strings AS the result text,
  //      never an exception. ----
  val LlmNoText: String = "API响应中没有找到文本内容"
  val LlmEmptyText: String = "API响应中提取到的文本内容为空"
  val LlmBadFormat: String = "API响应格式无效，无法提取文本内容"
}
