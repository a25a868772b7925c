package graft.model

/** Configuration ADTs — the typed equivalent of the reference's pydantic
  * models (`/root/reference/main.py:31-60`) and the frontend's validation
  * rules (`flask_template.html:923-971`, SURVEY.md §2.10 V1-V6).
  *
  * A `PipelineConfig` IS the logical plan intake of the reference's
  * `POST /start_processing` (`main.py:55-60,288`): source table, group
  * key, content column, template, enrichment params, output prefs.
  */
final case class AiConfig(
    service: String,        // "openai" | "anthropic" | "test"
    model: String,
    apiKey: String = "",
    temperature: Double = 0.7,
    maxTokens: Int = 1000,
    rateLimit: Int = 10,    // requests/minute, clamped [1,60] (main.py:26,608)
    retryAttempts: Int = 3  // [1,10] (main.py:23)
) {
  /** V1/V2/V5: the frontend's validation rules (flask_template.html:923-971). */
  def validated: AiConfig = {
    require(AiConfig.services.contains(service), s"unknown service: $service")
    require(temperature >= 0.0 && temperature <= 2.0, s"temperature out of [0,2]: $temperature")
    require(maxTokens >= 1 && maxTokens <= 4000, s"maxTokens out of [1,4000]: $maxTokens")
    require(retryAttempts >= 1 && retryAttempts <= 10, s"retryAttempts out of [1,10]: $retryAttempts")
    if (service == "openai") require(apiKey.startsWith("sk-"), "OpenAI key must start with sk-")
    if (service == "anthropic") require(apiKey.startsWith("sk-ant-"), "Anthropic key must start with sk-ant-")
    copy(rateLimit = math.max(1, math.min(60, rateLimit))) // clamp, main.py:608
  }
}

object AiConfig {
  val services: Set[String] = Set("openai", "anthropic", "test")
  /** Deterministic test config — the engine's data plane is Spark-bound
    * with this (BASELINE.md note). */
  def test(model: String = "gpt-test"): AiConfig =
    AiConfig(service = "test", model = model, rateLimit = 60)
}

/** Column mapping (main.py:44-47): which column is the "main content",
  * which (optional) column groups rows into conversations. */
final case class MappingConfig(mainContent: String, groupBy: Option[String] = None)

/** Prompt template with `{column}` placeholders (main.py:49-52).
  * V3: must contain at least one placeholder (flask_template.html:943-947). */
final case class PromptTemplate(template: String, systemPrompt: Option[String] = None) {
  def validated: PromptTemplate = {
    require("\\{\\w+\\}".r.findFirstIn(template).isDefined,
      "template must contain at least one {column} placeholder")
    this
  }
  def placeholders: Seq[String] =
    "\\{(\\w+)\\}".r.findAllMatchIn(template).map(_.group(1)).toSeq.distinct
}

/** Output prefs (main.py:31-36 OutputConfig + export format). */
final case class OutputConfig(
    format: String = "json", // json | csv | individual | both (main.py:710-914)
    includeInput: Boolean = true,
    includePrompt: Boolean = false,
    includeTimestamp: Boolean = true)

final case class PipelineConfig(
    ai: AiConfig,
    mapping: MappingConfig,
    prompt: PromptTemplate,
    output: OutputConfig = OutputConfig()) {
  /** V4: main-content column must exist in the source schema. */
  def validateAgainst(columns: Seq[String]): PipelineConfig = {
    require(columns.contains(mapping.mainContent),
      s"main content column '${mapping.mainContent}' not in schema ${columns.mkString(",")}")
    this
  }
}
