package graft.ops

/** Typed error vocabulary (ref core/exceptions.py:1-178) — the sealed
  * hierarchy pipeline code and callers catch by FAILURE CLASS instead
  * of string-matching messages: a scheduler retries a
  * [[Errors.ConnectionError]], surfaces a [[Errors.ConfigurationError]]
  * immediately, and pages on a [[Errors.DataQualityError]]. Every type
  * mirrors the reference's class (same name modulo the engine rename,
  * same extra fields), and the rendered message keeps the reference's
  * `__str__` shape: `message | Details: {k=v, ...}` when structured
  * details ride along, bare `message` otherwise.
  *
  * The `require`-based validation messages across the library (pinned
  * to the reference's shapes in InputsSpec) intentionally stay
  * `IllegalArgumentException` — those are caller bugs, not pipeline
  * failure classes; this vocabulary is for the operational seams.
  * [[Retry.RetryExhausted]] aliases [[Errors.RetryExhaustedError]], so
  * the backoff path participates in the hierarchy.
  */
object Errors {

  private def render(message: String, details: Map[String, String]): String =
    if (details.isEmpty) message
    else s"$message | Details: ${details.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")}"

  /** exceptions.py:6 AutomicETLError: message + structured details. */
  sealed abstract class GraftError(
      val message: String,
      val details: Map[String, String],
      cause: Throwable)
    extends RuntimeException(render(message, details), cause)

  /** exceptions.py:20 ConfigurationError. */
  final case class ConfigurationError(
      override val message: String,
      override val details: Map[String, String] = Map.empty)
    extends GraftError(message, details, null)

  /** exceptions.py:26 ConnectionError. */
  final case class ConnectionError(
      override val message: String,
      connectorType: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:39 ExtractionError. */
  final case class ExtractionError(
      override val message: String,
      source: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:52 TransformationError. */
  final case class TransformationError(
      override val message: String,
      transformation: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:65 LoadError. */
  final case class LoadError(
      override val message: String,
      target: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:78 StorageError. */
  final case class StorageError(
      override val message: String,
      provider: Option[String] = None,
      operation: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:93 IcebergError — the reference's versioned-table
    * failure class; here it covers [[graft.sources.VersionedTable]]
    * operations (same fields: table + operation). */
  final case class VersionedTableError(
      override val message: String,
      table: Option[String] = None,
      operation: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:108 LLMError. */
  final case class LlmError(
      override val message: String,
      provider: Option[String] = None,
      model: Option[String] = None,
      override val details: Map[String, String] = Map.empty,
      cause: Throwable = null)
    extends GraftError(message, details, cause)

  /** exceptions.py:123 DataQualityError. */
  final case class DataQualityError(
      override val message: String,
      checkName: Option[String] = None,
      failedRecords: Option[Long] = None,
      override val details: Map[String, String] = Map.empty)
    extends GraftError(message, details, null)

  /** exceptions.py:138 SchemaError. */
  final case class SchemaError(
      override val message: String,
      expectedSchema: Option[String] = None,
      actualSchema: Option[String] = None,
      override val details: Map[String, String] = Map.empty)
    extends GraftError(message, details, null)

  /** exceptions.py:153 WatermarkError. */
  final case class WatermarkError(
      override val message: String,
      watermarkColumn: Option[String] = None,
      override val details: Map[String, String] = Map.empty)
    extends GraftError(message, details, null)

  /** exceptions.py:164 RetryExhaustedError — thrown by
    * [[Retry.withBackoff]]; the message shape ("retry exhausted after
    * N attempts: <last>") predates the hierarchy and is pinned in
    * RetrySpec. */
  final case class RetryExhaustedError(attempts: Int, lastError: Throwable)
    extends GraftError(
      s"retry exhausted after $attempts attempts: ${lastError.getMessage}",
      Map.empty, lastError)
}
