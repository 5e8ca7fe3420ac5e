package graft.validation

/** Input-validation helpers (ref core/validation.py:23-235) — the
  * reference's public guard API, exercised by its own test suite
  * (tests/test_validation.py); InputsSpec mirrors those cases.
  *
  * These guard DRIVER-side inputs (identifiers, options, batch
  * geometry) before any job launches — fail fast with a precise
  * message instead of a mid-job analysis error. Row-scale DATA
  * validation is [[Rules]]/[[Validator]]; these are deliberately
  * plain Scala with zero Spark dependency.
  */
object Inputs {

  /** core/exceptions ValidationError. */
  final case class ValidationException(msg: String) extends IllegalArgumentException(msg)

  private val Ident = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /** validation.py:23 `validate_table_name`. */
  def validateTableName(name: String): Unit = {
    if (name == null || name.isEmpty)
      throw ValidationException("Table name must be a non-empty string")
    if (Ident.findFirstIn(name).isEmpty)
      throw ValidationException(s"Invalid table name '$name'. Must start with letter " +
        "or underscore, contain only alphanumeric and underscores.")
    if (name.length > 255)
      throw ValidationException(s"Table name too long (max 255 characters): $name")
  }

  /** validation.py:46 `validate_column_name`. */
  def validateColumnName(name: String): Unit = {
    if (name == null || name.isEmpty)
      throw ValidationException("Column name must be a non-empty string")
    if (Ident.findFirstIn(name).isEmpty)
      throw ValidationException(s"Invalid column name '$name'. Must start with letter " +
        "or underscore, contain only alphanumeric and underscores.")
    if (name.length > 255)
      throw ValidationException(s"Column name too long (max 255 characters): $name")
  }

  /** validation.py:69 `validate_non_empty_string` — accepts Any because
    * the reference guards untyped config values; returns the trimmed
    * string. */
  def validateNonEmptyString(value: Any, fieldName: String): String = value match {
    case s: String if s.trim.nonEmpty => s.trim
    case other =>
      throw ValidationException(s"$fieldName must be a non-empty string, got: $other")
  }

  /** validation.py:89 `validate_positive_int` (ref semantics: negative
    * is always invalid, zero only with allowZero). */
  def validatePositiveInt(value: Any, fieldName: String, allowZero: Boolean = false): Int =
    value match {
      case i: Int if i > 0 => i
      case i: Int if i == 0 && allowZero => i
      case i: Int if i == 0 =>
        throw ValidationException(s"$fieldName cannot be zero, got: $i")
      case other =>
        throw ValidationException(s"$fieldName must be a positive integer, got: $other")
    }

  /** validation.py:113 `validate_dict_keys` — missing/extra keys are
    * reported sorted, the reference's deterministic message shape. */
  def validateDictKeys(
      data: Map[String, Any],
      requiredKeys: Set[String] = Set.empty,
      allowedKeys: Option[Set[String]] = None): Map[String, Any] = {
    val missing = requiredKeys -- data.keySet
    if (missing.nonEmpty)
      throw ValidationException(s"Missing required keys: ${missing.toSeq.sorted.mkString(", ")}")
    allowedKeys.foreach { allowed =>
      val extra = data.keySet -- allowed
      if (extra.nonEmpty)
        throw ValidationException(s"Unexpected keys: ${extra.toSeq.sorted.mkString(", ")}")
    }
    data
  }

  /** validation.py:148 `validate_in_choices` (case-sensitive). */
  def validateInChoices(value: String, choices: Iterable[String], fieldName: String): String = {
    if (!choices.exists(_ == value))
      throw ValidationException(
        s"Invalid $fieldName: $value. Must be one of: ${choices.mkString(", ")}")
    value
  }

  /** validation.py:175 `validate_batch_size` — 1 to 1,000,000; the cap
    * exists because a batch IS a memory unit downstream. */
  def validateBatchSize(batchSize: Int): Int = {
    if (batchSize < 1)
      throw ValidationException(s"Batch size must be >= 1, got: $batchSize")
    if (batchSize > 1000000)
      throw ValidationException(s"Batch size too large (max 1,000,000), got: $batchSize")
    batchSize
  }

  /** validation.py:200 `validate_list_items` — item failures re-raise
    * with the index context. */
  def validateListItems[A](
      items: Seq[A],
      itemValidator: A => Unit,
      fieldName: String,
      allowEmpty: Boolean = true): Seq[A] = {
    if (!allowEmpty && items.isEmpty)
      throw ValidationException(s"$fieldName cannot be empty")
    items.zipWithIndex.foreach { case (item, idx) =>
      try itemValidator(item)
      catch { case e: ValidationException =>
        throw ValidationException(s"$fieldName[$idx]: ${e.msg}")
      }
    }
    items
  }
}
