package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.validation.Inputs
import graft.validation.Inputs.ValidationException

/** Input-validation guards, mirroring the reference's OWN test suite
  * case for case (ref tests/test_validation.py — the behavioral
  * contract its callers rely on). Pure driver-side, no Spark. */
class InputsSpec extends AnyFunSuite {

  private def rejects(f: => Any): ValidationException = intercept[ValidationException](f)

  test("table names: valid forms pass; empty/null/bad-start/bad-chars/too-long fail") {
    Inputs.validateTableName("users")
    Inputs.validateTableName("user_data")
    Inputs.validateTableName("_temp")
    Inputs.validateTableName("Table123")
    rejects(Inputs.validateTableName(""))
    rejects(Inputs.validateTableName(null))
    rejects(Inputs.validateTableName("123table"))
    rejects(Inputs.validateTableName("user-data"))
    rejects(Inputs.validateTableName("user.data"))
    rejects(Inputs.validateTableName("user data"))
    rejects(Inputs.validateTableName("a" * 256))
    Inputs.validateTableName("a" * 255) // boundary passes
  }

  test("column names: same identifier contract") {
    Inputs.validateColumnName("user_id")
    Inputs.validateColumnName("_id")
    Inputs.validateColumnName("Column1")
    rejects(Inputs.validateColumnName("123column"))
    rejects(Inputs.validateColumnName("column-name"))
  }

  test("non-empty strings trim and return; whitespace/empty/non-string fail") {
    assert(Inputs.validateNonEmptyString("test", "field") == "test")
    assert(Inputs.validateNonEmptyString("  padded  ", "field") == "padded")
    rejects(Inputs.validateNonEmptyString("   ", "field"))
    rejects(Inputs.validateNonEmptyString("", "field"))
    assert(rejects(Inputs.validateNonEmptyString(123, "field")).msg.contains("field"))
  }

  test("positive ints: zero gated by allowZero, negatives and non-ints always fail") {
    assert(Inputs.validatePositiveInt(10, "count") == 10)
    rejects(Inputs.validatePositiveInt(0, "count"))
    assert(Inputs.validatePositiveInt(0, "count", allowZero = true) == 0)
    rejects(Inputs.validatePositiveInt(-5, "count"))
    rejects(Inputs.validatePositiveInt("10", "count"))
  }

  test("dict keys: required present, allowed constrains, messages sorted") {
    val d = Map[String, Any]("a" -> 1, "b" -> 2)
    assert(Inputs.validateDictKeys(d, requiredKeys = Set("a")) eq d)
    val missing = rejects(Inputs.validateDictKeys(d, requiredKeys = Set("z", "c")))
    assert(missing.msg == "Missing required keys: c, z")
    val extra = rejects(Inputs.validateDictKeys(d, allowedKeys = Some(Set("a"))))
    assert(extra.msg == "Unexpected keys: b")
    Inputs.validateDictKeys(d, requiredKeys = Set("a", "b"), allowedKeys = Some(Set("a", "b")))
  }

  test("choices are case-sensitive") {
    assert(Inputs.validateInChoices("gold", Seq("bronze", "silver", "gold"), "layer") == "gold")
    rejects(Inputs.validateInChoices("Gold", Seq("bronze", "silver", "gold"), "layer"))
    val e = rejects(Inputs.validateInChoices("x", Seq("a", "b"), "mode"))
    assert(e.msg == "Invalid mode: x. Must be one of: a, b")
  }

  test("batch size: 1..1,000,000") {
    assert(Inputs.validateBatchSize(1) == 1)
    assert(Inputs.validateBatchSize(1000000) == 1000000)
    rejects(Inputs.validateBatchSize(0))
    rejects(Inputs.validateBatchSize(-1))
    rejects(Inputs.validateBatchSize(1000001))
  }

  test("list items: per-item validation with index context; allowEmpty gate") {
    val ok = Seq("users", "orders")
    assert(Inputs.validateListItems(ok, Inputs.validateTableName, "tables") eq ok)
    val e = rejects(Inputs.validateListItems(
      Seq("users", "bad-name"), Inputs.validateTableName, "tables"))
    assert(e.msg.startsWith("tables[1]: Invalid table name"))
    rejects(Inputs.validateListItems(Seq.empty[String], Inputs.validateTableName,
      "tables", allowEmpty = false))
    assert(Inputs.validateListItems(Seq.empty[String], Inputs.validateTableName, "tables").isEmpty)
  }
}
