package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Conversations
import graft.llm.Conversations.{Message, QueryCache, Store}

/** Multi-turn conversation state + query cache (ref
  * llm/sql_assistant.py:57-98,278-296,591-604,688-703). */
class ConversationsSpec extends AnyFunSuite {

  test("store: create with generated id, retrieve by id, clear, history") {
    var n = 0
    val store = new Store(idGen = () => { n += 1; s"conv-$n" })
    val c1 = store.getOrCreate("u1", "co1")
    assert(c1.conversationId == "conv-1")
    // same id → same context, not a new one
    assert(store.getOrCreate("u1", "co1", Some("conv-1")) eq c1)
    // unknown id → created under that id (reference falls through to create)
    val c2 = store.getOrCreate("u1", "co1", Some("external-id"))
    assert(c2.conversationId == "external-id")

    c1.addMessage(Message("user", "show orders", 1000L))
    assert(store.history("conv-1").get.map(_.content) == Seq("show orders"))
    assert(store.clear("conv-1") && !store.clear("conv-1"))
    assert(store.history("conv-1").isEmpty)
  }

  test("context tracks last SQL, referenced tables, and renders the refinement context") {
    val ctx = new Conversations.Context("c", "u", "co")
    ctx.addMessage(Message("user", "top customers", 1L))
    ctx.addMessage(Message("assistant", "here you go", 2L,
      sqlGenerated = Some("SELECT 1"), resultSummary = Some("1 row")))
    ctx.addMessage(Message("user", "now by nation", 3L))
    ctx.addMessage(Message("assistant", "sure", 4L,
      sqlGenerated = Some("SELECT 2")))
    ctx.referenceTables(Seq("customer", "nation", "customer"))

    assert(ctx.lastSql.contains("SELECT 2"))
    assert(ctx.referencedTables == Seq("customer", "nation")) // deduped, ordered
    assert(ctx.updatedAtMs == 4L)
    assert(ctx.recentContext(2) == Seq(("user", "now by nation"), ("assistant", "sure")))
    assert(ctx.toContextString ==
      "Previous SQL: SELECT 1\nResult summary: 1 row\nPrevious SQL: SELECT 2")
  }

  test("cache key normalizes query case/whitespace and table order") {
    val k = Conversations.cacheKey("  SELECT * FROM t ", "co", Seq("b", "a"))
    assert(k == Conversations.cacheKey("select * from t", "co", Seq("a", "b")))
    assert(k != Conversations.cacheKey("select * from t", "other_co", Seq("a", "b")))
    assert(k != Conversations.cacheKey("select * from t", "co", Seq("a")))
    assert(k.matches("[0-9a-f]{32}")) // md5 hex, reference-compatible
  }

  test("query cache: compute once, then hit") {
    val cache = new QueryCache[String]
    var computes = 0
    def run() = cache.getOrCompute("q", "co", Seq("t")) { computes += 1; "result" }
    assert(run() == ("result", false))
    assert(run() == ("result", true))
    assert(computes == 1 && cache.size == 1)
    cache.clear()
    assert(run() == ("result", false) && computes == 2)
  }
}
