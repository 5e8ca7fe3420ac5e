package graft.llm

import java.security.MessageDigest

/** Multi-turn conversation state + query cache — the deterministic
  * session half of the reference's SQL assistant
  * (ref llm/sql_assistant.py:57 `ConversationMessage`, :60
  * `ConversationContext`, :278 `get_or_create_conversation`, :591
  * `_get_cache_key`, :688 `clear_conversation`).
  *
  * Everything here is driver-side session state for an interactive
  * surface — deliberately plain Scala. Ids and time are injected
  * ([[Store]] takes an id generator; messages carry caller-supplied
  * timestamps) so the whole surface is deterministic under test, the
  * same stance as [[graft.orchestration.Schedule]] and
  * [[graft.services.Events]]. The model-facing rendering
  * ([[Context.toContextString]]) is exactly what the reference feeds
  * its refinement prompt — generation itself stays behind [[Nl2Sql]].
  */
object Conversations {

  /** sql_assistant.py:57 ConversationMessage. */
  final case class Message(
      role: String,
      content: String,
      timestampMs: Long,
      sqlGenerated: Option[String] = None,
      resultSummary: Option[String] = None)

  /** sql_assistant.py:60 ConversationContext — message history plus
    * the running referenced-table set and last-SQL shortcut the
    * refinement flow reads. */
  final class Context(
      val conversationId: String,
      val userId: String,
      val companyId: String) {

    private val msgs = scala.collection.mutable.Buffer.empty[Message]
    private val tables = scala.collection.mutable.LinkedHashSet.empty[String]
    private var _lastSql: Option[String] = None
    private var _updatedAtMs: Long = 0L

    def addMessage(m: Message): Unit = {
      msgs += m
      m.sqlGenerated.foreach(_ => _lastSql = m.sqlGenerated)
      _updatedAtMs = math.max(_updatedAtMs, m.timestampMs)
    }

    def referenceTables(names: Iterable[String]): Unit = tables ++= names

    def messages: Seq[Message] = msgs.toSeq
    def referencedTables: Seq[String] = tables.toSeq
    def lastSql: Option[String] = _lastSql
    def updatedAtMs: Long = _updatedAtMs

    /** sql_assistant.py:80 `get_recent_context` — last `max` messages
      * as (role, content). */
    def recentContext(max: Int = 10): Seq[(String, String)] =
      msgs.takeRight(max).toSeq.map(m => (m.role, m.content))

    /** sql_assistant.py:88 `to_context_string` — the refinement-prompt
      * rendering: previous SQL + result summaries of the last 5
      * messages. */
    def toContextString: String =
      msgs.takeRight(5).toSeq.flatMap { m =>
        m.sqlGenerated.map(s => s"Previous SQL: $s").toSeq ++
          m.resultSummary.map(s => s"Result summary: $s").toSeq
      }.mkString("\n")
  }

  /** sql_assistant.py:278 get_or_create + :688 clear + :695 history,
    * with the id source injected. */
  final class Store(idGen: () => String = () => java.util.UUID.randomUUID().toString) {
    private val convs = scala.collection.mutable.LinkedHashMap.empty[String, Context]

    def getOrCreate(userId: String, companyId: String, conversationId: Option[String] = None): Context =
      conversationId.flatMap(convs.get).getOrElse {
        val ctx = new Context(conversationId.getOrElse(idGen()), userId, companyId)
        convs(ctx.conversationId) = ctx
        ctx
      }

    def get(conversationId: String): Option[Context] = convs.get(conversationId)

    def clear(conversationId: String): Boolean = convs.remove(conversationId).isDefined

    def history(conversationId: String): Option[Seq[Message]] =
      convs.get(conversationId).map(_.messages)
  }

  /** sql_assistant.py:591 `_get_cache_key` — md5 over the normalized
    * query, company, and sorted table list; byte-compatible with the
    * reference so cache entries survive a reimplementation swap. */
  def cacheKey(query: String, companyId: String, tables: Seq[String] = Seq.empty): String = {
    val parts = Seq(query.toLowerCase.trim, companyId) ++ tables.sorted
    MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** The assistant's query-result cache (sql_assistant.py:263
    * `_query_cache`), keyed by [[cacheKey]]. */
  final class QueryCache[V] {
    private val cache = scala.collection.mutable.LinkedHashMap.empty[String, V]
    def getOrCompute(query: String, companyId: String, tables: Seq[String])(compute: => V): (V, Boolean) = {
      val k = cacheKey(query, companyId, tables)
      cache.get(k) match {
        case Some(v) => (v, true)
        case None => val v = compute; cache(k) = v; (v, false)
      }
    }
    def size: Int = cache.size
    def clear(): Unit = cache.clear()
  }
}
