package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission (RFC 9309, the Robots
  * Exclusion Protocol) — crawl politeness as a corpus-scale operator:
  * given the robots files a fetch pass already landed and a frontier
  * of candidate URLs, decide per URL whether the corpus may keep it.
  * Both halves are pure column algebra (split/window/join — no UDF,
  * no driver loop), so parsing a billion robots lines and admitting a
  * trillion URLs are ordinary shuffles.
  *
  * Grammar subset, stated: `User-agent` / `Allow` / `Disallow` lines
  * (case-insensitive keys), `#` comments, CRLF/LF, consecutive
  * user-agent lines sharing one group — the RFC's core. Path
  * patterns support the RFC's `*` wildcard and `$` end anchor via
  * regex translation in [[pathMatches]]. Agent-group selection is by
  * exact product token, falling back to `*` (the RFC's most-specific
  * rule restricted to exact matches — crawlers send one fixed token).
  */
object Robots {

  /** Parse robots.txt bodies → one row per (host, agent, rule, path).
    * A group = a run of consecutive `User-agent` lines plus the rules
    * after it (RFC 9309 §2.2.1); a rule row is emitted once per agent
    * in its group. Group ids are a running sum over line position —
    * one window per host partition; robots files are KB-sized, so the
    * per-host sort is bounded and the parse is embarrassingly
    * host-parallel. → (host, agent, rule ∈ allow|disallow, path)
    */
  def parseRules(robots: DataFrame, hostCol: String, contentCol: String): DataFrame = {
    val rx = "^([^:]+):(.*)$"
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(contentCol), "\r?\n")).as(Seq("pos", "_l")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("_l"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("host"), col("pos"),
        lower(trim(regexp_extract(col("line"), rx, 1))).as("key"),
        trim(regexp_extract(col("line"), rx, 2)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val byPos = Window.partitionBy(col("host")).orderBy(col("pos"))
    val grouped = lines
      .withColumn("_isua", (col("key") === "user-agent").cast("int"))
      .withColumn("_newg",
        when(col("_isua") === 1 &&
          coalesce(lag(col("_isua"), 1).over(byPos), lit(0)) === 0, 1).otherwise(0))
      .withColumn("grp", sum(col("_newg")).over(byPos))
    val agents = grouped.filter(col("_isua") === 1)
      .select(col("host"), col("grp"), lower(col("value")).as("agent")).distinct()
    val rules = grouped.filter(col("_isua") === 0)
      .select(col("host"), col("grp"), col("key").as("rule"), col("value").as("path"))
    agents.join(rules, Seq("host", "grp")).select("host", "agent", "rule", "path")
  }

  /** RFC 9309 path-pattern match: literal prefix plus `*` (any run)
    * and a trailing `$` (end anchor). Translated to an anchored regex
    * — every other regex metacharacter in the pattern is escaped
    * first, so `/a.b+c` matches only itself.
    *
    * Hostile-input hardening: robots.txt is untrusted web content and
    * each `*` becomes a backtracking `.*`, so a rule like
    * `/x*a*a*a*a*a*a$` probed against long non-matching frontier paths
    * costs O(n^wildcards) in java.util.regex — a DoS surface at
    * trillion-URL scale. Before translating we (1) collapse runs of
    * `*` (semantically identical), then (2) keep at most the first 4
    * wildcards and 250 chars of the pattern. A truncated rule
    * degrades to a prefix match of its kept head — strictly MORE
    * permissive about matching, applied identically to allow and
    * disallow rules, so pathological rules lose precision instead of
    * costing CPU. Real-world robots rules are far under both caps. */
  def pathMatches(path: Column, pattern: Column): Column = {
    val collapsed = regexp_replace(pattern, "\\*{2,}", "*")
    val bounded =
      substring(array_join(slice(split(collapsed, "\\*"), 1, 5), "*"), 1, 250)
    val esc = regexp_replace(bounded,
      "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|])", "\\\\$1")
    val wc = regexp_replace(esc, "\\*", ".*")
    val anchored = regexp_replace(wc, "\\\\\\$$", "\\$")
    regexp_like(path, concat(lit("^"), anchored))
  }

  /** Admit a URL frontier against parsed [[parseRules]] rows for one
    * crawler `agent`: per host the matching group is the agent's own
    * if one exists, else `*`; per URL the longest matching pattern
    * wins, ties go to allow, no match means allowed (RFC 9309 §2.2.2).
    * Empty patterns (the idiomatic `Disallow:` = allow-all) match
    * nothing by construction.
    *
    * Scale shape: one host-keyed join (rules per host are KB-bounded
    * — AQE broadcast-ready when the rule set is small), then ONE
    * argmax window per URL id over the matched rows (WindowGroupLimit
    * keeps a row per URL). The no-match majority short-circuits: only
    * URLs with ≥1 matching rule enter the window.
    * → (idCol, host, path, allowed, rule, matched)
    */
  def decide(
      urls: DataFrame, idCol: String, hostCol: String, pathCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase
    val hasAgent = rules.filter(col("agent") === agentLc)
      .select(col("host")).distinct().withColumn("_ha", lit(1))
    val chosen = rules.join(hasAgent, Seq("host"), "left")
      .filter(when(col("_ha") === 1, col("agent") === agentLc)
        .otherwise(col("agent") === "*"))
      .filter(col("path") =!= "")
      .select(col("host"), col("rule"), col("path").as("pattern"))
    val u = urls.select(col(idCol).as("_id"),
      col(hostCol).as("host"), col(pathCol).as("path"))
    val matched = u.join(chosen, Seq("host"), "left")
      .filter(col("pattern").isNotNull && pathMatches(col("path"), col("pattern")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_id")).orderBy(
          length(col("pattern")).desc, col("rule").asc, col("pattern").asc)))
      .filter(col("_rn") === 1)
      .select(col("_id"), col("rule"), col("pattern").as("matched"))
    u.join(matched, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("host"), col("path"),
        coalesce(col("rule") === "allow", lit(true)).as("allowed"),
        col("rule"), col("matched"))
  }
}
