package graft.orchestration

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.lineage.Lineage

/** Declarative pipeline orchestration (ref orchestration/workflow.py:78,
  * job.py:59-308, scheduler.py:416): a named DAG of stages with
  * per-stage retry, transitive downstream skip on failure, restart
  * from prior outputs, and automatic lineage registration.
  *
  * Spark-first stance — and the one place this deliberately diverges
  * from the reference: the reference's runner is an EXECUTION engine
  * (it materializes every step's output, because Polars/pandas steps
  * are eager). Here a stage returns a lazy DataFrame, and the runner
  * does NOT inject materialization barriers between stages: chained
  * transforms compose into one logical plan, so Catalyst optimizes
  * ACROSS stage boundaries (a filter declared in stage 3 still pushes
  * down into stage 1's scan) and Spark runs one job, not #stages jobs.
  * At 100 TB, per-stage materialization would write every intermediate
  * to storage — the orchestration DAG is for bookkeeping, restart and
  * lineage, never execution scheduling.
  *
  * Consequences, documented not hidden:
  *   - a non-action stage "succeeds" when its plan BUILDS (analysis
  *     errors, missing columns, bad casts surface here); data-dependent
  *     failures surface at the terminal action stage, which is where
  *     retry matters most (and where the reference's retry fires too —
  *     its transform steps rarely fail after validation);
  *   - sink stages (calling `.write`/`foreachBatch`/collect inside the
  *     stage function) ARE actions — their retry is a true re-run, and
  *     write idempotence should come from the sink (e.g.
  *     [[graft.sources.VersionedTable]]'s write-audit-publish or
  *     `Sinks.writePartitionedIdempotent`), making retry-after-partial-
  *     failure safe by construction.
  *
  * Restart: `run(sources, completed = …)` seeds already-finished
  * stages (e.g. read back from their committed tables) — they are
  * reported `restored` and not re-executed, the standard
  * restart-from-checkpoint contract of workflow.py:264.
  */
object Pipeline {

  /** One DAG node: `transform` receives every dependency's DataFrame
    * by name (dependencies may be stage names or source names). */
  final case class Stage(
      name: String,
      dependsOn: Seq[String],
      transform: Map[String, DataFrame] => DataFrame,
      maxRetries: Int = 0)

  sealed trait Status { def isSuccess: Boolean = false }
  /** `attempts` counts executions, so retries = attempts − 1. */
  final case class Succeeded(attempts: Int) extends Status { override def isSuccess = true }
  final case class Failed(attempts: Int, error: String) extends Status
  /** Skipped because a transitive upstream failed. */
  final case class Skipped(becauseOf: String) extends Status
  /** Seeded from a prior run's output — not executed. */
  case object Restored extends Status { override def isSuccess = true }

  final case class Result(
      pipeline: String,
      stages: ListMap[String, Status],
      outputs: Map[String, DataFrame]) {
    def success: Boolean = stages.values.forall(_.isSuccess)
    def apply(stage: String): DataFrame = outputs(stage)
  }

  /** Validate the DAG and return a deterministic topological order
    * (Kahn's algorithm, lexicographic tie-break — reruns execute and
    * report in the same order every time). */
  private def topoOrder(stages: Seq[Stage], sourceNames: Set[String]): Seq[Stage] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size,
      s"duplicate stage names: ${stages.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }.mkString(", ")}")
    val overlap = sourceNames.intersect(byName.keySet)
    require(overlap.isEmpty, s"stage names shadow sources: ${overlap.mkString(", ")}")
    stages.foreach { s =>
      val unknown = s.dependsOn.filterNot(d => byName.contains(d) || sourceNames.contains(d))
      require(unknown.isEmpty, s"stage ${s.name}: unknown dependencies ${unknown.mkString(", ")}")
    }
    val indeg = mutable.Map.from(stages.map(s => s.name -> s.dependsOn.count(byName.contains)))
    val ready = mutable.SortedSet.from(indeg.collect { case (n, 0) => n })
    val order = mutable.ListBuffer.empty[Stage]
    while (ready.nonEmpty) {
      val n = ready.head
      ready.remove(n)
      order += byName(n)
      stages.foreach { s =>
        if (s.dependsOn.contains(n)) {
          indeg(s.name) -= 1
          if (indeg(s.name) == 0) ready.add(s.name)
        }
      }
    }
    require(order.size == stages.size,
      s"dependency cycle among: ${(byName.keySet -- order.map(_.name)).toSeq.sorted.mkString(", ")}")
    order.toSeq
  }

  /** Run the DAG over named source frames.
    *
    * Failure semantics (job.py:200-224 + run_jobs): a stage retries up
    * to `maxRetries` times; when it still fails, every stage that
    * transitively depends on it is SKIPPED (with the root failure
    * recorded), while independent branches keep running — more precise
    * than the reference's stop_on_failure=True, which abandons even
    * unrelated branches.
    *
    * Every executed stage registers lineage: dep → stage edges tagged
    * with the pipeline name, composing with impact analysis (a failed
    * stage's blast radius IS `tracker.graph.impactAnalysis(stage)`).
    *
    * With a [[graft.ops.Log.Emitter]], every transition emits one
    * structured event (ref utils/logging.py + pipeline.py's
    * before/after/on_error hooks): `pipeline_started`,
    * `stage_started` / `stage_completed` / `stage_failed` /
    * `stage_skipped` / `stage_restored` per stage, and
    * `pipeline_completed` with the success flag. `pipeline_id` rides
    * every event as an EXPLICIT field, not emitter-bound context —
    * two runs sharing one driver-wide emitter must not overwrite each
    * other's binding, and a Throwable escaping a stage must not leak
    * a stale binding onto unrelated later events. */
  def run(
      name: String,
      stages: Seq[Stage],
      sources: Map[String, DataFrame],
      tracker: Option[Lineage.Tracker] = None,
      completed: Map[String, DataFrame] = Map.empty,
      log: Option[graft.ops.Log.Emitter] = None): Result = {
    val order = topoOrder(stages, sources.keySet)
    def ev(l: graft.ops.Log.Emitter, level: String, event: String,
           fields: (String, Any)*): Unit = level match {
      case "error" => l.error(event, ("pipeline_id" -> name) +: fields: _*)
      case "warning" => l.warn(event, ("pipeline_id" -> name) +: fields: _*)
      case _ => l.info(event, ("pipeline_id" -> name) +: fields: _*)
    }
    log.foreach(ev(_, "info", "pipeline_started", "stages" -> order.size))
    val outputs = mutable.Map.from(sources)
    val status = mutable.LinkedHashMap.empty[String, Status]
    // stage → root failure that poisons it (first failed upstream)
    val poisoned = mutable.Map.empty[String, String]

    order.foreach { stage =>
      val poison = stage.dependsOn.collectFirst {
        case d if poisoned.contains(d) => poisoned(d)
        case d if status.get(d).exists(s => !s.isSuccess) => d
      }
      if (completed.contains(stage.name)) {
        outputs(stage.name) = completed(stage.name)
        status(stage.name) = Restored
        log.foreach(ev(_, "info", "stage_restored", "stage" -> stage.name))
      } else if (poison.isDefined) {
        status(stage.name) = Skipped(poison.get)
        poisoned(stage.name) = poison.get
        log.foreach(ev(_, "warning", "stage_skipped",
          "stage" -> stage.name, "because_of" -> poison.get))
      } else {
        log.foreach(ev(_, "info", "stage_started", "stage" -> stage.name))
        val inputs = stage.dependsOn.map(d => d -> outputs(d)).toMap
        var attempts = 0
        var done = false
        var lastError = ""
        while (!done && attempts <= stage.maxRetries) {
          attempts += 1
          try {
            outputs(stage.name) = stage.transform(inputs)
            done = true
          } catch {
            case e: Exception => lastError = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          }
        }
        if (done) {
          status(stage.name) = Succeeded(attempts)
          tracker.foreach { t =>
            t.recordTransform(stage.dependsOn, stage.name, s"pipeline:$name")
          }
          log.foreach(ev(_, "info", "stage_completed",
            "stage" -> stage.name, "attempts" -> attempts))
        } else {
          status(stage.name) = Failed(attempts, lastError)
          poisoned(stage.name) = stage.name
          log.foreach(ev(_, "error", "stage_failed",
            "stage" -> stage.name, "attempts" -> attempts, "error" -> lastError))
        }
      }
    }
    val result = Result(name, ListMap.from(status), outputs.toMap -- sources.keySet)
    log.foreach(ev(_, "info", "pipeline_completed", "success" -> result.success))
    result
  }
}
