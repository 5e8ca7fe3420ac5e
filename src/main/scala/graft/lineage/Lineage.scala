package graft.lineage

import scala.collection.mutable

/** Table-level lineage graph + impact analysis
  * (ref lineage/graph.py:61-400, lineage/tracker.py:95-370).
  *
  * Driver-side metadata only — nodes are tables/jobs, never rows, so a
  * plain in-memory graph is the right scale (a pipeline has thousands
  * of assets, not billions). Deterministic traversal order (sorted
  * neighbor ids) keeps reports reproducible.
  */
object Lineage {

  sealed trait NodeType
  case object TableNode extends NodeType
  case object JobNode extends NodeType

  final case class Node(id: String, nodeType: NodeType, name: String,
      metadata: Map[String, String] = Map.empty)
  final case class Edge(from: String, to: String, operation: String,
      metadata: Map[String, String] = Map.empty)

  final class Graph {
    private val nodeMap = mutable.LinkedHashMap.empty[String, Node]
    private val edgeList = mutable.ListBuffer.empty[Edge]

    // mutations and snapshot reads synchronize on the graph: lineage
    // is recorded from wherever a write happens, including the bounded
    // pool BatchExtract fans tables over — edges are few (one per
    // layer hop), so the lock is never contended for long
    def addNode(node: Node): Unit = synchronized { nodeMap.update(node.id, node) }
    def addEdge(edge: Edge): Unit = synchronized {
      require(nodeMap.contains(edge.from), s"unknown node ${edge.from}")
      require(nodeMap.contains(edge.to), s"unknown node ${edge.to}")
      edgeList += edge
    }

    def nodes: Seq[Node] = synchronized { nodeMap.values.toSeq }
    def edges: Seq[Edge] = synchronized { edgeList.toList }

    private def neighbors(id: String, forward: Boolean): Seq[String] =
      edges.collect {
        case e if forward && e.from == id  => e.to
        case e if !forward && e.to == id   => e.from
      }.distinct.sorted

    private def traverse(start: String, forward: Boolean, depth: Int): Seq[String] = {
      val seen = mutable.LinkedHashSet.empty[String]
      def go(id: String, d: Int): Unit =
        if (depth < 0 || d < depth)
          neighbors(id, forward).foreach { n =>
            if (seen.add(n)) go(n, d + 1)
          }
      go(start, 0)
      seen.toSeq
    }

    /** graph.py:161 — all transitive inputs of a node. */
    def upstream(id: String, depth: Int = -1): Seq[String] = traverse(id, forward = false, depth)

    /** graph.py:191 — all transitive consumers of a node. */
    def downstream(id: String, depth: Int = -1): Seq[String] = traverse(id, forward = true, depth)

    /** graph.py:221 — one (BFS-shortest) path, if any. */
    def path(from: String, to: String): Option[Seq[String]] = {
      val prev = mutable.Map.empty[String, String]
      val queue = mutable.Queue(from)
      val seen = mutable.Set(from)
      while (queue.nonEmpty && !seen.contains(to)) {
        val cur = queue.dequeue()
        neighbors(cur, forward = true).foreach { n =>
          if (seen.add(n)) { prev(n) = cur; queue.enqueue(n) }
        }
      }
      if (!seen.contains(to)) None
      else {
        val buf = mutable.ListBuffer(to)
        while (buf.head != from) buf.prepend(prev(buf.head))
        Some(buf.toList)
      }
    }

    /** graph.py:249 — what breaks if this node changes. */
    def impactAnalysis(id: String): ImpactReport = {
      val down = downstream(id)
      ImpactReport(
        nodeId = id,
        directImpact = neighbors(id, forward = true),
        totalImpact = down,
        impactedTables = down.filter(nodeMap.get(_).exists(_.nodeType == TableNode)),
        severity = down.size match {
          case 0          => "none"
          case n if n < 3 => "low"
          case n if n < 9 => "medium"
          case _          => "high"
        })
    }

    def roots: Seq[String] =
      nodeMap.keys.filterNot(id => edgeList.exists(_.to == id)).toSeq
    def leaves: Seq[String] =
      nodeMap.keys.filterNot(id => edgeList.exists(_.from == id)).toSeq

    /** graph.py:307 — mermaid flowchart export. */
    def toMermaid: String = {
      val lines = Seq("graph LR") ++
        nodes.map(n => s"""  ${sanitize(n.id)}["${n.name}"]""") ++
        edges.map(e => s"  ${sanitize(e.from)} -->|${e.operation}| ${sanitize(e.to)}")
      lines.mkString("\n")
    }
    private def sanitize(id: String): String = id.replaceAll("[^A-Za-z0-9_]", "_")
  }

  final case class ImpactReport(nodeId: String, directImpact: Seq[String],
      totalImpact: Seq[String], impactedTables: Seq[String], severity: String)

  /** tracker.py:95 — records transform events and materializes the graph. */
  final class Tracker {
    val graph = new Graph

    private def ensure(id: String, tpe: NodeType): Unit =
      if (!graph.nodes.exists(_.id == id)) graph.addNode(Node(id, tpe, id))

    // one lock for the whole record: ensure()'s check-then-add must be
    // atomic with respect to other recorders (see Graph's note)
    def recordTransform(inputs: Seq[String], output: String, operation: String): Unit =
      graph.synchronized {
        inputs.foreach(ensure(_, TableNode))
        ensure(output, TableNode)
        inputs.foreach(in => graph.addEdge(Edge(in, output, operation)))
      }

    def recordJoin(left: String, right: String, output: String): Unit =
      recordTransform(Seq(left, right), output, "join")

    def recordAggregate(input: String, output: String): Unit =
      recordTransform(Seq(input), output, "aggregate")
  }
}
