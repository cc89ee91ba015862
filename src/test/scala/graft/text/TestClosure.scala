package graft.text

/** Shared test helper: driver union-find over an edge list, for
  * transitive-closure comparison on small corpora (the PairMode.Star
  * same-closure properties in DedupPropertySpec and SimilaritySpec —
  * one definition so the two specs cannot silently diverge). */
object TestClosure {
  def componentsOf(edges: Set[(Long, Long)], nodes: Set[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }
}
