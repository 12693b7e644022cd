package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative DataFrame-based connected components via alternating
  * large-star / small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — see PAPERS.md). North-rule operator;
  * the reference has no clustering at all (its `matching/` module is an
  * empty stub, SURVEY.md §0).
  *
  * Everything is expressed as groupBy/min + join — no collect_set, so no
  * per-node neighbor list ever materializes in one task (a celebrity node
  * with 10^8 neighbors would OOM any list-based formulation). Convergence is
  * O(log n) rounds; each round shuffles the (shrinking) edge set.
  * `localCheckpoint` after each round truncates lineage — without it the
  * plan doubles every iteration and the driver dies on plan compilation
  * long before the data hurts.
  */
object ConnectedComponents {

  /** large-star: for every node u, attach all strictly-greater neighbours to
    * m(u) = min(Γ(u) ∪ u). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val minN = sym.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    sym.filter(col("dst") > col("src"))
      .join(minN, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** small-star: orient edges to (u ≥ v); attach each smaller neighbour and u
    * itself to m(u) = min of the smaller neighbours. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val minN = oriented.groupBy("src").agg(min(col("dst")).as("m"))
    oriented.join(minN, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(minN.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Order-free fingerprint of an edge set, used for the convergence test
    * (one small aggregate per round — no edge-set comparison join). */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    // bit_xor: order-free and overflow-free under ANSI mode (sum of hashes
    // overflows Long); valid as a set fingerprint because edges are distinct.
    val r = edges.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** @param edges DataFrame with `src`, `dst` columns (undirected) of any
    *               orderable type — longs OR strings: min/least/greatest are
    *               type-generic, so node ids can be the url strings
    *               themselves. At 10^12 nodes a 64-bit hash id collides
    *               ~n²/2⁶⁵ ≈ 2.7×10⁴ times, each silently merging two
    *               unrelated entities — carrying the natural string key is
    *               the collision-FREE choice (the shuffle payload grows by
    *               the key width; correctness is not negotiable here). For
    *               string keys at scale prefer [[runOnStrings]], which runs
    *               the iteration on dense dictionary longs instead.
    * @return DataFrame (id, component) covering every node that appears in
    *         `edges`; `component` is the minimum node id of the component. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var fp = fingerprint(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      e = next
      it += 1
    }
    // Converged state is a star per component: (member, root). Roots appear
    // only on the dst side; add their self-mapping.
    val members = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst").as("id"), col("dst").as("component")).distinct()
    members.union(roots).distinct()
  }

  /** Connected components over STRING node ids via a dense dictionary: the
    * O(log n) star iteration shuffles its edge set every round, and an 8-byte
    * dictionary long is ~5× narrower than a url — at 10^12 nodes that is the
    * difference between CC shuffling ~8 TB and ~40 TB per round. The
    * dictionary id is `monotonically_increasing_id` (unique BY CONSTRUCTION —
    * no birthday collisions, unlike a 64-bit hash), pinned by persist+count
    * so recomputation cannot renumber; the representative is re-derived as
    * the MINIMUM member string after the loop, so the output is deterministic
    * and identical to running [[run]] on the strings directly.
    *
    * @param edges (src, dst) string columns.
    * @return (id, component): both strings; component = min member string. */
  def runOnStrings(edges: DataFrame): DataFrame = {
    val dict = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .withColumn("mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dict.count() // pin the (id → mid) assignment before it is read twice

    val midEdges = edges
      .join(dict.select(col("id").as("src"), col("mid").as("msrc")), "src")
      .join(dict.select(col("id").as("dst"), col("mid").as("mdst")), "dst")
      .select(col("msrc").as("src"), col("mdst").as("dst"))
    val comps = run(midEdges) // (id: mid, component: mid)

    val members = comps
      .join(dict.select(col("mid").as("id"), col("id").as("member")), "id")
      .select(col("member"), col("component"))
    val reps = members.groupBy("component").agg(min(col("member")).as("rep"))
    val out = members.join(reps, "component")
      .select(col("member").as("id"), col("rep").as("component"))
    // dict stays persisted until LRU eviction — eager unpersist would force
    // the caller's first action to recompute (and renumber) the mapping
    out
  }
}
