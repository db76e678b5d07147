package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation (the classic
  * Pregel shape as keyed DataFrame joins) — the clustering engine behind
  * the catalog's `dedup_cluster` and api.CorpusPipeline's near-dup
  * grouping.
  *
  * Scale posture (100 TB): the symmetrized edge set is repartitioned on the
  * join key ONCE and persisted, so every round's edges⋈labels probe reuses
  * the layout — one keyed shuffle per round, not two. Lineage is cut per
  * round with a LAZY localCheckpoint: the convergence action materializes
  * all pending rounds AND the fixpoint test in a single Spark job.
  * Convergence (Σlabel, monotone non-increasing, decimal(38,0) so it cannot
  * wrap) is checked every `checkEvery` rounds — overshoot is at most
  * checkEvery−1 cheap no-op shuffles while the blocking driver round-trips
  * (the real at-scale latency chain) are cut by that factor.
  *
  * ROUND COUNT is scale-adaptive (r16, guide §1.2 — the algorithm before
  * the configuration): for graphs past [[jumpNodeThreshold]] nodes the
  * cycle's first step also folds in POINTER DOUBLING — label(label(v)) is
  * in v's component too (every label is a reachable node id), so the best
  * label's distance halves per cycle on top of the edge walks, and rounds
  * drop from O(diameter) to O(log diameter): at 100 TB every avoided round
  * is a full edge-set shuffle plus a blocking driver barrier. Small graphs
  * skip the jump: their rounds are driver-latency-bound, and the extra
  * join's AQE stages cost more than the avoided rounds (measured at sf0.1:
  * 3.6 s plain vs 5.6 s doubled on dedup_cluster — job count, not data,
  * dominates below ~10⁶ nodes). Both paths reach the SAME fixpoint
  * (per-component min id), so every caller's hash gate pins either.
  */
object ConnectedComponents {

  /** Fixpoint rounds of the LAST labels() call on this driver — operator
    * observability for Dev probes (same pattern as JaccardPrefix
    * .lastDecision); never read by query logic. */
  @volatile var lastRounds: Option[Int] = None

  /** Whether the LAST labels() call used pointer doubling (observability). */
  @volatile var lastJumped: Option[Boolean] = None

  /** Node count past which cycles add the pointer-doubling leg. Below it
    * per-round cost is Spark job latency, not shuffle bytes, and plain
    * propagation's fewer/simpler actions win (sf0.1/sf1 measurements in
    * OPTIMIZATION_r16.md); above it rounds are edge-set shuffles and the
    * log-diameter round count wins. Dev-only env override for A/B probes
    * (`SPARK_GRAFT_CC_JUMP=always|never`) — the driver never sets it. */
  private val jumpNodeThreshold = 1000000L

  /** Test hook: pins the jump decision regardless of size/env, so the
    * equivalence property (same fixpoint on both paths) is unit-testable. */
  @volatile private[graft] var forceJump: Option[Boolean] = None

  private def jumpPolicy(nodes: Long): Boolean =
    forceJump.getOrElse(sys.env.get("SPARK_GRAFT_CC_JUMP") match {
      case Some("always") => true
      case Some("never")  => false
      case _              => nodes >= jumpNodeThreshold
    })

  /** (id, label) for every node that appears in `pairs` (two columns,
    * src/dst ids of an undirected edge); label = the smallest id reachable
    * from the node. Nodes with no edges are ABSENT — callers union their
    * identity labels back (they need no propagation). The result is
    * checkpoint-backed (the fixpoint ran to convergence before return). */
  def labels(pairs: DataFrame, checkEvery: Int = 2, maxIter: Int = 1000): DataFrame = {
    require(checkEvery >= 1 && maxIter >= 1)
    val Array(c1, c2) = pairs.columns
    val e0 = pairs.select(col(c1).as("src"), col(c2).as("dst"))
    val edges = e0.union(e0.select(col("dst"), col("src")))
      .repartition(col("src"))
      .persist() // materialized by first use; every later round reuses it
    // LAZY checkpoint: the first labelSum action materializes the initial
    // label set anyway, so an eager checkpoint here would just add one
    // blocking job per call (measured ~0.2-0.4 s × every clustering query).
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    // convergence statistic AND node count in ONE action — the count is
    // what the jump policy keys on, and it rides the sum's aggregate free
    def sumAndCount(df: DataFrame): (Option[java.math.BigDecimal], Long) = {
      val row = df.agg(sum(col("label").cast("decimal(38,0)")), count(lit(1))).head
      (if (row.isNullAt(0)) None else Some(row.getDecimal(0)), row.getLong(1))
    }
    val (sum0, nodes) = sumAndCount(labels)
    var prevSum = sum0
    val jump = jumpPolicy(nodes)
    lastJumped = Some(jump)
    var iter = 0
    var converged = prevSum.isEmpty
    try {
      while (!converged && iter < maxIter) {
        val steps = math.min(checkEvery, maxIter - iter)
        var next = labels
        for (step <- 0 until steps) {
          val msgs = edges.join(next, col("src") === col("id"))
            .select(col("dst").as("id"), col("label"))
          // The jump leg runs only on the CYCLE'S FIRST step, where `next`
          // is the frame the previous convergence check MATERIALIZED:
          // self-joining a not-yet-materialized lazy checkpoint plants its
          // whole plan twice under two DIFFERENT exchanges (by id and by
          // label — no exchange reuse), which measured slower than no
          // doubling at all (38 → 48 jobs at sf0.1). Later steps in the
          // cycle stay pure edge walks.
          val legs = if (!jump || step > 0) next.union(msgs) else {
            val hop = next.join(
                next.select(col("id").as("__lid"), col("label").as("__llab")),
                col("label") === col("__lid"))
              .select(col("id"), col("__llab").as("label"))
            next.union(msgs).union(hop)
          }
          next = legs
            .groupBy("id").agg(min(col("label")).as("label"))
            .localCheckpoint(false)
        }
        val s2 = sumAndCount(next)._1
        converged = s2 == prevSum
        prevSum = s2
        labels = next
        iter += steps
      }
      // The cap is a runaway backstop, not a semantic limit — exceeding it is
      // an ERROR (a silent cap-exit would return labels diverging from the
      // true fixpoint every caller's contract promises).
      require(converged, s"ConnectedComponents: no convergence in $maxIter rounds")
      lastRounds = Some(iter)
    } finally edges.unpersist()
    labels
  }
}
