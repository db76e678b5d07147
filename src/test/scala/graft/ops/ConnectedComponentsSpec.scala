package graft.ops

import org.scalacheck.Gen

import graft.SparkSpec

/** ConnectedComponents vs a driver-side union-find reference on random
  * graphs (seeded scalacheck generators, same style as ExpressionsSpec),
  * plus the convergence-batching and diameter edge cases the fixpoint
  * logic must survive. */
class ConnectedComponentsSpec extends SparkSpec {

  /** Union-find min-label reference: components over the edge list,
    * restricted to edge-touched nodes (the operator's contract). */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)], checkEvery: Int = 2): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(edges.toDF("src", "dst"), checkEvery = checkEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)
    m <- Gen.choose(1, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if b != a
    } yield (a, b))
  } yield edges

  test("random graphs match union-find (property)") {
    val cases = (0 until 8).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.filter(_.nonEmpty).foreach { edges =>
      assert(run(edges) == reference(edges), s"diverged on $edges")
    }
  }

  test("convergence batching is invisible: checkEvery 1, 2, 5 agree") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 13L), (13L, 10L), (20L, 21L))
    val want = reference(edges)
    for (k <- Seq(1, 2, 5)) assert(run(edges, k) == want, s"checkEvery=$k diverged")
  }

  test("path graph (worst-case diameter): min label walks the whole chain") {
    // label 0 must propagate one hop per round — exercises many fixpoint
    // rounds and the overshoot-after-convergence logic
    val path = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(run(path) == (0L until 12L).map(_ -> 0L).toMap)
  }

  test("self-contained components keep disjoint labels") {
    val edges = Seq((5L, 6L), (100L, 101L))
    assert(run(edges) == Map(5L -> 5L, 6L -> 5L, 100L -> 100L, 101L -> 100L))
  }

  test("pointer-doubling path reaches the same fixpoint in fewer rounds") {
    // the scale path (jump ≥ threshold nodes) must agree with plain
    // propagation on every graph — pin it via the test hook on the
    // property cases plus the worst-case chain, and check the round
    // count actually drops on the deep path
    val cases = (0 until 4).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(100L + i)))
        .filter(_.nonEmpty)
    val path = (0L until 24L).sliding(2).map(s => (s(0), s(1))).toSeq
    try {
      for (edges <- cases :+ path) {
        ConnectedComponents.forceJump = Some(false)
        val plain = run(edges)
        val plainRounds = ConnectedComponents.lastRounds.get
        ConnectedComponents.forceJump = Some(true)
        assert(run(edges) == plain, s"jump path diverged on $edges")
        val jumpRounds = ConnectedComponents.lastRounds.get
        if (edges eq path) {
          assert(plainRounds >= 23, s"chain-24 plain rounds: $plainRounds")
          assert(jumpRounds <= 10, s"chain-24 jump rounds: $jumpRounds")
        }
      }
    } finally ConnectedComponents.forceJump = None
  }
}
