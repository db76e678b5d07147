package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-mechanism proofs: salting preserves join semantics; bucketed tables
  * co-locate the join and eliminate the shuffle.
  */
class ScaleSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("plan lint: no cartesian product or accidental nested-loop join in any catalog query") {
    // BroadcastNestedLoopJoin evaluates its condition interpreted and cannot
    // scale past a broadcastable side; CartesianProduct is never acceptable.
    // Allowlist: fuzzy_levenshtein deliberately cross-joins a 25-row
    // dictionary side (broadcast; bounded by construction).
    val bnljOk = Set("fuzzy_levenshtein")
    // dedup_cluster is iterative: building its DataFrame eagerly EXECUTES the
    // whole label-propagation job (per-round localCheckpoint actions), and the
    // resulting plan only shows the final round. It is linted separately below
    // on the per-round join shape — the plan that actually repeats at scale.
    val iterative = Set("dedup_cluster")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (!iterative(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct:\n$plan")
        if (!bnljOk(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }

  test("plan lint: dedup_cluster per-round propagation join is a keyed equi-join") {
    // The shape that repeats every round: edges ⋈ labels on the node key,
    // then a grouped min — exactly what dedup_cluster's loop body builds.
    val pairs = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .select("id1", "id2")
    val edges = pairs.union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .withColumnRenamed("id1", "src").withColumnRenamed("id2", "dst")
    val labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    val round = edges.join(labels, col("src") === col("id"))
      .select(col("dst").as("id"), col("label"))
      .union(labels)
      .groupBy("id").agg(min(col("label")).as("label"))
    val plan = round.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"round plan has CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"round plan has BroadcastNestedLoopJoin:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"),
      s"round plan should contain a keyed join:\n$plan")
  }

  test("salted join returns exactly the plain join result") {
    val orders = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", factor = 7)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted count equals plain count per key") {
    val li = graft.Tables.lineitem(spark, dir)
    val plain = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(li, "l_returnflag", factor = 11)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = "target/bucketing-spec"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.Tables.orders(spark, dir)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    graft.Tables.customer(spark, dir)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")
    // below the broadcast threshold both sides would broadcast; force the
    // shuffle-join path to show bucketing removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == graft.Tables.orders(spark, dir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
