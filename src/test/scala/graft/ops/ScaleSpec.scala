package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-mechanism proofs: salting preserves join semantics; bucketed tables
  * co-locate the join and eliminate the shuffle.
  */
class ScaleSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("plan lint: no cartesian product, nested-loop join, or single-partition window in any catalog query") {
    // BroadcastNestedLoopJoin evaluates its condition interpreted and cannot
    // scale past a broadcastable side; CartesianProduct is never acceptable.
    // Allowlist: fuzzy_levenshtein deliberately cross-joins a 25-row
    // dictionary side (broadcast; bounded by construction).
    val bnljOk = Set("fuzzy_levenshtein")
    // A logical Window whose partitionSpec is empty or all-foldable funnels
    // its ENTIRE input through one task — the classic 100 TB bottleneck
    // (this is what made r8's skew_stats weak). Allowlist: the distributed-
    // prefix-sum entries (ops.Sampling.inclusiveRunningSum) window over
    // exactly ONE ROW PER SHUFFLE PARTITION — bounded by construction at
    // ≤ spark.sql.shuffle.partitions rows regardless of data volume.
    val globalWindowOk = Set("sample_token_budget", "pack_chunks", "pack_length_binned")
    // The clustering queries are iterative: building their DataFrames eagerly
    // EXECUTES the whole label-propagation job (per-round localCheckpoint
    // actions), and the resulting plan only shows the final round. The
    // per-round join shape — the plan that actually repeats at scale — is
    // linted separately below.
    val iterative = Set("dedup_cluster", "dedup_embedding_cluster")
    def globalWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.forall(_.foldable) => w
      }
    // self-check: the detector must FIRE on the known-bad shape (r8's
    // skew_stats) — otherwise a Catalyst rewrite that hides the node would
    // turn this lint into a silent no-op
    import org.apache.spark.sql.expressions.{Window => W}
    val bad1 = spark.range(10).withColumn("t",
      sum(col("id")).over(W.partitionBy(lit(1)).orderBy("id")))
    val bad2 = spark.range(10).withColumn("t", sum(col("id")).over(W.orderBy("id")))
    assert(globalWindows(bad1).nonEmpty, "lint failed to detect partitionBy(lit) window")
    assert(globalWindows(bad2).nonEmpty, "lint failed to detect empty-partition window")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (!iterative(name)) {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct:\n$plan")
        if (!bnljOk(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin:\n$plan")
        if (!globalWindowOk(name)) {
          val bad = globalWindows(df)
          assert(bad.isEmpty,
            s"$name plans a single-partition window (empty/constant partitionBy):\n${bad.mkString("\n")}")
        }
      }
    }
  }

  test("plan lint: TPC-H q4 semi-joins, q10/q18 take ordered top-k") {
    // q4's EXISTS must plan as a LEFT SEMI hash join (a per-row subquery or
    // nested loop would re-scan lineitem per order); q10/q18's LIMIT must
    // plan as TakeOrderedAndProject (per-partition heaps), never a global
    // sort of the grouped set.
    val q4 = graft.SparkEntry.queries("sql_tpch_q4")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q4.contains("LeftSemi"), s"q4 lost its semi join:\n$q4")
    for (name <- Seq("sql_tpch_q10", "sql_tpch_q18")) {
      val p = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"$name should plan its LIMIT as TakeOrderedAndProject:\n$p")
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

  test("plan lint: pmod dummy-key joins stay BroadcastHashJoin (sim_topk, cosineTopK, IVF assignment)") {
    // These joins are load-bearing on Catalyst NOT constant-folding
    // pmod(id, 1): fold it and the equi key vanishes, demoting the join to an
    // interpreted BroadcastNestedLoopJoin (~10× slower on the 64-dim cosine).
    // This lint fails loudly if a future Catalyst version folds it.
    val topk = graft.SparkEntry.queries("sim_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(topk.contains("BroadcastHashJoin"),
      s"sim_topk lost its BroadcastHashJoin:\n$topk")
    // the public-API path (sim_topk delegates here, but assert it directly so
    // the API contract holds even if the catalog entry changes)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val api = graft.api.Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(api.contains("BroadcastHashJoin"),
      s"Similarity.cosineTopK lost its BroadcastHashJoin:\n$api")
    // sim_ivf (plain-recompute since r6 — no checkpoint hiding the plan):
    // both centroid-assignment sides must keep the dummy-key
    // BroadcastHashJoin, and nothing may demote to a nested loop
    val ivf = graft.SparkEntry.queries("sim_ivf")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(ivf.contains("BroadcastHashJoin"),
      s"sim_ivf assignment join lost its BroadcastHashJoin:\n$ivf")
    assert(!ivf.contains("BroadcastNestedLoopJoin"),
      s"sim_ivf assignment join demoted to BroadcastNestedLoopJoin:\n$ivf")
  }

  test("plan lint: decontamination joins the benchmark shingle set by broadcast") {
    // the corpus-side scan must meet the benchmark inventory through a
    // BroadcastHashJoin (the explicit broadcast() in Decontaminate.flags);
    // the id-keyed n_hits re-attach may legitimately shuffle at scale
    val plan = graft.SparkEntry.queries("text_decontam")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"text_decontam lost its broadcast benchmark join:\n$plan")
  }

  test("repeated dimension broadcast is planned once and reused (ReusedExchange)") {
    // The snowflake pattern a 100 TB mart hits constantly: the same
    // dimension broadcast on two different fact sides. Catalyst must plan ONE
    // BroadcastExchange for nation and a ReusedExchange for the second use —
    // at scale this halves dimension broadcast traffic per repeated dim.
    val nation = graft.Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val cust = graft.Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val supp = graft.Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val both = cust.join(supp, col("cust_nation") === col("supp_nation"))
    // AQE reuses exchanges at runtime stage materialization, so the marker
    // only appears in the FINAL adaptive plan — execute first (collect, not
    // count: count spawns a separate QueryExecution)
    assert(both.collect().nonEmpty)
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"second nation broadcast not reused:\n$plan")
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

  test("AQE splits the skewed partition of a shuffle join (skew=true in final plan)") {
    // The claim in Skew.scala's doc — "AQE's skew-join handles sort-merge
    // cases adaptively" — proven at local scale: one hot key owns ~75% of the
    // big side, thresholds lowered so the hot partition qualifies as skewed
    // at MB size, then the FINAL adaptive plan (AQE re-plans at runtime, so
    // the join must execute first) must carry the skew=true marker on the
    // join node. Salting (tested above) remains the pre-AQE/aggregation tool;
    // this is the runtime path a 100 TB join would actually take.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    try {
      val big = spark.range(400000).select(
        when(col("id") % 4 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
      val small = spark.range(1000).select(col("id").as("k"), lit("dim").as("v"))
      val joined = big.join(small, "k")
      // collect() (NOT count(): that spawns a separate QueryExecution and
      // would leave this one un-executed) drives joined's own adaptive plan
      // to its final form. hot key 0: 300000 (id%4!=0) + id=0 itself;
      // uniform: ids 4,8,...,996.
      assert(joined.collect().length === 300250)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
