package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step a dedup pipeline
  * needs AFTER pair finding: near-duplicate pairs are rarely disjoint
  * (A~B, B~C), so keeping "one doc per pair" both over- and
  * under-deletes; the unit of deduplication is the transitive CLUSTER,
  * from which one canonical document (the minimum id here) is kept.
  *
  * Algorithm: hash-to-min label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum label among
  * itself and its neighbors; convergence in graph-diameter rounds, each
  * round one equi-join + one min-aggregation on node id (two shuffles of
  * the edge relation). Near-dup graphs are unions of small dense
  * clusters — diameter is tiny (≤ 3–4), so the loop exits after a
  * handful of rounds; the early-exit check is a LIMIT 1 existence probe,
  * not a full count. For adversarial long-path graphs (where diameter
  * rounds would be fatal at 100 TB), [[connectedStar]] implements
  * alternating large-star/small-star contraction with an O(log n) round
  * bound — spec-verified equivalent on random graphs and on a 64-node
  * chain. Near-dup graphs keep hash-to-min as the default: fewer, cheaper
  * rounds when the diameter is small.
  *
  * Each round's result is localCheckpoint'ed: without it round N's plan
  * replays rounds 0..N−1 (lineage grows quadratically), and the upstream
  * pair-mining pipeline would re-execute every round — on a cluster,
  * checkpoint to durable storage instead. */
object Components {

  /** (id, label) for every node appearing in `edges`, where label is the
    * minimum node id in the component — deterministic, so downstream
    * results are engine-comparable. Singleton documents (no edges) do not
    * appear; callers wanting them can union the node universe in. */
  def connected(edges: DataFrame, aCol: String, bCol: String,
                maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val (dir, small) = prepare(edges, aCol, bCol)
    small match {
      case Some(labels) =>
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](labels.length)
        labels.foreach { case (id, l) => rows.add(org.apache.spark.sql.Row(id, l)) }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.LongType, nullable = false)))
        spark.createDataFrame(rows, schema)
      case None => hashToMin(dir, maxIter)
    }
  }

  /** Conf read with a clear failure (r18 ADVICE: a malformed value used to
    * surface as a bare NumberFormatException deep inside connected()). */
  private def confLong(spark: org.apache.spark.sql.SparkSession,
                       key: String, default: Long): Long =
    spark.conf.getOption(key).map { v =>
      try v.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"conf $key must be a LONG, got '$v'") }
    }.getOrElse(default)

  /** Checkpoint the DIRECTED edge list once and decide the path: returns
    * the cached edges plus, when the graph fits the small gate, the
    * driver union-find labeling — computed HERE so [[connected]] and
    * [[clusters]] both consume it explicitly (r18 ADVICE: clusters used
    * to sniff connected()'s logical plan for a LocalRelation, an implicit
    * coupling any future projection would silently deactivate).
    *
    * Small-graph fast path (r18, the Percentiles.exactCont small-input
    * gate applied to graphs): near-dup graphs at bench/test scale are a
    * few hundred edges, yet every distributed round costs join + agg +
    * checkpoint + probe driver actions (~0.1 s scheduling floor each).
    * The r18 shape ran TWO bounded jobs (count probe, then collect);
    * r19 merges them: the probe task counts up to cap = maxLocalEdges+1
    * rows (early exit — once one partition alone exceeds the gate the
    * sum certainly does) AND materializes the (src, dst) longs while
    * under a per-partition budget of maxLocalEdges/P, so the driver
    * receipt is bounded by ~maxLocalEdges pairs TOTAL no matter how the
    * over-gate case is distributed. A SKEWED small graph (under the gate
    * overall but one partition over the budget) falls back to the r18
    * second collect job — correctness never depends on the budget. NOTE:
    * partition count is deliberately NOT used to skip the probe (the r18
    * advice sketch): strict-width exchanges upstream are AQE-exempt, so
    * a 32-partition edge list can still be a 1k-edge graph — measured on
    * d09 at sf0.1, where a partition-count skip silently disabled the
    * gate and regressed the row 60%. Unions always point the larger root
    * at the smaller, so find() yields the component-minimum id —
    * bit-identical to the iterative fixpoint's label contract; over the
    * gate (or if any edge carries a NULL id — out of the dedup contract)
    * the distributed hash-to-min loop runs unchanged. */
  private def prepare(edges: DataFrame, aCol: String, bCol: String)
      : (DataFrame, Option[Array[(Long, Long)]]) = {
    val spark = edges.sparkSession
    // Checkpoint the DIRECTED edge list, not the doubled union (r18): the
    // union's two branches each re-planned the upstream pair-mining
    // pipeline, so the old checkpoint ran the mining aggregate TWICE
    // (ReuseExchange dedupes the shuffle, not the post-shuffle stages —
    // profiled as two full-width stages per run), and the checkpointed
    // union carried 2× the mining plan's partitions of near-empty edge
    // rows that EVERY round's join/agg re-scanned at full task width.
    val dir = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint() // mined pairs must not be recomputed per round
    val maxLocal = confLong(spark, "graft.components.maxLocalEdges", 1L << 19)
    val dirRows = org.apache.spark.sql.GraftSqlBridge.toRdd(dir)
    val parts = dirRows.getNumPartitions
    if (parts == 0) return (dir, Some(Array.empty))
    val cap = maxLocal + 1
    val budget = math.max(1L, maxLocal / parts)
    val perPart: Array[(Long, Boolean, Array[Long])] = spark.sparkContext.runJob(dirRows,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var c = 0L; var hasNull = false
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        while (c < cap && !hasNull && it.hasNext) {
          val r = it.next(); c += 1
          if (r.isNullAt(0) || r.isNullAt(1)) hasNull = true
          else if (c <= budget) { buf += r.getLong(0); buf += r.getLong(1) }
        }
        (c, hasNull, if (!hasNull && c <= budget) buf.result() else Array.empty[Long])
      })
    if (perPart.map(_._1).sum > maxLocal || perPart.exists(_._2)) (dir, None)
    else if (perPart.forall(p => p._1 == 0L || p._3.nonEmpty))
      // every nonempty partition fit its budget: the probe already
      // carried the whole graph — zero further jobs
      (dir, Some(unionFindLabels(perPart.iterator.map(_._3))))
    else {
      // under the gate but skewed past the per-partition budget: one
      // bounded collect (≤ maxLocalEdges rows total), the r18 shape
      val local: Array[Array[Long]] = spark.sparkContext.runJob(dirRows,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          val buf = new scala.collection.mutable.ArrayBuilder.ofLong
          it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
          buf.result()
        })
      (dir, Some(unionFindLabels(local.iterator)))
    }
  }

  /** Driver union-find over interleaved (src, dst) pair arrays: returns
    * (id, label = component minimum). Unions point the larger root at the
    * smaller, so find() IS the component minimum. Map access is
    * null-guarded (r18 ADVICE: a missing boxed key would silently unbox
    * to 0L and corrupt labels instead of failing loudly). */
  private def unionFindLabels(pairArrays: Iterator[Array[Long]]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def get(x: Long): Long = {
      val p = parent.get(x)
      require(p != null, s"union-find: node $x missing from parent map")
      p.longValue()
    }
    def find(x: Long): Long = {
      var r = x
      while (get(r) != r) r = get(r)
      var c = x // path compression
      while (get(c) != r) { val nxt = get(c); parent.put(c, r); c = nxt }
      r
    }
    pairArrays.foreach { arr =>
      var i = 0
      while (i < arr.length) {
        val a = arr(i); val b = arr(i + 1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        i += 2
      }
    }
    val out = new Array[(Long, Long)](parent.size)
    var i = 0
    val it = parent.keySet.iterator()
    while (it.hasNext) { val id = it.next().longValue(); out(i) = (id, find(id)); i += 1 }
    out
  }

  /** The distributed hash-to-min loop over the checkpointed directed
    * edges — the over-the-gate (100 TB) path, unchanged from r18. */
  private def hashToMin(dir: DataFrame, maxIter: Int): DataFrame = {
    // doubling is a cheap map over the cached partitions — recomputing it
    // per round costs nothing and avoids a second checkpoint action
    val und = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
    // round 1 fused into initialization: with identity starting labels the
    // first step is just min(self, neighbors) — one aggregation over und.
    // NOT checkpointed (r18): it executes exactly once, inside round 1's
    // materialization — its lineage is one aggregate over the checkpointed
    // und, and round 1's own checkpoint truncates it. The eager checkpoint
    // here was one whole driver job spent snapshotting a relation the next
    // job would have computed in-line anyway.
    var labels: DataFrame = und.groupBy("src")
      .agg(min("dst").as("__mind"))
      .select(col("src").as("id"),
        least(col("src"), col("__mind")).as("label"))
    // One hash-to-min step: each node takes the min label among itself and
    // its neighbors. The self row carries the previous label through the
    // same union + min-agg, so every output row has BOTH the new and the
    // prior label and the convergence probe is a filter — no second join
    // (labels only ever decrease, so "< previous" ⇔ changed).
    def step(ls: DataFrame): DataFrame = und
      .join(ls.select(col("id"), col("label")), col("dst") === col("id"))
      .select(col("src").as("id"), col("label"), lit(null).cast("long").as("self"))
      .unionAll(ls.select(col("id"), col("label"), col("label").as("self")))
      .groupBy("id")
      .agg(min("label").as("label"), min("self").as("prev"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // One step per round, and the convergence probe IS the
      // materialization job (r18 — measured on the bench box: each extra
      // driver action costs the ~0.1 s scheduling floor, which dominates a
      // round on small graphs). The checkpoint is LAZY: the full-scan
      // count() computes every partition, which caches them and truncates
      // lineage exactly like the old eager checkpoint + separate
      // limit-probe pair, in ONE job instead of two. One step per probe
      // (was two) is strictly correct — a labeling unchanged by one full
      // step satisfies label(v) ≤ label(u) on every edge in both
      // directions, i.e. labels are constant per component and the
      // component minimum keeps itself — and near-dup graphs (tiny
      // diameter, mostly pair/triangle clusters) converge in 1-2 steps,
      // so probing every step exits the loop with half the join/agg
      // rounds. maxIter still bounds total STEPS (the old loop counted
      // iter += 2 per double-step round).
      val stepped = step(labels).localCheckpoint(eager = false)
      // The probe is an RDD-level fold over the checkpointed internal rows
      // (schema (id, label, prev), ordinals 0/1/2): ONE single-stage job —
      // a DataFrame count() would plan a partial/final aggregate with its
      // own exchange round on every loop round. Computing the scan is what
      // materializes the lazy checkpoint (and truncates lineage at job
      // end). A null prev cannot occur (every node has a self row in ls),
      // but counts as changed defensively — worst case one extra round,
      // never a wrong early exit.
      val changed = stepped.queryExecution.toRdd.mapPartitions { it =>
        var c = 0L
        while (it.hasNext) {
          val r = it.next()
          if (r.isNullAt(2) || r.getLong(1) < r.getLong(2)) c += 1
        }
        Iterator.single(c)
      }.fold(0L)(_ + _)
      converged = changed == 0L
      labels = stepped.select("id", "label")
      iter += 1
    }
    labels.select("id", "label")
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the adversarial-graph path: converges in
    * O(log n) rounds on ANY graph, where hash-to-min needs
    * graph-diameter rounds (a 10⁶-node chain = 10⁶ rounds vs ~20).
    *
    * Round shape (all one exchange each, same posting-list machinery as
    * [[Postings]]): orient edges both ways, attach m(u) = min(N(u) ∪ u)
    * as a window min over the u-partitioned exchange, then
    *   large-star: re-link every neighbor v > u to m(u);
    *   small-star: re-link every neighbor v ≤ u (and u itself) to m(u).
    * The edge set monotonically contracts toward stars rooted at each
    * component's minimum; convergence = the round leaves the edge set
    * unchanged (count + order-independent checksum over the checkpointed
    * result — no join). Result contract matches [[connected]]. */
  def connectedStar(edges: DataFrame, aCol: String, bCol: String,
                    maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    var e = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    def sig(df: DataFrame): (Long, Long) = {
      // order-independent, overflow-free set checksum (ANSI-safe)
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def round(in: DataFrame, large: Boolean): DataFrame = {
      val und = in.select(col("u"), col("v"))
        .unionAll(in.select(col("v").as("u"), col("u").as("v")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      val withMin = und.withColumn("m", least(min(col("v")).over(w), col("u")))
      val relinked =
        if (large) withMin.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else withMin.filter(col("v") <= col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(withMin.select(col("u"), col("m").as("v")))
      relinked.filter(col("u") =!= col("v")).distinct()
    }

    var s = sig(e)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next = round(round(e, large = true), large = false).localCheckpoint()
      val ns = sig(next)
      converged = ns == s
      e = next; s = ns
      iter += 1
    }
    // converged edge set is a union of stars (v → component minimum);
    // roots appear only on the right side, so union them in as self-labels
    val members = e.select(col("u").as("id"), col("v").as("label"))
    val roots = e.select(col("v").as("id")).distinct().withColumn("label", col("id"))
    members.unionAll(roots)
      .groupBy("id").agg(min("label").as("label"))
  }

  /** Per-node cluster assignment with cluster sizes:
    * (id, cluster_id = min id in component, cluster_size) — the size is a
    * window count over one label-keyed exchange (no separate aggregate +
    * join-back; label groups are component-sized, trivially buffered). */
  def clusters(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = edges.sparkSession
    val (dir, small) = prepare(edges, aCol, bCol)
    small match {
      // r18/r19: below the gate the labeling is already on the driver —
      // counting label multiplicities there costs microseconds, where the
      // window below plans an exchange + sort job over a relation the
      // driver just built. prepare() hands the small path over explicitly
      // (no more logical-plan sniffing). Over the gate, unchanged.
      case Some(labels) =>
        val sizes = scala.collection.mutable.HashMap.empty[Long, Long]
        labels.foreach { case (_, l) => sizes.update(l, sizes.getOrElse(l, 0L) + 1L) }
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](labels.length)
        labels.foreach { case (id, l) =>
          rows.add(org.apache.spark.sql.Row(id, l, sizes(l)))
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_size", org.apache.spark.sql.types.LongType, nullable = false)))
        spark.createDataFrame(rows, schema)
      case None =>
        hashToMin(dir, maxIter = 50)
          .withColumn("cluster_size", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("label")))
          .select(col("id"), col("label").as("cluster_id"), col("cluster_size"))
    }
  }
}
