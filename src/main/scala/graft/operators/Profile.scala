package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StringType}

/** Generic one-pass column profiling — the data-quality primitive every
  * lake operation leans on before trusting a table (the `SUMMARIZE` /
  * `ANALYZE` shape, as a first-class operator over any DataFrame): row
  * count, per-column null count, distinct cardinality, numeric min/max,
  * lexicographic string min/max, and mean string length, in long format
  * (one row per profiled column) so downstream checks join on the column
  * name instead of pivoting a one-row wide frame.
  *
  * Everything folds in ONE aggregation over ONE scan: per-column
  * partials combine map-side, so the exchange carries a handful of
  * scalars per partition regardless of table size. Distinct cardinality
  * is the one knob with a real 100 TB trade:
  *
  *   - `exact = true` plans Spark's multi-distinct rewrite — an Expand
  *     that replicates each input row once per distinct-aggregated
  *     column before the partial agg. Correct at any scale but the scan
  *     amplifies by the profiled-column count; this is the
  *     oracle-checked regime (DuckDB `count(DISTINCT col)`).
  *   - `exact = false` (the 100 TB default) swaps in
  *     `approx_count_distinct` (HyperLogLog++, relative error `rsd`):
  *     no Expand, single-pass, the plan is identical to the non-distinct
  *     profile's. ProfileSpec pins the approximate cardinalities within
  *     rsd-tolerance of the exact ones AND the no-Expand plan shape.
  *
  * Min/max stay TYPED (numeric columns fill `min_num`/`max_num`,
  * strings fill `min_str`/`max_str`) — one long-format schema without
  * lossy casts, NULL where a measure does not apply.
  */
object Profile {

  /** Long-format profile of `cols` (default: every column) of `df`:
    * `(column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    * max_str, avg_len)`. One aggregation, one scan; see class doc for
    * the `exact` trade. */
  def profileOf(df: DataFrame, cols: Seq[String] = Nil,
                exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    require(names.forall(types.contains),
      s"profileOf: unknown column(s) ${names.filterNot(types.contains)}")

    def nullLong: Column = lit(null).cast(LongType)
    def nullDouble: Column = lit(null).cast(DoubleType)
    def nullString: Column = lit(null).cast(StringType)

    // one flat aggregate: every column contributes its measure exprs,
    // all partial-foldable — the exchange moves scalars, never rows
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: names.flatMap { n =>
        val c = col(n)
        val dist =
          if (exact) count_distinct(c)
          else approx_count_distinct(c, rsd)
        val (minN, maxN) = types(n) match {
          case _: NumericType =>
            (min(c).cast(DoubleType), max(c).cast(DoubleType))
          case _ => (nullDouble, nullDouble)
        }
        val (minS, maxS, avgL) = types(n) match {
          case StringType => (min(c), max(c), avg(length(c)))
          case _ => (nullString, nullString, nullDouble)
        }
        Seq(
          count(c).as(s"nn_$n"), dist.as(s"nd_$n"),
          minN.as(s"mn_$n"), maxN.as(s"mx_$n"),
          minS.as(s"ms_$n"), maxS.as(s"xs_$n"), avgL.as(s"al_$n"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the one-row frame to long format on the executors (a
    // single row — inline is metadata work, not a shuffle)
    val rows = names.map { n =>
      struct(
        lit(n).as("column"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$n")).as("n_null"),
        col(s"nd_$n").cast(LongType).as("n_distinct"),
        col(s"mn_$n").as("min_num"), col(s"mx_$n").as("max_num"),
        col(s"ms_$n").as("min_str"), col(s"xs_$n").as("max_str"),
        col(s"al_$n").as("avg_len"))
    }
    one.select(inline(array(rows: _*)))
  }

  // ------------------------------------------------- incremental profile

  /** One night's profile PARTIAL in long format — every measure a
    * member of a [[graft.sources.PointStore]] fold class: counts and
    * length mass are SUMs, numeric/string extremes are MINs/MAXes, and
    * distinct cardinality rides the mergeable
    * [[graft.functions.DistinctSketch]] (union-exact in the sparse
    * regime). Same one-aggregation/one-scan shape as [[profileOf]]. */
  def profilePartial(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    import graft.functions.SketchOps
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: names.flatMap { n =>
      val c = col(n)
      val (minN, maxN) = types(n) match {
        case _: NumericType =>
          (min(c).cast(DoubleType), max(c).cast(DoubleType))
        case _ => (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      }
      val (minS, maxS, sumL) = types(n) match {
        case StringType =>
          (min(c), max(c), sum(length(c)).cast(LongType))
        case _ => (lit(null).cast(StringType), lit(null).cast(StringType),
          lit(null).cast(LongType))
      }
      Seq(
        count(c).as(s"nn_$n"),
        SketchOps.distinctSketch(c, TextOps.DistinctP,
          TextOps.DistinctSparseCap).as(s"nd_$n"),
        minN.as(s"mn_$n"), maxN.as(s"mx_$n"),
        minS.as(s"ms_$n"), maxS.as(s"xs_$n"), sumL.as(s"sl_$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.map { n =>
      struct(
        lit(n).as("column"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$n")).as("n_null"),
        col(s"nd_$n").as("dsk"),
        col(s"mn_$n").as("min_num"), col(s"mx_$n").as("max_num"),
        col(s"ms_$n").as("min_str"), col(s"xs_$n").as("max_str"),
        col(s"sl_$n").as("sum_len"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** `profile_incremental`: the profiler as a PERSISTED nightly fold —
    * per-batch [[profilePartial]]s land in a PointStore keyed by column
    * name, exercising FOUR measure classes at once (sums for
    * counts/length mass, mins + maxes for the typed extremes, a
    * distinct sketch for cardinality), through real parquet
    * round-trips: batch boundaries, a compaction point, and an
    * at-least-once redelivery all invisible. Carries
    * [[profileDocumentsOracle]] — the hash match proves "profile night
    * A, profile night B, merge" ≡ "profile A∪B" for every measure
    * class, so a 100 TB table's profile is maintainable at O(delta)
    * nightly cost instead of a corpus re-scan. */
  def profileIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    val dir = DedupIndex.freshRunDir("graft_profile_inc_", d)
    val store = new graft.sources.PointStore(s, dir.getPath,
      keys = Seq("column"),
      sums = Seq("n_rows", "n_null", "sum_len"),
      maxes = Seq("max_num", "max_str"),
      sketches = Seq("dsk"),
      mins = Seq("min_num", "min_str"))
    val docs = graft.Tables.documents(s, d)
    def batch(m: Int) = profilePartial(docs.filter(col("doc_id") % 3 === m))
    store.appendTagged("b0", batch(0))
    store.appendTagged("b1", batch(1))
    store.compact()
    store.appendTagged("b2", batch(2))
    store.appendTagged("b2", batch(2)) // at-least-once redelivery: no-op
    deriveProfile(store.snapshot)
  }

  def profileIncrementalOracle: String = profileDocumentsOracle

  /** Derive the human-facing profile from a stored partial frame — the
    * read side shared by [[profileIncremental]] and [[profileDrift]]. */
  private def deriveProfile(stored: DataFrame): DataFrame = {
    import graft.functions.SketchOps
    stored.select(col("column"), col("n_rows"), col("n_null"),
      SketchOps.sketchEst(col("dsk")).as("n_distinct"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"),
      (col("sum_len") / (col("n_rows") - col("n_null"))).as("avg_len"))
  }

  /** `profile_drift`: the ALERTING face of the maintained profile —
    * "what changed when tonight folded in", answered from the store's
    * own version axis (no corpus re-scan, no second profile run): the
    * pre-night snapshot comes from [[graft.sources.PointStore
    * .snapshotAt]] time travel, the post-night from the live snapshot,
    * and the drift frame joins them per column. The monitoring
    * questions this feeds — a null-rate jump, cardinality growth
    * stalling (dedup upstream broke), document length collapsing
    * (extraction regressed) — are per-column deltas a threshold rule
    * reads directly. Exact longs subtract exactly; the avg columns
    * carry both endpoints rather than a lossy delta. Oracle replays
    * both profiles in DuckDB (the night-boundary WHERE reproduces the
    * store's fold points) and joins — hash-green proves time travel +
    * sketch merges land on the real drift, not an approximation of
    * it. */
  def profileDrift(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    val dir = DedupIndex.freshRunDir("graft_profile_drift_", d)
    val store = new graft.sources.PointStore(s, dir.getPath,
      keys = Seq("column"),
      sums = Seq("n_rows", "n_null", "sum_len"),
      maxes = Seq("max_num", "max_str"),
      sketches = Seq("dsk"),
      mins = Seq("min_num", "min_str"))
    val docs = graft.Tables.documents(s, d)
    store.appendTagged("n1", profilePartial(docs.filter(col("doc_id") % 3 =!= 2)))
    val preNight = store.version
    store.appendTagged("n2", profilePartial(docs.filter(col("doc_id") % 3 === 2)))
    driftBetween(store.snapshotAt(preNight), store.snapshot)
  }

  /** `drift_follower`: the same night-boundary drift as
    * [[profileDrift]], but maintained PUSH-shaped by a
    * [[graft.sources.DriftFollower]] — the upstream profile store takes
    * its two nightly folds, the follower polls after each (the first
    * poll establishes the baseline mirror, the second folds night-2's
    * changes and returns that window's drift), with the wrapper
    * REBUILT between polls so the registered path itself proves the
    * checkpoint lives in the tag ledger, not in memory. Carries
    * [[profileDriftOracle]]: hash-green means the O(changes) mirror
    * fold + the captured poll-boundary endpoints land on the exact
    * drift the on-demand two-snapshot read computes. */
  def driftFollowerQuery(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    val dir = DedupIndex.freshRunDir("graft_drift_follow_", d)
    val store = new graft.sources.PointStore(s, s"${dir.getPath}/up",
      keys = Seq("column"),
      sums = Seq("n_rows", "n_null", "sum_len"),
      maxes = Seq("max_num", "max_str"),
      sketches = Seq("dsk"),
      mins = Seq("min_num", "min_str"))
    val docs = graft.Tables.documents(s, d)
    store.appendTagged("n1", profilePartial(docs.filter(col("doc_id") % 3 =!= 2)))
    val f1 = new graft.sources.DriftFollower(s, store, s"${dir.getPath}/down")
    require(f1.poll().isEmpty, "baseline fold must not report drift")
    store.appendTagged("n2", profilePartial(docs.filter(col("doc_id") % 3 === 2)))
    val f2 = new graft.sources.DriftFollower(s, store, s"${dir.getPath}/down")
    f2.poll().getOrElse(sys.error("night-2 poll must report the window"))
  }

  /** Drift between two STORED profile frames (any two versions of a
    * [[profilePartial]]-shaped PointStore) — the reusable core of
    * [[profileDrift]], also served over the wire (`GET /drift`).
    * Refuses frames that are not profile-shaped by naming the missing
    * columns instead of failing downstream in the join. */
  private def requireProfileShaped(f: DataFrame, side: String): Unit = {
    val needed = Seq("column", "n_rows", "n_null", "dsk", "sum_len",
      "min_num", "max_num", "min_str", "max_str")
    val missing = needed.filterNot(f.columns.contains)
    require(missing.isEmpty,
      s"the '$side' frame is not a stored profile — " +
        s"missing column(s) ${missing.mkString(", ")}")
  }

  /** The human-facing profile derived from ONE stored frame (any version
    * of a [[profilePartial]]-shaped PointStore) — the absolute read
    * `GET /profile` serves beside `/drift`'s deltas. */
  def profileFromStored(stored: DataFrame): DataFrame = {
    requireProfileShaped(stored, "stored")
    deriveProfile(stored)
  }

  def driftBetween(storedFrom: DataFrame, storedTo: DataFrame): DataFrame = {
    Seq(storedFrom -> "from", storedTo -> "to").foreach { case (f, side) =>
      requireProfileShaped(f, side)
    }
    val from = deriveProfile(storedFrom)
      .select(col("column"), col("n_rows").as("f_rows"),
        col("n_null").as("f_null"), col("n_distinct").as("f_distinct"),
        col("avg_len").as("avg_len_from"))
    val to = deriveProfile(storedTo)
      .select(col("column"), col("n_rows").as("t_rows"),
        col("n_null").as("t_null"), col("n_distinct").as("t_distinct"),
        col("avg_len").as("avg_len_to"))
    from.join(to, Seq("column"))
      .select(col("column"),
        (col("t_rows") - col("f_rows")).as("n_rows_delta"),
        (col("t_null") - col("f_null")).as("n_null_delta"),
        (col("t_distinct") - col("f_distinct")).as("n_distinct_delta"),
        col("avg_len_from"), col("avg_len_to"))
  }

  /** The f/t/drift CTE block shared by [[profileDriftOracle]] and
    * [[driftGateOracle]] — both replay the two profiles at the night
    * boundary; the gate adds rule rows over the drift. */
  private def driftCtes: String = {
    def side(where: String, p: String) = {
      def block(n: String, isStr: Boolean) = {
        val sumL =
          if (isStr) s"CAST(sum(length($n)) AS BIGINT)" else "CAST(NULL AS BIGINT)"
        s"""SELECT '$n' AS "column", count(*) AS n_rows,
               count(*) - count($n) AS n_null,
               count(DISTINCT $n) AS n_distinct,
               $sumL AS sum_len
             FROM documents $where"""
      }
      s"""$p AS (
        ${Seq(block("doc_id", false), block("text", true), block("lang", true),
              block("source", true), block("n_chars", false))
          .mkString("\nUNION ALL\n")})"""
    }
    s"""WITH ${side("WHERE doc_id % 3 <> 2", "f")},
         ${side("", "t")},
         drift AS (
    SELECT f."column",
           t.n_rows - f.n_rows AS n_rows_delta,
           t.n_null - f.n_null AS n_null_delta,
           t.n_distinct - f.n_distinct AS n_distinct_delta,
           CAST(f.sum_len AS DOUBLE) / (f.n_rows - f.n_null) AS avg_len_from,
           CAST(t.sum_len AS DOUBLE) / (t.n_rows - t.n_null) AS avg_len_to
    FROM f JOIN t USING ("column"))"""
  }

  def profileDriftOracle: String =
    s"$driftCtes SELECT * FROM drift"

  /** The registered drift CONTRACT — one `NoViolation` per monitoring
    * question the drift frame exists to answer. Shared by the Spark
    * query and (as SQL predicates) the oracle; a NULL predicate (the
    * avg columns on numeric rows) counts as no violation on both
    * engines. */
  private def driftRules: Seq[(String, Column, String)] = Seq(
    // a nightly fold that ingested docs must grow every column's count
    ("rows_grew", col("n_rows_delta") <= 0, "n_rows_delta <= 0"),
    // nulls growing faster than rows = the extractor started dropping
    // a field
    ("null_surge", col("n_null_delta") > col("n_rows_delta"),
      "n_null_delta > n_rows_delta"),
    // the PK's cardinality must track ingest — stalling means upstream
    // dedup (or the id mint) broke
    ("cardinality_stalled",
      col("column") === "doc_id" && col("n_distinct_delta") <= 0,
      "\"column\" = 'doc_id' AND n_distinct_delta <= 0"),
    // mean document length halving overnight = extraction regressed
    ("len_collapse", col("avg_len_to") < col("avg_len_from") * 0.5,
      "avg_len_to < avg_len_from * 0.5"))

  /** `drift_gate`: the drift frame THRESHOLDED — [[profileDrift]]
    * composed into [[checkRules]], so the alerting face ends in the
    * same long-format `(rule, observed, passed)` report the ingest
    * gates emit and the three union into one nightly go/no-go. The
    * rules are drift-shaped ([[driftRules]]): counts that shrank, null
    * surges, PK cardinality stalling, mean-length collapse. One
    * column-grain agg over the O(columns) drift frame — the gate costs
    * nothing beyond the drift it reads. */
  def checkDrift(drift: DataFrame): DataFrame =
    checkRules(drift, driftRules.map { case (n, v, _) => NoViolation(n, v) })

  def driftGate(s: SparkSession, d: String): DataFrame =
    checkDrift(profileDrift(s, d))

  def driftGateOracle: String = {
    val ruleRows = driftRules.map { case (n, _, sql) =>
      s"""SELECT '$n' AS rule,
             CAST(count(*) FILTER (WHERE $sql) AS BIGINT) AS observed,
             count(*) FILTER (WHERE $sql) = 0 AS passed
           FROM drift""" }
    s"$driftCtes ${ruleRows.mkString("\nUNION ALL\n")}"
  }

  // ------------------------------------------------------- expectations

  /** A declarative data contract over one table — the gate a 100 TB
    * ingest runs before anything downstream trusts the drop. */
  sealed trait Rule { def name: String }
  /** Passes when NO row satisfies `violation`; `observed` reports the
    * violating-row count (sum of a 0/1 flag — partial-foldable). */
  final case class NoViolation(name: String, violation: Column) extends Rule
  /** Passes when `cols` form a key: distinct(cols) == rows holding a
    * fully non-null key tuple. NULL-keyed rows are EXCLUDED from both
    * sides — a missing key is [[NoViolation]](key IS NULL)'s finding,
    * not a duplicate (the same convention [[checkRef]] uses for
    * orphans); counting them here would also diverge from the SQL
    * convention (`count(DISTINCT col)` ignores NULLs while Spark's
    * `count_distinct(struct(col))` counts the null tuple once). Exact
    * count-distinct (the multi-distinct Expand price — a key check that
    * is only probably true is not a key check). */
  final case class Unique(name: String, cols: Seq[String]) extends Rule

  /** Evaluate a rule set in ONE aggregation over ONE scan — same fold
    * discipline as [[profileOf]]: the exchange carries one counter per
    * rule. Output long-format `(rule, observed, passed)`: `observed` is
    * the violation count (NoViolation) or the duplicate count over
    * non-null key tuples (Unique), `passed` ⇔ observed == 0 — so a green gate is exactly
    * "every rule row reads (r, 0, true)" and a red one names its rule
    * and its magnitude. Rows stream nowhere; a failing gate re-queries
    * the violating rows with the rule's own predicate when a human
    * wants examples. */
  def checkRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "checkRules: empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "checkRules: duplicate rule names")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: rules.flatMap {
      case NoViolation(n, v) => Seq(
        coalesce(sum(when(v, lit(1L)).otherwise(lit(0L))), lit(0L)).as(s"r_$n"))
      case Unique(n, cs) =>
        // null-keyed rows leave BOTH counters: the when() yields a NULL
        // struct (not a struct of nulls), which count/count_distinct skip
        val allSet = cs.map(col(_).isNotNull).reduce(_ && _)
        Seq(count_distinct(when(allSet, struct(cs.map(col): _*))).as(s"r_$n"),
          count(when(allSet, lit(1L))).as(s"rn_$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      val observed = r match {
        case _: NoViolation => col(s"r_${r.name}")
        case _: Unique      => col(s"rn_${r.name}") - col(s"r_${r.name}")
      }
      struct(lit(r.name).as("rule"), observed.as("observed"),
        (observed === 0L).as("passed"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Cross-table contract: every `childKeys` tuple in `child` must
    * exist in `parent`'s `parentKeys` — referential integrity, the
    * constraint a lake cannot declare and therefore must CHECK (no
    * engine enforces FKs over parquet). Long-format like [[checkRules]]
    * (`observed` = orphaned child rows), so the two gates union into
    * one report. Plan: a LEFT ANTI join on the key tuple feeding a
    * count — null-safe on the child side (a NULL key is not an orphan,
    * it is `NoViolation(key present)`'s job, the SQL FK convention).
    * Join policy is the caller's scale statement: `broadcastParent =
    * false` (default — the parent GROWS with the corpus, orders/part/
    * customer) pins a shuffled anti join moving 8-byte key tuples only
    * (columns pruned at the scan — neither payload moves), then
    * partial-aggregates to ONE row; `true` (fixed-size dims like
    * nation/region) broadcasts the parent key set instead. */
  def checkRef(name: String, child: DataFrame, childKeys: Seq[String],
               parent: DataFrame, parentKeys: Seq[String],
               broadcastParent: Boolean = false): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size,
      s"checkRef($name): key lists must be non-empty and equal-length")
    val c = child.select(childKeys.map(col): _*)
      .filter(childKeys.map(k => col(k).isNotNull).reduce(_ && _))
    val p0 = parent.select(parentKeys.zip(childKeys).map {
      case (pk, ck) => col(pk).as(ck) }: _*)
    val p = if (broadcastParent) broadcast(p0) else p0.hint("shuffle_hash")
    val orphans = c.join(p, childKeys, "left_anti")
      .agg(count(lit(1)).as("observed"))
    orphans.select(lit(name).as("rule"), col("observed"),
      (col("observed") === 0L).as("passed"))
  }

  /** `fk_gate`: the registered cross-table contract over the TPC-H-ish
    * tables — the FK spine a warehouse load verifies every drop:
    * lineitem→orders→customer→nation→region, plus lineitem→part/
    * supplier. Each edge one anti-join counter; the report unions with
    * [[checkRules]]' shape. */
  def fkGate(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    val li = Tables.lineitem(s, d); val ord = Tables.orders(s, d)
    Seq(
      checkRef("lineitem_orders", li, Seq("l_orderkey"),
        ord, Seq("o_orderkey")),
      checkRef("lineitem_part", li, Seq("l_partkey"),
        Tables.part(s, d), Seq("p_partkey")),
      checkRef("lineitem_supplier", li, Seq("l_suppkey"),
        Tables.supplier(s, d), Seq("s_suppkey")),
      checkRef("orders_customer", ord, Seq("o_custkey"),
        Tables.customer(s, d), Seq("c_custkey")),
      checkRef("customer_nation", Tables.customer(s, d), Seq("c_nationkey"),
        Tables.nation(s, d), Seq("n_nationkey"), broadcastParent = true),
      checkRef("nation_region", Tables.nation(s, d), Seq("n_regionkey"),
        Tables.region(s, d), Seq("r_regionkey"), broadcastParent = true)
    ).reduce(_ unionByName _)
  }

  def fkGateOracle: String = {
    def edge(n: String, c: String, ck: String, p: String, pk: String) = s"""
      SELECT '$n' AS rule,
             CAST(count(*) AS BIGINT) AS observed,
             count(*) = 0 AS passed
      FROM $c WHERE $ck IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM $p WHERE $pk = $ck)"""
    Seq(
      edge("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("nation_region", "nation", "n_regionkey", "region", "r_regionkey")
    ).mkString("\nUNION ALL\n")
  }

  /** `quality_gate`: the registered contract over `documents` — the
    * checks an LLM-corpus ingest actually runs: primary key, required
    * fields, language whitelist, length sanity, text/metadata
    * consistency. Oracle replays each rule as plain SQL. */
  def qualityGate(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    checkRules(docs, Seq(
      Unique("doc_id_is_key", Seq("doc_id")),
      NoViolation("doc_id_present", col("doc_id").isNull),
      NoViolation("text_present", col("text").isNull || length(col("text")) === 0),
      NoViolation("lang_known",
        !col("lang").isin(KnownLangs: _*) || col("lang").isNull),
      NoViolation("n_chars_consistent",
        col("n_chars").isNull || col("n_chars") =!= length(col("text"))),
      NoViolation("source_present", col("source").isNull)))
  }

  /** The language whitelist the gate enforces — the testdata generator's
    * own lang universe. */
  val KnownLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh", "ja")

  def qualityGateOracle: String = {
    val langs = KnownLangs.map(l => s"'$l'").mkString(", ")
    s"""
    SELECT 'doc_id_is_key' AS rule,
           count(doc_id) - count(DISTINCT doc_id) AS observed,
           count(doc_id) - count(DISTINCT doc_id) = 0 AS passed FROM documents
    UNION ALL
    SELECT 'doc_id_present',
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0 FROM documents
    UNION ALL
    SELECT 'text_present',
           CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) = 0 FROM documents
    UNION ALL
    SELECT 'lang_known',
           CAST(sum(CASE WHEN lang NOT IN ($langs) OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN lang NOT IN ($langs) OR lang IS NULL THEN 1 ELSE 0 END) = 0 FROM documents
    UNION ALL
    SELECT 'n_chars_consistent',
           CAST(sum(CASE WHEN n_chars IS NULL OR n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN n_chars IS NULL OR n_chars <> length(text) THEN 1 ELSE 0 END) = 0 FROM documents
    UNION ALL
    SELECT 'source_present',
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) = 0 FROM documents"""
  }

  /** `profile_documents`: the registered face — exact-regime profile of
    * every `documents` column, hash-checked against DuckDB's
    * per-column `count/count(DISTINCT)/min/max/avg(length)`. */
  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profileOf(graft.Tables.documents(s, d), exact = true)

  def profileDocumentsOracle: String = {
    def block(n: String, numeric: Boolean, isStr: Boolean) = {
      val minN = if (numeric) s"CAST(min($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxN = if (numeric) s"CAST(max($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val minS = if (isStr) s"min($n)" else "CAST(NULL AS VARCHAR)"
      val maxS = if (isStr) s"max($n)" else "CAST(NULL AS VARCHAR)"
      val avgL = if (isStr) s"avg(length($n))" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$n' AS "column", count(*) AS n_rows,
             count(*) - count($n) AS n_null,
             count(DISTINCT $n) AS n_distinct,
             $minN AS min_num, $maxN AS max_num,
             $minS AS min_str, $maxS AS max_str, $avgL AS avg_len
           FROM documents"""
    }
    Seq(
      block("doc_id", numeric = true, isStr = false),
      block("text", numeric = false, isStr = true),
      block("lang", numeric = false, isStr = true),
      block("source", numeric = false, isStr = true),
      block("n_chars", numeric = true, isStr = false)
    ).mkString("\nUNION ALL\n")
  }
}
