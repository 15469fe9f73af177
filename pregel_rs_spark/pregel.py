"""Pregel — the BSP superstep engine, Spark-first.

Semantics parity with /root/reference/src/pregel.rs (builder API, triplet
dataflow, column namespace, defaults), execution re-designed for Spark:

  one superstep  =  triplet build (2 equi-joins)
                 →  message projection (user exprs, per SendMessage)
                 →  message aggregation (groupBy receiver + user agg)
                 →  state apply (left join + v_prog)
                 →  state update (re-attach static vertex props)
                 →  eager ``localCheckpoint`` (lineage truncation — the Spark
                    analogue of the reference's per-superstep ``collect()``,
                    pregel.rs:866-867)

Dataflow parity map (reference → here):
  * prefix namespacing ``subject.* / edge.* / object.*`` (pregel.rs:756-808)
    → literal dotted Spark column names, all inside Catalyst.
  * receiver exprs: Subject → ``subject.vertex_id``, Object → ``edge.object``
    (pregel.rs:183-198).
  * aggregated messages surface as ``_pregel_msg_``; vertices that received
    no message see NULL (reference full-join behaviour, pregel.rs:838-854) —
    preserved exactly (fixture F6).
  * defaults: ``max_iterations=10``, ``vertex_column="aux"``
    (pregel.rs:385-395).

Deliberate divergences (documented in SURVEY §5.3):
  * Q1 — chained ``send_messages`` are a UNION of message frames
    (GraphFrames semantics); the reference silently drops all but the first.
  * Q3 — optional convergence checking (tolerance-based early stop); the
    reference has none (TODO at pregel.rs:784).
  * multi-column state via ``with_state_column`` (reference supports one).

Scale design (10^12-doc / 100 TB):
  * edges are repartitioned by ``subject`` once and persisted — superstep
    join #1 reuses that partitioning every iteration (no edge re-shuffle).
  * message aggregation relies on Spark's map-side partial aggregation
    (hub receivers collapse to ≤ numPartitions partial rows before the
    shuffle); an explicit salted two-phase path is available via
    ``with_salted_aggregation`` for non-algebraic cases.
  * AQE skew-join handles hub-vertex skew in the triplet joins; turn on
    ``spark.sql.adaptive.skewJoin.enabled`` (see session defaults in
    pregel_rs_spark.sources.io.get_spark).
  * per-superstep plan truncation (``truncate_plan``: localCheckpoint +
    stats-free LogicalRDD re-wrap) bounds both RDD lineage AND driver-side
    Catalyst work at O(1) per superstep instead of O(3^supersteps) — see
    ``truncate_plan`` for the measured pathology.
"""

from __future__ import annotations

import inspect
import os
import sys
import time
import warnings
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pregel_rs_spark.columns import (
    MSG,
    OBJECT,
    PREGEL_MSG,
    SUBJECT,
    VERTEX_ID,
    alias,
)

ExprLike = Union[Column, Callable[..., Column]]
MSG_VERTEX_ID = alias(MSG, VERTEX_ID)  # "msg.vertex_id"


def _q(name: str) -> Column:
    return F.col(f"`{name}`")


def _agg_function_name(col: Column) -> Optional[str]:
    """Top-level aggregate function name of a Column expression, or None.

    Reads the column's internal node tree (Alias → UnresolvedFunction
    .functionName()) — structural, not a string sniff of the repr.  Returns
    None for forms it can't identify (e.g. ``F.expr("sum(x)")`` SQL text,
    arithmetic over aggregates) — callers must then reject or handle."""
    try:
        node = col._jc.node()
        if node.getClass().getSimpleName() == "Alias":
            node = node.child()
        if node.getClass().getSimpleName() == "UnresolvedFunction":
            return str(node.functionName()).lower()
    except Exception:
        pass
    return None


# final-phase combiner per partial-aggregate function: partial counts combine
# by SUM (count-of-counts would count salt groups, not messages); sum/min/max
# are idempotently re-combinable.  Anything else (avg, collect_list, …) is
# not decomposable this way and is rejected loudly.
_SALT_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

# SparkSessions with a Pregel loop currently active (the loop scopes
# session-level SQL configs; a second concurrent loop fails fast — see
# Pregel.run).  id() keys are safe: the session object is referenced by the
# running loop for the entry's whole lifetime.
_ACTIVE_LOOP_SESSIONS: set[int] = set()


def _referenced_names(df_schema_probe: DataFrame, exprs: list[Column]) -> set[str]:
    """Exact column names an expression list reads, via Catalyst analysis.

    The expressions are resolved against ``df_schema_probe`` (an EMPTY frame
    carrying the full triplet schema — analysis only, no job) and the
    analyzed Project's attribute references are collected.  Robust where
    repr-sniffing is not: wrapped UDFs, ``F.expr`` SQL text, and Column-repr
    changes across Spark versions all resolve to real attribute references.
    """
    jdf = df_schema_probe.select(*exprs)._jdf
    refs = jdf.queryExecution().analyzed().references().iterator()
    names: set[str] = set()
    while refs.hasNext():
        names.add(str(refs.next().name()))
    return names


def truncate_plan(df: DataFrame, preserve_partitioning: bool = True) -> DataFrame:
    """Materialize ``df`` and return a DataFrame whose plan is a bare
    ``LogicalRDD`` scan — the iterative-lineage barrier.

    ``preserve_partitioning`` decides whether the rewrap ADVERTISES the
    checkpoint's hash partitioning to Catalyst:

    * single-JVM (``local[n]``): True.  Every cached/checkpointed block is
      in-process, so claiming the partitioning lets the next superstep's
      joins run with ZERO exchange — the measured optimum.
    * multi-executor (``local-cluster``/``spark://``/YARN/K8s): False.
      Claiming the partitioning suppresses the exchange, which forces each
      join task to read its state partition from whichever executor
      localCheckpointed it — a per-superstep remote fetch of whole
      DESERIALIZED blocks through Java serialization (measured ~8× step
      blowup at 4 executors vs single).  Letting Catalyst re-exchange the
      state instead streams it through the netty shuffle path (compact
      UnsafeRow binary), and the reduce tasks — whose only remaining
      locality preference is the sorted edge cache — get scheduled AT the
      edge blocks.  This is exactly the GraphX/GraphFrames layout: edges
      stay put, vertex state flows over the shuffle each superstep.

    Why not plain ``localCheckpoint``: since Spark 3.4 (SPARK-39748) the
    ``LogicalRDD`` produced by ``Dataset.checkpoint`` carries ``originStats``
    / ``originConstraints`` lazily referencing the *origin plan*.  In an
    iterative loop where each superstep references the previous state k
    times (here 3×: subject side, object side, apply side), driver-side
    stats estimation (``SizeInBytesOnlyStatsPlanVisitor``, reached from
    ``InjectRuntimeFilter`` et al.) recurses through the entire checkpoint
    history — O(3^superstep).  Measured on this engine: superstep wall time
    flat at ~1 s until superstep ~15, then ×2.5 per superstep (41 s at
    superstep 20).  Wrapping the materialized RDD in a fresh stats-free
    ``LogicalRDD`` (via ``internalCreateDataFrame``) keeps every superstep
    O(1) on the driver — verified flat for 30+ supersteps.

    ``localCheckpoint`` still does the heavy lifting (safe row copies,
    RDD-lineage truncation, MEMORY_AND_DISK blocks); we only re-wrap its
    result.  Falls back to the plain checkpointed frame if the internal
    constructor is unavailable (e.g. Spark Connect).
    """
    # SERIALIZED block storage (python StorageLevel.MEMORY_AND_DISK has
    # deserialized=False; the Spark-default MEMORY_AND_DISK_DESER stores one
    # Java object per row — millions of heap objects churned per superstep,
    # measured as 30-60% GC time in 20g executors).  UnsafeRow serializes as
    # a flat byte copy, so the write is cheap and the per-superstep state
    # lives as a handful of big byte buffers instead.
    from pyspark.storagelevel import StorageLevel

    ck = df.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    try:
        spark = df.sparkSession
        jvm = spark.sparkContext._jvm
        lr = ck._jdf.queryExecution().analyzed()  # the checkpoint LogicalRDD
        none = getattr(jvm.scala, "None$").__getattr__("MODULE$")
        # Eagerly evaluate the checkpoint's origin statistics and pass them
        # through as a CONSTANT.  The O(3^superstep) pathology came from
        # *lazy* origin stats recursing through the whole checkpoint
        # history; because the previous state's rewrap already carries
        # constant stats, this evaluation visits one superstep's plan only
        # — and the planner keeps honest sizes (so it can pick broadcast /
        # shuffled-hash builds for the small vertex state instead of
        # treating it as infinitely large).
        try:
            raw_stats = lr.stats()
            # Clamp astronomically-large estimates.  Catalyst's join size
            # estimation MULTIPLIES child sizeInBytes bounds, so a loop
            # whose superstep is join+project only (no aggregate to reset
            # the bound — e.g. pointer doubling) SQUARES the BigInt every
            # round: measured 2.2e19762292 bytes (20 M digits) by round 20,
            # at which point BigInt arithmetic inside the stats visitor —
            # not the job — costs 20 s/round, doubling each round.  Any
            # estimate beyond int64 carries zero planning information
            # (every threshold comparison already says "huge"), so cap at
            # the session's defaultSizeInBytes and drop the equally-
            # inflated rowCount/column stats.  Sane estimates pass through
            # untouched.  Pinned by test_truncate_plan_stats_clamped.
            if raw_stats.sizeInBytes().bitLength() > 63:
                cap = jvm.scala.math.BigInt.apply(
                    spark._jsparkSession.sessionState().conf()
                    .defaultSizeInBytes()
                )
                raw_stats = (
                    jvm.org.apache.spark.sql.catalyst.plans.logical
                    .Statistics(cap, none, raw_stats.attributeStats(), False)
                )
            const_stats = jvm.scala.Some(raw_stats)
        except Exception:
            const_stats = none
        # Re-create the LogicalRDD with originStats/originConstraints = None
        # (kills the recursion) while KEEPING outputPartitioning and
        # outputOrdering.  Because Dataset.localCheckpoint preserves the
        # physical plan's partitioning, and the superstep's final join runs
        # hash-partitioned on vertex_id, the re-wrapped state *stays*
        # hash-partitioned on vertex_id across supersteps — the triplet
        # subject side and the apply join then need NO state re-shuffle
        # (LogicalRDD.newInstance remaps the partitioning expr-ids on
        # self-join dedup, so both uses keep the property).
        if preserve_partitioning:
            out_part = lr.outputPartitioning()
            out_ord = lr.outputOrdering()
        else:
            out_part = (
                jvm.org.apache.spark.sql.catalyst.plans.physical
                .UnknownPartitioning(0)
            )
            out_ord = getattr(
                jvm.scala.collection.immutable, "Nil$"
            ).__getattr__("MODULE$")
        new_lr = jvm.org.apache.spark.sql.execution.LogicalRDD(
            lr.output(),
            lr.rdd(),
            out_part,
            out_ord,
            False,
            none,
            spark._jsparkSession,
            const_stats,
            none,
        )
        new_jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, new_lr
        )
        out = DataFrame(new_jdf, spark)
        # Handle to the materialized blocks: DataFrame.unpersist() on the
        # rewrapped frame is a no-op (it was never cached through the
        # CacheManager), so the loop frees the previous superstep's blocks
        # through this RDD handle instead of waiting for the JVM GC /
        # ContextCleaner to notice — keeps peak storage at ~2 states.
        out._ck_rdd = lr.rdd()
        return out
    except Exception as ex:  # pragma: no cover - exercised only on Spark bumps
        # The rewrap touches Spark-internal constructors (LogicalRDD 9-arg,
        # classic.Dataset.ofRows) that can change on a minor bump.  Falling
        # back to the plain checkpoint silently restores the O(3^superstep)
        # driver-stats pathology AND loses the _ck_rdd unpersist handle —
        # warn loudly (once) so a perf regression is diagnosable.
        global _TRUNCATE_FALLBACK_WARNED
        if not _TRUNCATE_FALLBACK_WARNED:
            _TRUNCATE_FALLBACK_WARNED = True
            warnings.warn(
                "truncate_plan: stats-free LogicalRDD rewrap failed "
                f"({type(ex).__name__}: {ex}); falling back to plain "
                "localCheckpoint. Iterative jobs will slow down superstep by "
                "superstep (lazy origin-stats recursion) and checkpoint "
                "blocks are freed only by GC. Pin the rewrap against this "
                "Spark version (tests/test_pregel.py::test_truncate_plan_rewrap).",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck


_TRUNCATE_FALLBACK_WARNED = False


class MessageReceiver(Enum):
    """Who receives a message generated on a triplet (pregel.rs:156-171)."""

    SUBJECT = "subject"
    OBJECT = "object"

    def receiver_expr(self) -> Column:
        # Reference (pregel.rs:188-191) reads the subject id from the
        # subject-side vertex columns and the object id from the edge
        # columns; the values are identical by the join equality, and using
        # the edge-side columns for BOTH lets the engine drop an unused
        # vertex-side join entirely (closed-world graphs).
        if self is MessageReceiver.SUBJECT:
            return _q(alias("edge", SUBJECT))
        return _q(alias("edge", OBJECT))


@dataclass
class SendMessage:
    """One (receiver, payload) message spec (pregel.rs:153-198)."""

    receiver: MessageReceiver
    payload: ExprLike


@dataclass
class StateColumn:
    """An additional evolving vertex-state column (extension: the reference
    supports exactly one, pregel.rs:859-865 / SURVEY Q4).

    ``v_prog`` is evaluated against the pre-update state (all state columns
    hold their previous values) plus ``_pregel_msg_`` — synchronous BSP
    semantics, same as the primary column."""

    name: str
    initial: ExprLike
    v_prog: ExprLike


@dataclass
class SuperstepMetrics:
    superstep: int
    wall_seconds: float
    vertices: int
    delta: Optional[float] = None
    changed: Optional[int] = None
    messages: Optional[int] = None


@dataclass
class PregelContext:
    """Passed to closure-valued expressions that accept one argument —
    enables iteration-dependent programs (reference: ``FnBox`` closures
    re-evaluated per superstep, pregel.rs:543-551, 590-596, 634-637)."""

    superstep: int
    state: Optional[DataFrame] = None
    # scalar statistics computed over the *current* state by the previous
    # superstep's stats action (or the pre-loop bootstrap) — lets vertex
    # programs consume global aggregates (e.g. PageRank dangling mass)
    # without issuing their own per-superstep Spark action.
    stats: dict = field(default_factory=dict)

    @staticmethod
    def stat_col(name: str) -> Column:
        """Reference a ``with_state_stat`` scalar inside v_prog as a COLUMN.

        The engine injects the scalars via a broadcast one-row frame, so the
        superstep plan is byte-identical across iterations — baking the
        value in as ``F.lit(ctx.stats[name])`` instead changes the generated
        code every superstep and forces a fresh whole-stage-codegen JIT
        compile per iteration (measured ~4.7 s/superstep of pure
        recompilation on a 60M-edge PageRank).
        """
        return F.col(f"`__stat_{name}__`")


def _resolve(expr: ExprLike, ctx: PregelContext) -> Column:
    if isinstance(expr, Column):
        return expr
    if callable(expr):
        params = inspect.signature(expr).parameters
        return expr(ctx) if len(params) >= 1 else expr()
    raise TypeError(f"expected Column or callable -> Column, got {type(expr)}")


@dataclass
class Pregel:
    """Configured engine; produced by :class:`PregelBuilder` (pregel.rs:240-273)."""

    graph: "GraphFrame"
    max_iterations: int = 10
    vertex_column: str = "aux"
    initial_message: Optional[ExprLike] = None
    send_messages: list[SendMessage] = field(default_factory=list)
    aggregate_expr: Optional[ExprLike] = None
    v_prog: Optional[ExprLike] = None
    # -- extensions over the reference --
    tolerance: Optional[float] = None       # numeric L∞ early stop
    check_exact: bool = False               # stop when no value changes
    checkpoint_store: Optional[object] = None  # plans.checkpoint.CheckpointStore
    checkpoint_interval: int = 0            # 0 = only on finish
    salted_agg_partials: int = 0            # >0: explicit two-phase salted agg
    message_counts: bool = False            # per-superstep message totals
    # (metrics.messages); widens every shuffled partial-agg row by a long,
    # so off unless requested — checkpoint manifests turn it on implicitly.
    # named scalar aggregates evaluated over the state in the SAME stats
    # action that measures convergence — surfaced to the next superstep's
    # closures via ctx.stats (no extra Spark jobs).
    state_stats: dict[str, Column] = field(default_factory=dict)
    # additional evolving state columns beyond ``vertex_column`` (Q4
    # extension); each updates synchronously from the pre-update state.
    extra_state: list[StateColumn] = field(default_factory=list)
    # voting-to-halt sugar: predicate over the SUBJECT-side triplet
    # columns; only vertices satisfying it send messages this superstep.
    # All vertices still receive + run v_prog (NULL message if nothing
    # arrives) — this shrinks the send/shuffle side, not the state.
    active_filter: Optional[ExprLike] = None
    # AQE inside the superstep loop (default off): the loop's partitioning
    # is fixed and uniform per iteration, so adaptive re-planning only adds
    # per-stage scheduling latency AND defeats exchange reuse; hub skew is
    # handled by salting / map-side partial aggregation.  Opt back in for
    # exploratory runs with wildly skewed unknown inputs.
    adaptive: bool = False
    # reference Q1 emulation (pregel.rs:825-834): the reference aliases every
    # chained send to the same two output names, so only the FIRST send's
    # messages survive the select — opt in to reproduce that exactly.
    # Default (False) = union semantics (GraphFrames-style, documented
    # divergence SURVEY §5.3).
    first_send_only: bool = False
    # edges already arrive hash-clustered on ``subject`` (e.g. a bucketed
    # table scan — sources/bucketed.py): skip the loop's one-time
    # repartition so the 100 TB edge table is never shuffled at job start
    # at all.  Safe either way: if the claim is wrong, the superstep join
    # plans its own Exchange (slower, never incorrect).
    edges_prepartitioned: bool = False
    metrics: list[SuperstepMetrics] = field(default_factory=list)

    # ------------------------------------------------------------------ run --
    def run(self, resume: bool = False) -> DataFrame:
        """Execute the superstep loop; returns the final vertices frame
        ``(vertex props…, vertex_column)`` (pregel.rs:751-873).

        Note: for the duration of the loop the SESSION-level configs
        ``spark.sql.adaptive.enabled`` and ``autoBroadcastJoinThreshold``
        are overridden (restored on exit) — do not run concurrent queries
        on the same SparkSession while a Pregel loop is active; use a
        separate session (``spark.newSession()``) for side work.  Two
        concurrent Pregel loops on one session would restore each other's
        overrides out of order and silently run with the wrong join
        strategy, so that case fails fast here."""
        if self.initial_message is None or self.aggregate_expr is None \
                or self.v_prog is None or not self.send_messages:
            raise ValueError(
                "Pregel needs initial_message, ≥1 send_messages, "
                "aggregate_messages and v_prog"
            )
        spark = self.graph.vertices.sparkSession
        sess_key = id(spark)
        if sess_key in _ACTIVE_LOOP_SESSIONS:
            raise RuntimeError(
                "another Pregel loop is already running on this "
                "SparkSession (the loop scopes session-level SQL configs); "
                "run it on spark.newSession() instead"
            )
        _ACTIVE_LOOP_SESSIONS.add(sess_key)
        # outer snapshot/restore also covers exceptions thrown during plan
        # PREP (e.g. a payload that fails Catalyst analysis) — those happen
        # before the loop's own try/finally is entered
        scoped = ("spark.sql.adaptive.enabled",
                  "spark.sql.autoBroadcastJoinThreshold")
        prev = {k: spark.conf.get(k, None) for k in scoped}
        try:
            return self._run_locked(resume)
        finally:
            _ACTIVE_LOOP_SESSIONS.discard(sess_key)
            for k, v in prev.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)

    def _run_locked(self, resume: bool) -> DataFrame:
        vertices = self.graph.vertices
        vcol = self.vertex_column
        spark = vertices.sparkSession
        # Single-JVM runs keep state partitioning across supersteps (zero
        # exchange); multi-executor runs re-exchange state each superstep
        # instead of remote-fetching checkpoint blocks — see truncate_plan.
        single_jvm = spark.sparkContext.master.startswith("local[")
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", str(self.adaptive).lower())
        # Join strategy inside the loop: every join is already co-partitioned
        # (pre-shuffled sorted edge cache; state partitioning preserved
        # through the checkpoint rewrap; aggregated messages come out of the
        # groupBy hash-partitioned) — so a broadcast join can never save a
        # shuffle here, it only adds a driver-side collect+broadcast of a
        # join side each superstep.  Catalyst's row-count estimates for the
        # aggregated-message side are unreliable enough that it DID pick
        # broadcast at 120M-edge scale (6M-row broadcast per superstep,
        # ~5× superstep blowup) — so broadcasts are disabled for the loop
        # and restored after.  Forcing shuffled-hash was likewise tried and
        # rejected (multi-million-row hash build per superstep + JIT churn);
        # plain sort-merge over the pre-sorted sides wins.
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # Edges: prefix once, repartition by the join key once, pre-sort
        # within partitions (sort-merge join then skips re-sorting the edge
        # side every superstep), persist — no edge re-shuffle per iteration.
        edges = self.graph.edges.select(
            *[F.col(c).alias(alias("edge", c)) for c in self.graph.edges.columns]
        )
        edge_key = _q(alias("edge", SUBJECT))
        if self.edges_prepartitioned:
            # caller guarantees hash clustering on subject (bucketed scan):
            # only the exchange-free within-partition sort remains.
            edges = edges.sortWithinPartitions(edge_key).persist()
        else:
            edges = (
                edges.repartition(edge_key)
                .sortWithinPartitions(edge_key)
                .persist()
            )
        edges.count()  # materialize the cache now, not inside superstep 1

        start_step = 1
        current = None
        if resume and self.checkpoint_store is not None:
            resumed = self.checkpoint_store.latest()
            if resumed is not None:
                start_step, current = resumed
                start_step += 1

        if current is None:
            # Superstep 0: attach the initial state column(s) (pregel.rs:769-777).
            ctx0 = PregelContext(superstep=0, state=vertices)
            init = _resolve(self.initial_message, ctx0)
            current = vertices.select(
                "*",
                init.alias(vcol),
                *[
                    _resolve(sc.initial, ctx0).alias(sc.name)
                    for sc in self.extra_state
                ],
            )
        current = truncate_plan(current, preserve_partitioning=single_jvm)

        state_cols = [c for c in current.columns]

        # -- join-pruning probe frame: an EMPTY DataFrame carrying the full
        # triplet schema (subject.* ∪ edge.* ∪ object.*).  Each superstep the
        # resolved payloads are analyzed against it and the analyzed plan's
        # attribute references decide which vertex-side joins the messages
        # actually need — exact Catalyst resolution, not repr string-sniffing
        # (a UDF-wrapped column or an F.expr payload resolves identically).
        def _probe_frame(cols: list[str]) -> DataFrame:
            from pyspark.sql.types import StructField, StructType

            fields = [
                StructField(alias(SUBJECT, f.name), f.dataType, True)
                for f in current.schema.fields
            ]
            fields += [
                StructField(alias("edge", f.name), f.dataType, True)
                for f in self.graph.edges.schema.fields
            ]
            fields += [
                StructField(alias(OBJECT, f.name), f.dataType, True)
                for f in current.schema.fields
            ]
            return spark.createDataFrame([], StructType(fields))

        probe = _probe_frame(state_cols)
        # static (non-closure) sends reference the same columns every
        # superstep — probe once; closure-valued sends re-probe per step.
        static_sends = all(
            isinstance(sm.payload, Column) for sm in self.send_messages
        )
        pruning_cache: Optional[tuple[bool, bool]] = None

        # Bootstrap user state-stats over the initial state (one cheap agg on
        # the checkpointed frame); thereafter they piggy-back on the per-
        # superstep stats action — zero extra jobs inside the loop.
        last_stats: dict = {}
        stat_types: dict[str, str] = {}
        if self.state_stats:
            row = current.agg(
                *[e.alias(f"__ss_{k}__") for k, e in self.state_stats.items()]
            ).collect()[0]
            last_stats = {k: row[f"__ss_{k}__"] for k in self.state_stats}
            # one fixed injection schema per run (stable plan → codegen cache
            # hit); integers stay bigint (exact past 2^53), everything else
            # double, NULL stats stay NULL rather than silently becoming 0.
            stat_types = {
                k: "bigint"
                if isinstance(v, int) and not isinstance(v, bool)
                else "double"
                for k, v in last_stats.items()
            }

        iteration = start_step
        try:
            while iteration <= self.max_iterations:
                t0 = time.monotonic()
                ctx = PregelContext(
                    superstep=iteration, state=current, stats=last_stats
                )

                # The state keeps its hash(vertex_id) partitioning across
                # supersteps (truncate_plan preserves the checkpoint's
                # outputPartitioning), so in steady state NEITHER the
                # subject/object triplet sides NOR the apply join re-shuffle
                # the state; with AQE off the partition count is stable and
                # the aggregated-message side lines up too.  Superstep 1
                # pays one bootstrap shuffle (source partitioning unknown).
                base = current

                # -- triplets: subject ⋈ edge ⋈ object (pregel.rs:791-808) --
                # Each vertex-side join serves two purposes in the reference:
                # providing that side's columns to message expressions, and
                # inner-join filtering of edges whose endpoint is missing
                # from the vertex set.  When no payload references a side's
                # columns AND the graph is closed-world (vertex set derived
                # from the edges, so the filter is a no-op), that join is
                # dropped — for PageRank this halves the per-superstep joins.
                sends = (
                    self.send_messages[:1]
                    if self.first_send_only
                    else self.send_messages
                )
                resolved = [
                    (sm.receiver, _resolve(sm.payload, ctx)) for sm in sends
                ]
                closed = getattr(self.graph, "closed", False)
                if not closed:
                    # open-world graphs need both inner joins for their
                    # filtering effect regardless of column usage
                    need_subj = need_obj = True
                elif pruning_cache is not None:
                    need_subj, need_obj = pruning_cache
                else:
                    subj_names = {alias(SUBJECT, c) for c in state_cols}
                    obj_names = {alias(OBJECT, c) for c in state_cols}
                    try:
                        refs = _referenced_names(probe, [p for _, p in resolved])
                        need_subj = bool(refs & subj_names)
                        need_obj = bool(refs & obj_names)
                    except Exception:
                        # unresolvable payload: keep both joins (always
                        # correct) and let the real plan raise the user's
                        # actual analysis error with full context
                        need_subj = need_obj = True
                    if static_sends:
                        pruning_cache = (need_subj, need_obj)
                if self.active_filter is not None:
                    # the subject join is load-bearing now (it drops
                    # inactive senders' edges), so it can't be pruned even
                    # on a closed-world graph with subject-free payloads
                    need_subj = True
                triplets = edges
                if need_subj or not closed:
                    subj = base.select(
                        *[
                            F.col(f"`{c}`").alias(alias(SUBJECT, c))
                            for c in state_cols
                        ]
                    )
                    if self.active_filter is not None:
                        # filter BEFORE the join: cuts the sort-merge
                        # probe side and every downstream message row
                        # without disturbing the state's hash partitioning
                        subj = subj.filter(
                            _resolve(self.active_filter, ctx)
                        )
                    triplets = subj.join(
                        triplets,
                        _q(alias(SUBJECT, VERTEX_ID)) == _q(alias("edge", SUBJECT)),
                        "inner",
                    )
                if need_obj or not closed:
                    obj = base.select(
                        *[
                            F.col(f"`{c}`").alias(alias(OBJECT, c))
                            for c in state_cols
                        ]
                    )
                    triplets = triplets.join(
                        obj,
                        _q(alias("edge", OBJECT)) == _q(alias(OBJECT, VERTEX_ID)),
                        "inner",
                    )

                # -- messages: one frame per SendMessage, unioned (Q1 fix) --
                frames = []
                for receiver, payload in resolved:
                    frames.append(
                        triplets.select(
                            receiver.receiver_expr().alias(MSG_VERTEX_ID),
                            payload.alias(PREGEL_MSG),
                        )
                    )
                messages = frames[0]
                for f_ in frames[1:]:
                    messages = messages.unionByName(f_)

                # -- aggregate per receiver (pregel.rs:835-837) --
                collect_stats = (
                    self.tolerance is not None
                    or self.check_exact
                    or self.checkpoint_store is not None
                    or bool(self.state_stats)
                )
                # __msg_cnt__ rides along so the stats action can report
                # total messages without a second pass — but it widens every
                # shuffled partial-agg row by a long (measured ~20% of the
                # per-superstep shuffle at 16 cores), so it is only computed
                # when something consumes it: checkpoint manifests or an
                # explicit request.  Convergence (delta/changed) never needs
                # it.
                count_msgs = (
                    self.checkpoint_store is not None or self.message_counts
                )
                agg_expr = _resolve(self.aggregate_expr, ctx).alias(PREGEL_MSG)
                if self.salted_agg_partials > 1:
                    # Explicit two-phase: partial agg on (receiver, salt),
                    # then COMBINE the partials per receiver.  The combiner
                    # is derived from the aggregate function, NOT the user
                    # expression re-applied: re-applying `count` would count
                    # salt groups instead of messages, and re-applying
                    # `sum(msg * 2)` would double the partials again.
                    # Decomposable: sum/min/max (same fn) and count (→ sum).
                    fn = _agg_function_name(agg_expr)
                    combine = _SALT_COMBINE.get(fn or "")
                    if combine is None:
                        raise ValueError(
                            "with_salted_aggregation requires a sum/min/max/"
                            f"count aggregate; got {fn or 'unrecognized'!s}. "
                            "Non-decomposable aggregates (avg, collect_*, "
                            "F.expr text) must use the unsalted path, where "
                            "Spark's map-side partial aggregation still "
                            "collapses hub receivers per partition."
                        )
                    salt = F.pmod(
                        F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(self.salted_agg_partials),
                    ).alias("__salt__")
                    cnt_p = (
                        [F.count(F.lit(1)).alias("__msg_cnt__")]
                        if count_msgs else []
                    )
                    partial = messages.select(
                        _q(MSG_VERTEX_ID), _q(PREGEL_MSG), salt
                    ).groupBy(_q(MSG_VERTEX_ID), F.col("__salt__")).agg(
                        agg_expr, *cnt_p
                    )
                    aggregated = partial.groupBy(_q(MSG_VERTEX_ID)).agg(
                        combine(_q(PREGEL_MSG)).alias(PREGEL_MSG),
                        *(
                            [F.sum("__msg_cnt__").alias("__msg_cnt__")]
                            if count_msgs else []
                        ),
                    )
                else:
                    # Spark's hash aggregate already does map-side partial
                    # combine before the shuffle (two-phase for free).
                    aggregated = messages.groupBy(_q(MSG_VERTEX_ID)).agg(
                        agg_expr,
                        *(
                            [F.count(F.lit(1)).alias("__msg_cnt__")]
                            if count_msgs else []
                        ),
                    )

                # -- apply: state ⟕ messages, v_prog (pregel.rs:843-854) --
                # Left join ≡ reference full join: message ids ⊆ vertex ids
                # because triplets are inner joins.  No-message vertices see
                # NULL _pregel_msg_ (Q2 parity).
                joined = base.join(
                    aggregated,
                    F.col(VERTEX_ID) == _q(MSG_VERTEX_ID),
                    "left",
                )
                if self.state_stats:
                    # Inject the scalar stats as columns via a broadcast
                    # one-row frame (see PregelContext.stat_col): identical
                    # plan every superstep → codegen cache hit, only the
                    # tiny broadcast re-executes.  Values keep their native
                    # types (schema fixed at bootstrap) so ctx.stats and the
                    # injected column never diverge.
                    vals = []
                    for k in self.state_stats:
                        v = last_stats.get(k)
                        if v is None:
                            vals.append(None)
                        elif stat_types[k] == "bigint":
                            vals.append(int(v))
                        else:
                            vals.append(float(v))
                    stat_row = spark.createDataFrame(
                        [tuple(vals)],
                        ", ".join(f"__stat_{k}__ {stat_types[k]}"
                                  for k in self.state_stats),
                    )
                    joined = joined.crossJoin(F.broadcast(stat_row))
                # -- update (pregel.rs:859-865): the reference re-joins the
                # original vertices frame to re-attach static props every
                # superstep; since only ``vcol`` evolves, carrying the props
                # through the apply select is semantically identical and
                # saves one shuffle join + one source re-scan per superstep.
                evolving = [vcol] + [sc.name for sc in self.extra_state]
                carry = [c for c in state_cols if c not in evolving]
                prev_names = {c: f"__prev_{i}__" for i, c in enumerate(evolving)}
                nxt = joined.select(
                    *[F.col(f"`{c}`") for c in carry],
                    *[
                        F.col(f"`{c}`").alias(p)
                        for c, p in prev_names.items()
                    ],
                    *([F.col("__msg_cnt__")] if count_msgs else []),
                    # every v_prog sees the PRE-update values of all state
                    # columns (they come from ``joined``) — synchronous BSP
                    _resolve(self.v_prog, ctx).alias(vcol),
                    *[
                        _resolve(sc.v_prog, ctx).alias(sc.name)
                        for sc in self.extra_state
                    ],
                )

                # -- stats ride the materialization pass (Observation):
                # CollectMetrics accumulates convergence delta, change
                # counts, message totals, and the user state-stats DURING
                # the localCheckpoint job itself — zero extra Spark jobs
                # per superstep (an explicit .agg() action measured
                # ~0.6-0.9 s/superstep even over the in-memory state).
                obs = None
                if collect_stats:
                    from pyspark.sql import Observation

                    any_changed = None
                    for c, p in prev_names.items():
                        ch = ~F.col(f"`{c}`").eqNullSafe(F.col(p))
                        any_changed = ch if any_changed is None else (any_changed | ch)
                    obs = Observation(f"pregel_{id(self)}_{iteration}")
                    nxt = nxt.observe(
                        obs,
                        F.count(F.lit(1)).alias("n"),
                        F.max(
                            F.abs(
                                F.col(f"`{vcol}`") - F.col(prev_names[vcol])
                            )
                        ).alias("delta")
                        if self.tolerance is not None
                        else F.max(F.lit(None).cast("double")).alias("delta"),
                        F.sum(any_changed.cast("int")).alias("changed"),
                        F.sum(F.coalesce(F.col("__msg_cnt__"), F.lit(0))).alias(
                            "messages"
                        )
                        if count_msgs
                        else F.max(F.lit(None).cast("long")).alias("messages"),
                        *[
                            e.alias(f"__ss_{k}__")
                            for k, e in self.state_stats.items()
                        ],
                    )

                # -- materialize: truncate lineage (≡ collect(), pregel.rs:867) --
                t_plan = time.monotonic() - t0
                nxt = truncate_plan(nxt, preserve_partitioning=single_jvm)
                t_ck = time.monotonic() - t0 - t_plan

                delta = None
                changed = None
                n_vertices = -1
                n_messages = None
                if obs is not None:
                    stats = obs.get  # already complete: checkpoint ran the plan
                    n_vertices = stats["n"]
                    delta = stats["delta"]
                    changed = stats["changed"]
                    n_messages = stats["messages"]
                    last_stats = {
                        k: stats[f"__ss_{k}__"] for k in self.state_stats
                    }

                prev = current
                current = nxt.drop(*prev_names.values(), "__msg_cnt__")
                current._ck_rdd = getattr(nxt, "_ck_rdd", None)
                state_cols = current.columns
                prev_rdd = getattr(prev, "_ck_rdd", None)
                if prev_rdd is not None:
                    try:
                        prev_rdd.unpersist(False)
                    except Exception:
                        pass

                self.metrics.append(
                    SuperstepMetrics(
                        superstep=iteration,
                        wall_seconds=time.monotonic() - t0,
                        vertices=n_vertices,
                        delta=float(delta) if delta is not None else None,
                        changed=changed,
                        messages=n_messages,
                    )
                )
                if os.environ.get("PREGEL_PROF"):
                    rest = time.monotonic() - t0 - t_plan - t_ck
                    print(
                        f"[pregel-prof] step {iteration}: plan={t_plan:.2f}s "
                        f"checkpoint={t_ck:.2f}s stats+rest={rest:.2f}s",
                        file=sys.stderr,
                    )

                if self.checkpoint_store is not None and self.checkpoint_interval \
                        and iteration % self.checkpoint_interval == 0:
                    self.checkpoint_store.write(
                        iteration, current, self.metrics[-1]
                    )

                if self.tolerance is not None and delta is not None \
                        and delta <= self.tolerance:
                    break
                if self.check_exact and changed == 0:
                    break
                iteration += 1
        finally:
            edges.unpersist()
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

        if self.checkpoint_store is not None:
            self.checkpoint_store.write(
                min(iteration, self.max_iterations), current,
                self.metrics[-1] if self.metrics else None, final=True,
            )
        return current


class PregelBuilder:
    """Fluent builder, reference parity (pregel.rs:330-698)."""

    def __init__(self, graph: "GraphFrame") -> None:
        self._p = Pregel(graph=graph)

    def max_iterations(self, n: int) -> "PregelBuilder":
        self._p.max_iterations = n
        return self

    def with_vertex_column(self, name: str) -> "PregelBuilder":
        self._p.vertex_column = name
        return self

    def initial_message(self, expr: ExprLike) -> "PregelBuilder":
        self._p.initial_message = expr
        return self

    def send_messages(
        self, receiver: MessageReceiver, payload: ExprLike
    ) -> "PregelBuilder":
        self._p.send_messages.append(SendMessage(receiver, payload))
        return self

    def aggregate_messages(self, expr: ExprLike) -> "PregelBuilder":
        self._p.aggregate_expr = expr
        return self

    def v_prog(self, expr: ExprLike) -> "PregelBuilder":
        self._p.v_prog = expr
        return self

    # -- extensions -----------------------------------------------------------

    def with_tolerance(self, tol: float) -> "PregelBuilder":
        """Early-stop when max|new−old| ≤ tol (fills reference TODO, Q3)."""
        self._p.tolerance = tol
        return self

    def with_exact_convergence(self) -> "PregelBuilder":
        """Early-stop when no vertex value changes (for label programs)."""
        self._p.check_exact = True
        return self

    def with_checkpoint(self, store, every: int = 5) -> "PregelBuilder":
        self._p.checkpoint_store = store
        self._p.checkpoint_interval = every
        return self

    def with_salted_aggregation(self, partials: int) -> "PregelBuilder":
        self._p.salted_agg_partials = partials
        return self

    def with_message_counts(self, on: bool = True) -> "PregelBuilder":
        """Report per-superstep message totals in ``metrics.messages``.
        Costs one extra long per shuffled partial-agg row — off by default;
        ``with_checkpoint`` implies it (manifests record message counts)."""
        self._p.message_counts = on
        return self

    def with_reference_send_semantics(self, on: bool = True) -> "PregelBuilder":
        """Reference Q1 parity: chained ``send_messages`` beyond the first
        are inert (the reference's same-alias select keeps only the first,
        pregel.rs:825-834).  Off by default — the default is union
        semantics, the documented divergence (SURVEY §5.3)."""
        self._p.first_send_only = on
        return self

    def with_adaptive(self, on: bool = True) -> "PregelBuilder":
        """Re-enable AQE inside the superstep loop (off by default — see
        ``Pregel.adaptive``)."""
        self._p.adaptive = on
        return self

    def with_prepartitioned_edges(self, on: bool = True) -> "PregelBuilder":
        """Declare the edge table already hash-clustered on ``subject``
        (a bucketed-table scan, sources/bucketed.py) so the loop skips its
        one-time edge repartition — at web scale that is the difference
        between shuffling the full edge table at every job start/resume
        and never shuffling it at all (the layout was paid once, at write
        time).  If the declaration is wrong the superstep join inserts its
        own Exchange: slower, never incorrect.

        For the in-loop triplet joins to stay exchange-free the bucket
        count must equal ``spark.sql.shuffle.partitions`` (the state side
        is hash-clustered at that width); with a different count Catalyst
        re-exchanges one side per superstep — correct, but it forfeits
        the benefit beyond the skipped startup shuffle."""
        self._p.edges_prepartitioned = on
        return self

    def with_state_column(
        self, name: str, initial: ExprLike, v_prog: ExprLike
    ) -> "PregelBuilder":
        """Add an additional evolving state column (multi-column state —
        extension over the reference's single mutable column, SURVEY Q4).
        All state columns update synchronously from the pre-update values;
        exact-convergence checks consider every evolving column."""
        self._p.extra_state.append(StateColumn(name, initial, v_prog))
        return self

    def with_active_filter(self, expr: ExprLike) -> "PregelBuilder":
        """Voting-to-halt sugar (VERDICT r4 item 7): only vertices whose
        SUBJECT-side triplet columns satisfy ``expr`` send messages this
        superstep — e.g. ``subject("changed")`` with a ``with_state_column``
        flag tracking "my value improved last superstep".  Every vertex
        still receives and runs ``v_prog`` (NULL message when nothing
        arrives, Q2 semantics unchanged); only the send/shuffle side
        shrinks, which on high-diameter or rapidly-converging programs
        collapses the per-superstep message shuffle to the live frontier
        (``with_message_counts`` measures it).

        Correctness contract (the user's, as in GraphX/Giraph vote-to-halt):
        results are identical iff an inactive vertex's re-sent message
        could never change any receiver's decision — true for idempotent
        monotone aggregates (min/max label or distance propagation) when
        the filter keeps exactly the vertices whose state changed last
        superstep.  The built-in frontier algorithms (SSSP, MIS, k-core)
        hand-roll the same shrink with semi-joins; this flag gives raw
        user programs the same plan shape declaratively.

        ``expr`` may be a Column or a per-superstep closure
        ``ctx -> Column`` (``PregelContext``, like payloads); it is
        applied to the subject frame BEFORE the triplet join, so the
        subject join is never pruned while a filter is set."""
        self._p.active_filter = expr
        return self

    def with_state_stat(self, name: str, expr: Column) -> "PregelBuilder":
        """Register a scalar aggregate over the vertex state, evaluated in
        the same per-superstep stats action as convergence (no extra jobs);
        the value is visible to closures as ``ctx.stats[name]`` — computed
        over the state the closure's superstep starts from.  The injected
        ``stat_col`` column keeps the value's native type (bigint for ints,
        double otherwise, fixed at bootstrap) and a NULL aggregate stays
        NULL — coalesce inside the aggregate if zero-default is wanted."""
        self._p.state_stats[name] = expr
        return self

    def build(self) -> Pregel:
        return self._p


# late import for type reference only
from pregel_rs_spark.graphframe import GraphFrame  # noqa: E402  (cycle-free)
