"""Plan audit: a programmatic linter for DataFrame physical plans.

The scale discipline in SCALING.md is only real if it is checkable by
machine — tests/test_plans.py pins it for the built-in catalog;
``planaudit`` exposes the same checks as a public API so USER queries
get them too (CI gate: ``assert_scalable(df)`` next to the unit
tests).

What it reads (all from ``df.explain("formatted")`` output plus the
executed-plan tree — no execution, no data touched):

- join strategies by node type (broadcast hash / sort-merge /
  shuffled hash / broadcast nested loop / cartesian)
- shuffle exchange count (every ``Exchange`` is a full network
  rewrite of its input at 100 TB; broadcast exchanges counted apart)
- per-scan pushdown: data format, ``PushedFilters``, ``ReadSchema``
  width (a scan reading all columns for a 2-column projection means
  pruning failed)
- Python boundary nodes: Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``) vs row-at-a-time
  (``BatchEvalPython`` — the 10-100x slow path, always flagged)
- whole-stage-codegen span count (wider spans = fewer interpreter
  boundaries)

``assert_scalable`` turns the report into a pass/fail gate with an
explicit allowlist for the few shapes that are legitimate by design
(e.g. a broadcast NLJ in a documented O(n^2) parity probe).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["ScanInfo", "PlanReport", "PlanLintError", "audit", "assert_scalable"]


@dataclass
class ScanInfo:
    format: str
    pushed_filters: list[str]
    read_columns: list[str]


@dataclass
class PlanReport:
    joins: dict[str, int] = field(default_factory=dict)
    shuffle_exchanges: int = 0
    broadcast_exchanges: int = 0
    scans: list[ScanInfo] = field(default_factory=list)
    arrow_python_stages: int = 0
    row_python_stages: int = 0
    codegen_spans: int = 0
    # BNLJ joins whose BUILD side is a keyless (global) aggregate —
    # provably <= 1 broadcast row, so the "nested loop" is one O(1)
    # probe per stream row: scalable at any size. The common shape is
    # crossJoin(broadcast(df.agg(...))) attaching totals/min-max to
    # every row.
    scalar_bnlj: int = 0

    @property
    def cartesian_like(self) -> int:
        return (
            self.joins.get("CartesianProduct", 0)
            + self.joins.get("BroadcastNestedLoopJoin", 0)
            - self.scalar_bnlj
        )


class PlanLintError(AssertionError):
    pass


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _codegen_spans(df: DataFrame) -> int:
    """Count whole-stage-codegen subtrees. Under AQE the staged plan
    defers codegen until execution, so the count reads as 0 — re-plan
    the same logical plan with AQE off (plan-only; nothing executes)
    and ask the codegen explain. The AQE toggle is applied on a CLONED
    session (``spark.newSession()``: shared SparkContext, isolated
    SQLConf), so concurrent planning on the caller's session — other
    threads, streaming micro-batches — never loses AQE. Relies on the
    Spark-4 ``classic.Dataset.ofRows`` internal; returns 0 if the
    re-plan API is unavailable (e.g. Spark 3.5) — the other report
    fields never depend on it."""
    spark = df.sparkSession
    try:
        iso = spark.newSession()
        iso.conf.set("spark.sql.adaptive.enabled", "false")
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            iso._jsparkSession, df._jdf.queryExecution().logical()
        )
        plain = DataFrame(jdf, iso)
        buf = io.StringIO()
        with redirect_stdout(buf):
            plain.explain("codegen")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
        return int(m.group(1)) if m else 0
    except Exception as exc:  # log ONCE, then degrade to 0: a silent 0
        # would mask a Spark-version API rename forever, but per-call
        # warnings would spam the catalog-wide sweep (164+ plans).
        global _CODEGEN_WARNED
        if not _CODEGEN_WARNED:
            _CODEGEN_WARNED = True
            import warnings

            warnings.warn(
                f"planaudit: codegen re-plan failed (first occurrence; "
                f"further ones are silent): {type(exc).__name__}: "
                f"{str(exc)[:300]} — codegen_spans reads 0 for affected "
                f"plans. Expected for plans over session temp views "
                f"(invisible to the cloned session) and on Spark "
                f"versions without classic.Dataset.ofRows.",
                RuntimeWarning,
                stacklevel=2,
            )
        return 0


_CODEGEN_WARNED = False


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
# unary plumbing that cannot multiply rows — safe to walk through when
# descending a build-side chain looking for the keyless aggregate
_PASSTHROUGH_NODES = (
    "BroadcastExchange",
    "Exchange",
    "Project",
    "Filter",
    "Sort",
    "AQEShuffleRead",
    "ColumnarToRow",
    "InputAdapter",
    "Subquery",
    "TakeOrderedAndProject",
    "LocalLimit",
    "GlobalLimit",
    # adaptive wrappers seen when auditing an EXECUTED df — pure
    # plumbing around a materialized stage, cannot multiply rows
    "BroadcastQueryStage",
    "ShuffleQueryStage",
    "ResultQueryStage",
    "TableCacheQueryStage",
    "ReusedExchange",
    "ReusedSubquery",
)


_TREE_PREFIX = re.compile(r"^((?:[:+]- |[: ] {2})*)")


def _parse_tree(text: str) -> list[tuple[int, str, str, int]]:
    """Tree section of a formatted explain -> [(depth, name, line, id)].
    Markers are 3-char units (':- ', '+- ', ':  ', '   '), so depth is
    prefix length // 3.

    Two dedup rules keep the parse to WHAT ACTUALLY RUNS (or will run)
    exactly once; without them every join/exchange double-counts and
    the scalar-BNLJ build-side pairing misfires:

    - An adaptive plan that has started executing prints ``== Final
      Plan ==`` followed by ``== Initial Plan ==`` with distinct node
      ids for each copy. This happens at top level on an executed df
      AND inline mid-tree under any cached ``InMemoryRelation`` (its
      child is an executed AdaptiveSparkPlan). Skip each Initial Plan
      section — scoped by indentation depth, since for the inline case
      the outer tree RESUMES after it — the final plan is the one that
      ran.
    - A cached subtree referenced twice (e.g. a self-join on a
      persisted frame) prints in full under each ``InMemoryRelation``
      with the SAME node ids; the cache is computed once, so count its
      nodes once (skip ids already seen)."""
    out: list[tuple[int, str, str, int]] = []
    started = False
    seen_ids: set[int] = set()
    skip_below: int | None = None
    for ln in text.splitlines():
        if ln.startswith("== Physical Plan =="):
            started = True
            continue
        if not started:
            continue
        if not ln.strip():
            break
        depth = len(_TREE_PREFIX.match(ln).group(1)) // 3
        if skip_below is not None:
            # section CONTENT prints at the marker's own depth (the
            # marker is a pass-through label, not a parent), so skip
            # >=; the outer tree resumes strictly shallower
            if depth >= skip_below:
                continue
            skip_below = None
        if "== Initial Plan ==" in ln:
            skip_below = depth
            continue
        # query-stage rows on an executed plan carry a trailing
        # ", Statistics(...)" — parse them anyway, or their children
        # sit two depths below their grandparent and the BNLJ
        # build-side kid detection misfires
        m = re.match(
            r"^((?:[:+]- |[: ] {2})*)(.*?)\((\d+)\)(?:, Statistics\(.*)?\s*$",
            ln,
        )
        if not m:
            continue
        rest = m.group(2).strip()
        if rest.startswith("* "):
            rest = rest[2:]
        if not rest:
            continue
        nid = int(m.group(3))
        if nid in seen_ids:
            # second print of a shared cached subtree — skip the whole
            # repeated block (all its ids were seen on the first print)
            continue
        seen_ids.add(nid)
        out.append((depth, rest.split()[0], rest, nid))
    return out


def _count_scalar_bnlj(text: str) -> int:
    """How many BroadcastNestedLoopJoins have a provably-1-row build
    side: descend the build child through unary plumbing until the
    first aggregate node; scalar iff its details say ``Keys: []``
    (a global aggregate returns exactly one row)."""
    tree = _parse_tree(text)
    # details blocks: "(7) HashAggregate\nInput...\nKeys: []..."
    parts = re.split(r"^\((\d+)\)\s", text, flags=re.MULTILINE)
    details = {
        int(parts[i]): parts[i + 1] for i in range(1, len(parts) - 1, 2)
    }
    scalar = 0
    for i, (d, name, rest, _nid) in enumerate(tree):
        if name != "BroadcastNestedLoopJoin":
            continue
        kids = []
        for j in range(i + 1, len(tree)):
            if tree[j][0] <= d:
                break
            if tree[j][0] == d + 1:
                kids.append(j)
        if len(kids) != 2:
            continue
        build = kids[0] if "BuildLeft" in rest else kids[1]
        sub_end = next(
            (j for j in range(build + 1, len(tree)) if tree[j][0] <= tree[build][0]),
            len(tree),
        )
        for j in range(build, sub_end):
            nm = tree[j][1]
            if nm in _AGG_NODES:
                if re.search(r"Keys: \[\s*\]", details.get(tree[j][3], "")):
                    scalar += 1
                break
            if nm not in _PASSTHROUGH_NODES:
                break  # scan/join/generate below: row count unbounded
    return scalar


def audit(df: DataFrame) -> PlanReport:
    """Lint ``df``'s physical plan without executing it."""
    text = _formatted_plan(df)
    rep = PlanReport()
    # Count nodes from the PARSED TREE (final plan only — see
    # _parse_tree): the details section lists a block per id from BOTH
    # the final and initial adaptive plans on an executed df, which
    # double-counted every join and exchange (found when the staged-
    # query sweep audited already-collected frames).
    tree = _parse_tree(text)
    nodes = [name for _, name, _, _ in tree]
    tree_ids = {nid for _, _, _, nid in tree}
    for node in _JOIN_NODES:
        n = sum(1 for x in nodes if x == node)
        if n:
            rep.joins[node] = n
    # "Exchange" = shuffle; BroadcastExchange is executor-local reuse
    rep.shuffle_exchanges = sum(1 for x in nodes if x == "Exchange")
    rep.broadcast_exchanges = sum(1 for x in nodes if x == "BroadcastExchange")
    rep.arrow_python_stages = sum(
        1
        for x in nodes
        if x in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                 "FlatMapGroupsInPandasWithState")
    )
    rep.row_python_stages = sum(1 for x in nodes if x == "BatchEvalPython")
    rep.codegen_spans = _codegen_spans(df)
    if rep.joins.get("BroadcastNestedLoopJoin"):
        rep.scalar_bnlj = min(
            _count_scalar_bnlj(text), rep.joins["BroadcastNestedLoopJoin"]
        )

    # scan blocks: "(1) Scan parquet ..." followed by indented
    # attributes; initial-plan detail blocks are skipped via tree_ids
    for m in re.finditer(r"\((\d+)\)\s+Scan (\w+)", text):
        if int(m.group(1)) not in tree_ids:
            continue
        block_start = m.end()
        block = text[block_start : block_start + 2000]
        pushed: list[str] = []
        pm = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        if pm and pm.group(1).strip():
            pushed = [f.strip() for f in pm.group(1).split(",")]
        cols: list[str] = []
        rm = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if rm and rm.group(1).strip():
            cols = [c.split(":")[0].strip() for c in rm.group(1).split(",")]
        rep.scans.append(
            ScanInfo(format=m.group(2), pushed_filters=pushed, read_columns=cols)
        )
    return rep


def assert_scalable(
    df: DataFrame,
    allow_nlj: bool = False,
    allow_row_python: bool = False,
    max_shuffle_exchanges: int | None = None,
    max_scan_columns: int | None = None,
) -> PlanReport:
    """Raise :class:`PlanLintError` listing every violation; return the
    report when clean. Use in CI next to result assertions — a query
    whose RESULT is right but whose plan cartesian-joins will not
    survive the first real scale-up."""
    rep = audit(df)
    problems: list[str] = []
    if rep.joins.get("CartesianProduct"):
        problems.append(
            f"CartesianProduct x{rep.joins['CartesianProduct']}: unconditional "
            "all-pairs join — refactor to an equi-join (bucket/LSH/inverted index)"
        )
    real_nlj = rep.joins.get("BroadcastNestedLoopJoin", 0) - rep.scalar_bnlj
    if real_nlj > 0 and not allow_nlj:
        problems.append(
            f"BroadcastNestedLoopJoin x{real_nlj}: O(n*m) probe — "
            "acceptable only for documented parity probes (pass "
            "allow_nlj=True); scalar-build BNLJs (keyless-aggregate "
            "build, <= 1 row) are exempt automatically"
        )
    if rep.row_python_stages and not allow_row_python:
        problems.append(
            f"BatchEvalPython x{rep.row_python_stages}: row-at-a-time Python "
            "UDF — rewrite as built-in expressions or an Arrow-batched "
            "pandas UDF (10-100x)"
        )
    if (
        max_shuffle_exchanges is not None
        and rep.shuffle_exchanges > max_shuffle_exchanges
    ):
        problems.append(
            f"{rep.shuffle_exchanges} shuffle exchanges > cap "
            f"{max_shuffle_exchanges}: each one rewrites its input over "
            "the network at full data size"
        )
    if max_scan_columns is not None:
        for s in rep.scans:
            if len(s.read_columns) > max_scan_columns:
                problems.append(
                    f"scan reads {len(s.read_columns)} columns "
                    f"({', '.join(s.read_columns[:6])}...): column pruning "
                    "failed — select only what you use"
                )
    if problems:
        raise PlanLintError("; ".join(problems))
    return rep
