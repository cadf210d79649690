"""Projection definition DSL (SURVEY §2.3, P1-P21).

The reference's user-facing dataflow language is JavaScript
(fromStream/fromCategory/fromAll → when({...}) → partitionBy/foreachStream →
transformBy/filterBy → outputState/emit/linkTo), interpreted by Jint
(/root/reference/src/EventStore.Projections.Core/Services/Interpreted/
JintProjectionStateHandler.cs; chaining grammar at lines 461-471). Here the
same chain is a Python builder; handlers are Python callables
``handler(state, event, ctx) -> state`` (``ctx.emit``/``ctx.link_to``
collect output events), executed by the batch runtime (runtime.py) as an
ordered Arrow-batched fold, or by the streaming runtime.

Executing the definition once to extract sources — what the reference calls
GetSourceDefinition (JintProjectionStateHandler.cs:81) — is unnecessary: the
builder IS the source definition (the logical plan), which the planner maps
straight to a Catalyst filter (plans/reader_strategy.py).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column

Handler = Callable[..., Any]  # (state, event[, ctx]) -> state

INIT = "$init"
INIT_SHARED = "$initShared"
ANY = "$any"
DELETED = "$deleted"


def validate_reorder(proj: "Projection") -> bool:
    """P19 option validation, shared by the batch and continuous
    runtimes (ReaderStrategy.cs:64-74, verbatim): reordering needs a
    multi-stream fromStreams source and a processing lag of >= 50 ms.
    Returns True when the projection opted into reordering."""
    if not proj.options_.get("reorderEvents"):
        return False
    if proj.all_streams:
        raise ValueError("Event reordering cannot be used with fromAll()")
    if not (proj.streams and len(proj.streams) > 1):
        raise ValueError(
            "Event reordering is only available in fromStreams([]) projections"
        )
    if int(proj.options_.get("processingLag", 0) or 0) < 50:
        raise ValueError(
            "Event reordering requires processing lag at least of 50ms"
        )
    return True


def _arity(fn: Callable) -> int:
    try:
        params = [
            p for p in inspect.signature(fn).parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        return len(params)
    except (TypeError, ValueError):
        return 3


@dataclass
class Projection:
    """A projection spec: sources + fold + output chain."""

    name: str = "unnamed"
    # -- sources (exactly one family; mirrors ReaderStrategy inputs) --
    all_streams: bool = False
    streams: tuple[str, ...] = ()
    categories: tuple[str, ...] = ()
    event_types_hint: tuple[str, ...] = field(default=(), init=False)
    # -- fold --
    handlers: dict[str, Handler] = field(default_factory=dict)
    handler_arity: dict[str, int] = field(default_factory=dict)
    # -- partitioning --
    by_stream: bool = False
    partition_fn: Callable[[dict], str] | None = None
    partition_col: Column | None = None
    # -- state output chain (applied in declaration order) --
    state_chain: list[tuple[str, Callable]] = field(default_factory=list)
    output_state_: bool = False
    result_stream_name: str | None = None
    partition_result_pattern: str | None = None
    include_links: bool = False
    options_: dict = field(default_factory=dict)
    columns_: tuple[str, ...] | None = None

    # ---- selectors ----
    @staticmethod
    def from_stream(stream: str, name: str = "unnamed") -> "Projection":
        return Projection(name=name, streams=(stream,))

    @staticmethod
    def from_streams(*streams: str, name: str = "unnamed") -> "Projection":
        return Projection(name=name, streams=tuple(streams))

    @staticmethod
    def from_category(category: str, name: str = "unnamed") -> "Projection":
        return Projection(name=name, categories=(category,))

    @staticmethod
    def from_categories(*categories: str, name: str = "unnamed") -> "Projection":
        return Projection(name=name, categories=tuple(categories))

    @staticmethod
    def from_all(name: str = "unnamed") -> "Projection":
        p = Projection(name=name)
        p.all_streams = True
        return p

    # ---- fold ----
    def when(self, handlers: dict[str, Handler]) -> "Projection":
        """Register the fold. Keys: '$init', '$initShared', '$any',
        '$deleted', or concrete event types (JintProjectionStateHandler.cs:
        642-692). Typed handlers double as an event-type pushdown hint
        (replaces the reference's $et index switching, P5)."""
        self.handlers.update(handlers)
        for k, fn in handlers.items():
            if callable(fn):
                self.handler_arity[k] = _arity(fn)
        self.event_types_hint = tuple(
            k for k in self.handlers if not k.startswith("$")
        )
        return self

    # ---- partitioning ----
    def foreach_stream(self) -> "Projection":
        self.by_stream = True
        return self

    def partition_by(self, fn_or_col) -> "Projection":
        """Custom partition key: a Catalyst Column (fast, JVM-side — the
        scale path) or a Python callable event->key (parity with the JS
        partitionBy, runs row-wise)."""
        if isinstance(fn_or_col, Column):
            self.partition_col = fn_or_col
        else:
            self.partition_fn = fn_or_col
        return self

    # ---- state output chain ----
    def transform_by(self, fn: Callable[[Any], Any]) -> "Projection":
        self.state_chain.append(("transform", fn))
        return self

    def filter_by(self, fn: Callable[[Any], bool]) -> "Projection":
        self.state_chain.append(("filter", fn))
        return self

    def output_state(self) -> "Projection":
        self.output_state_ = True
        return self

    def output_to(self, result_stream: str,
                  partition_result_stream_pattern: str | None = None
                  ) -> "Projection":
        """JS ``outputTo(resultStream[, partitionResultStreamPattern])``
        — the second argument overrides where PARTITIONED results land
        (``{0}`` substitutes the partition; default
        ``$projections-<name>-{0}-result``)."""
        self.output_state_ = True
        self.result_stream_name = result_stream
        self.partition_result_pattern = partition_result_stream_pattern
        return self

    @property
    def bi_state(self) -> bool:
        """P9: an `$initShared` handler switches the projection to bi-state
        (shared state alongside per-partition state). Handlers then receive
        ``state = {"p": partition_state, "s": shared_state}`` and return the
        same shape (JintProjectionStateHandler.cs:650-655)."""
        return INIT_SHARED in self.handlers

    def columns(self, *cols: str) -> "Projection":
        """Column-pruning hint: only these payload columns reach the fold
        (plus the engine columns log_position/stream_id/event_type). Cuts
        the Arrow transfer into the Python fold — at scale, also narrows the
        parquet scan. Include 'data'/'is_json' if handlers read e['body'],
        'metadata' for e['meta']."""
        self.columns_ = tuple(cols)
        return self

    def options(self, **opts) -> "Projection":
        """resultStreamName / $includeLinks / reorderEvents / processingLag.

        P19 reorderEvents (EventReorderingReaderSubscription.cs): a
        fromStreams([...]) projection with reorderEvents=True and
        processingLag>=50 folds its streams merged by event TIMESTAMP
        (created, position) instead of commit order — the batch runtime
        replays in exactly the order the reference's lag-bounded reorder
        buffer emits; the continuous runtime applies it within each
        micro-batch (equivalent while processingLag <= the trigger
        interval). Validation matches ReaderStrategy.cs:64-74: rejected
        on fromAll / single-stream sources and for lag < 50 ms."""
        self.options_.update(opts)
        if "resultStreamName" in opts:
            self.result_stream_name = opts["resultStreamName"]
        if "$includeLinks" in opts:
            self.include_links = bool(opts["$includeLinks"])
        return self
