"""Continuous projections (P20 Continuous mode + U6/U8) — the same fold
DSL executed over a live subscription with ``applyInPandasWithState``.

Semantics kept from the batch runtime: per-partition state, events applied
in log order within each micro-batch, ``$init`` seeding, undefined return
keeps state. State is JSON text in Spark's state store; checkpointing (U8)
is the streaming checkpoint — exactly-once state updates come for free,
emission dedupe relies on the same deterministic event ids as the batch
runtime.

Ordering caveat (documented contract): Structured Streaming delivers
files in commit order, and events are sorted by log_position inside each
micro-batch; cross-batch disorder cannot occur because the single writer
commits files monotonically. This mirrors the reference, where projections
consume the strictly ordered commit feed (HeadingEventReader).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.reader_strategy import source_predicate
from ..projections.dsl import ANY, DELETED, INIT, Projection
from ..projections.runtime import EmitContext, _event_dict
from ..schema import STREAM_DELETED_EVENT_TYPE

_STATE_SCHEMA = T.StructType([T.StructField("js", T.StringType())])

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("last_position", T.LongType()),
    ]
)


def _make_stateful(proj: Projection):
    handlers = dict(proj.handlers)
    arity = dict(proj.handler_arity)
    name = proj.name

    def call(fn, key, state, ev, ctx):
        n = arity.get(key, 3)
        out = fn(state, ev) if n == 2 else fn(state, ev, ctx)
        return state if out is None else out

    def fn(key, pdfs: Iterator[pd.DataFrame], gstate: GroupState):
        partition = key[0]
        if gstate.exists:
            state = json.loads(gstate.get[0])
        else:
            init = handlers.get(INIT)
            state = init() if init is not None else {}
        ctx = EmitContext(name, partition)
        any_h, del_h = handlers.get(ANY), handlers.get(DELETED)
        last = -1
        for pdf in pdfs:
            pdf = pdf.sort_values("log_position", kind="mergesort")
            cols = [c for c in pdf.columns if c != "_partition"]
            for row in pdf[cols].itertuples(index=False):
                ev = _event_dict(dict(zip(cols, row)))
                ctx._pos = last = int(ev["log_position"])
                et = ev["event_type"]
                if et == STREAM_DELETED_EVENT_TYPE:
                    if del_h is not None:
                        state = call(del_h, DELETED, state, ev, ctx)
                    continue
                h = handlers.get(et)
                if h is not None:
                    state = call(h, et, state, ev, ctx)
                elif any_h is not None:
                    state = call(any_h, ANY, state, ev, ctx)
        gstate.update((json.dumps(state, sort_keys=True, default=str),))
        yield pd.DataFrame(
            [(partition, json.dumps(state, sort_keys=True, default=str), last)],
            columns=["partition", "state", "last_position"],
        )

    return fn


def run_continuous(proj: Projection, subscription: DataFrame) -> DataFrame:
    """Attach a projection to a streaming subscription; returns a streaming
    DataFrame of (partition, state, last_position) updates per micro-batch.

    Start it with ``.writeStream.outputMode("update")`` (state upserts) —
    e.g. foreachBatch MERGE into a state table, the analog of
    `$projections-<name>-result`.
    """
    src = subscription.where(source_predicate(proj))
    if proj.by_stream:
        src = src.withColumn("_partition", F.col("stream_id"))
    elif proj.partition_col is not None:
        src = src.withColumn("_partition", proj.partition_col.cast("string"))
    else:
        src = src.withColumn("_partition", F.lit(""))

    return src.groupBy("_partition").applyInPandasWithState(
        _make_stateful(proj),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
