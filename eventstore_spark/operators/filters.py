"""Server-side event filters (reference: EventFilter.cs).

The reference evaluates these row-by-row during the $all scan
(/root/reference/src/EventStore.Core/Services/Storage/ReaderIndex/
EventFilter.cs:66-189). Here each filter is a Catalyst ``Column``
predicate, so it is pushed into the parquet scan (PushedFilters) and
benefits from row-group min/max pruning — ``max_search_window`` (a guard
against unbounded row-at-a-time scans) is therefore unnecessary and kept
only for API parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class EventFilter:
    """Declarative filter over the event envelope.

    Mirrors the gRPC filter options (streams.proto:64-79): prefix / regex
    on stream_id or event_type.
    """

    stream_prefixes: tuple[str, ...] = field(default=())
    stream_regex: str | None = None
    event_type_prefixes: tuple[str, ...] = field(default=())
    event_type_regex: str | None = None

    def to_doc(self) -> dict:
        """JSON-serializable form — the analog of the reference's
        EventFilter.ParseToDto (EventFilter.cs:213-245), which persists a
        consumer group's filter inside its config entry so the group can
        be rebuilt from configuration. Our filter composes stream + type
        criteria, so the document carries all four fields (omitting
        unset ones) rather than the single-strategy DTO."""
        doc = {
            "streamPrefixes": list(self.stream_prefixes) or None,
            "streamRegex": self.stream_regex,
            "eventTypePrefixes": list(self.event_type_prefixes) or None,
            "eventTypeRegex": self.event_type_regex,
        }
        return {k: v for k, v in doc.items() if v is not None}

    @classmethod
    def from_doc(cls, doc: dict) -> "EventFilter":
        return cls(
            stream_prefixes=tuple(doc.get("streamPrefixes") or ()),
            stream_regex=doc.get("streamRegex"),
            event_type_prefixes=tuple(doc.get("eventTypePrefixes") or ()),
            event_type_regex=doc.get("eventTypeRegex"),
        )

    def predicate(self) -> Column:
        preds: list[Column] = []
        if self.stream_prefixes:
            p = F.col("stream_id").startswith(self.stream_prefixes[0])
            for pre in self.stream_prefixes[1:]:
                p = p | F.col("stream_id").startswith(pre)
            preds.append(p)
        if self.stream_regex:
            preds.append(F.col("stream_id").rlike(self.stream_regex))
        if self.event_type_prefixes:
            p = F.col("event_type").startswith(self.event_type_prefixes[0])
            for pre in self.event_type_prefixes[1:]:
                p = p | F.col("event_type").startswith(pre)
            preds.append(p)
        if self.event_type_regex:
            preds.append(F.col("event_type").rlike(self.event_type_regex))
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out


def default_all_filter() -> Column:
    """The implicit $all filter: hide system streams / internal noise.

    Mirrors EventFilter.DefaultAllFilterStrategy
    (/root/reference/src/EventStore.Core/Services/Storage/ReaderIndex/
    EventFilter.cs:66-101): allow non-'$' streams; drop epoch info and
    persistent-subscription checkpoint/park streams.
    """
    sid = F.col("stream_id")
    return (
        ~sid.startswith("$")
        & ~sid.startswith("$epoch-information")
        & ~(sid.startswith("$persistentsubscription-") & sid.endswith("-checkpoint"))
        & ~(sid.startswith("$persistentsubscription-") & sid.endswith("-parked"))
    )
