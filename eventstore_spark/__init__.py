"""eventstore_spark — a PySpark-native event-log analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of EventStore/EventStore (KurrentDB): an append-only globally
ordered log of events in named streams, read surface (stream/$all,
forward/backward, filtered), the five system projections, a projection
fold DSL, subscriptions (Structured Streaming), persistent consumer
groups, plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

The log is ONE columnar table (schema.EVENTS_SCHEMA); everything else is
declarative DataFrame plans over it.
"""

from .schema import (  # noqa: F401
    EVENTS_SCHEMA,
    STREAM_METADATA_SCHEMA,
    category_of,
    envelope_from_app_events,
    load_envelope,
)
from .session import get_spark  # noqa: F401
from .projections.dsl import Projection  # noqa: F401
from .projections.runtime import run_batch  # noqa: F401
from .engine import EventStoreEngine  # noqa: F401
from .writer import (  # noqa: F401
    EventLogWriter,
    ProposedEvent,
    StreamDeletedError,
    WriterFencedError,
    WrongExpectedVersionError,
)
from .manifest import ManifestConflictError  # noqa: F401
from .maintenance import bucket_log, optimize_layout, scavenge, vacuum  # noqa: F401

__version__ = "0.1.0"
