from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eventstore_spark.session import get_spark  # noqa: E402
from eventstore_spark.schema import EVENTS_SCHEMA  # noqa: E402


def _slow_bases() -> set[str]:
    """Base nodeids (no parametrize suffix) of the opt-in slow lane,
    one per line in tests/slow_tests.txt (# comments allowed)."""
    path = Path(__file__).resolve().parent / "slow_tests.txt"
    out = set()
    for line in path.read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            out.add(line)
    return out


def pytest_collection_modifyitems(config, items):
    """Mark the heavy tests `slow` so the default lane (`-m "not slow"`,
    set in pytest.ini) stays under the driver's time budget. Parametrized
    variants inherit the mark from their base nodeid."""
    slow = _slow_bases()
    marker = pytest.mark.slow
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in slow:
            item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def bank_events(spark):
    """Small hand-built envelope: two account streams + a chat stream +
    links + a tombstone, with deliberate interleaving in the global order."""
    rows = [
        # log_position, stream_id, category, event_number, event_id, event_type, data, metadata, created, is_json
        (1, "account-1", "account", 0, "a1", "Deposited", '{"amount": 100}', '{"$correlationId":"c1"}', None, True),
        (2, "account-2", "account", 0, "b1", "Deposited", '{"amount": 50}', None, None, True),
        (3, "account-1", "account", 1, "a2", "Withdrawn", '{"amount": 30}', '{"$correlationId":"c1"}', None, True),
        (4, "chat-1", "chat", 0, "m1", "MessageSent", '{"sender":"ana","text":"hi"}', None, None, True),
        (5, "account-1", "account", 2, "a3", "Deposited", '{"amount": 7}', None, None, True),
        (6, "chat-1", "chat", 1, "m2", "MessageSent", '{"sender":"bob","text":"yo"}', None, None, True),
        (7, "idx-1", "idx", 0, "l1", "$>", "1@account-1", None, None, False),
        (8, "account-2", "account", 1, "b2", "Withdrawn", '{"amount": 60}', None, None, True),
        (9, "gone-1", "gone", 0, "g1", "Noted", "{}", None, None, True),
        (10, "gone-1", "gone", 1, "g2", "$streamDeleted", None, None, None, False),
        (11, "chat-1", "chat", 2, "m3", "MessageSent", '{"sender":"ana","text":"bye"}', None, None, True),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA).cache()
