"""Operator CLI for an eventstore_spark store — the admin surface the
reference exposes through its UI/HTTP admin API (scavenge, backups,
archiving, redaction, stats; docs/server/operations/*).

Usage: python tools/admin.py <store-dir> <command> [args]

Commands:
  stats                          store_statistics as JSON
  projections                    registry stream ($projections-$all) listing
  scavenges                      $scavenges history
  scavenge                       retention rewrite (records to $scavenges)
  vacuum [grace_s]               drop superseded files after grace (def 3600)
  optimize [files]               range/sort rewrite for read locality
  backup <dest>                  online differential backup
  restore <backup> <dest>        restore into a fresh directory
  archive <base> [keep]          upload cold files to the archive tier
  drop-archived [grace_s]        drop archived hot copies after grace
  redact <n@stream> [...]        blank specific events (GDPR last resort)
  autoscavenge [interval_s]      run the auto-scavenge policy if due
  compact-state <projection>     fold a continuous projection's state
                                 delta generations into one base
  collect-stats                  append a $statsCollected snapshot to
                                 the $stats-local node stats stream
  stats-history                  $stats-local snapshots (visible window)
  delete-group <group> [stream]  drop a consumer group's server state
                                 (-checkpoint/-parked streams + config)

Read-only commands open the store without the writer lock, so they work
beside a live writer process; mutating commands take the lock and fail
fast if another live process owns it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


READ_ONLY_CMDS = {"stats", "projections", "scavenges", "stats-history"}


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    store, cmd, *args = argv
    if cmd == "restore":  # pure file op — no engine, no lock, no Spark
        from eventstore_spark.maintenance import restore

        print(json.dumps(restore(args[0], args[1])))
        return 0
    from eventstore_spark.engine import EventStoreEngine
    from eventstore_spark.session import get_spark

    spark = get_spark("es-admin")
    eng = EventStoreEngine(spark, store, read_only=cmd in READ_ONLY_CMDS)
    try:
        if cmd == "stats":
            out = eng.store_statistics()
        elif cmd == "projections":
            out = [
                {"event_type": r.event_type, **json.loads(r.data)}
                for r in eng.read_stream("$projections-$all").collect()
            ]
        elif cmd == "scavenges":
            # $scavenges holds LINKS to per-run $scavenges-<id> detail
            # streams (TFChunkScavengerLog.cs) — read resolved
            out = [json.loads(r.data) | {"event_type": r.event_type}
                   for r in eng.read_stream(
                       "$scavenges", resolve_link_tos=True).collect()
                   if r.data is not None]
        elif cmd == "scavenge":
            out = eng.scavenge()
        elif cmd == "collect-stats":
            out = eng.collect_statistics()
        elif cmd == "stats-history":
            out = [json.loads(r.data) for r in
                   eng.read_stream(eng.NODE_STATS_STREAM).collect()]
        elif cmd == "delete-group":
            out = eng.delete_persistent_subscription(
                args[0], args[1] if len(args) > 1 else None)
        elif cmd == "vacuum":
            out = eng.vacuum(float(args[0]) if args else 3600.0)
        elif cmd == "optimize":
            from eventstore_spark.maintenance import optimize_layout

            out = optimize_layout(spark, store,
                                  int(args[0]) if args else 8)
        elif cmd == "backup":
            out = eng.backup(args[0])
        elif cmd == "archive":
            out = eng.archive_cold(args[0],
                                   keep_files=int(args[1]) if len(args) > 1 else 2)
        elif cmd == "drop-archived":
            out = eng.drop_archived_local(float(args[0]) if args else 3600.0)
        elif cmd == "redact":
            out = eng.redact(list(args))
        elif cmd == "autoscavenge":
            pol = eng.auto_scavenge_policy(
                interval_s=float(args[0]) if args else 86400.0)
            out = pol.run_if_due()
        elif cmd == "compact-state":
            out = eng.compact_projection_state(args[0])
        else:
            print(f"unknown command {cmd!r}\n{__doc__}")
            return 2
        print(json.dumps(out, default=str))
        return 0
    finally:
        eng.close()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
