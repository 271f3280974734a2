"""Runnable example of the ONE-CALL assembly — what a reference user's
`Program.cs` boils down to (`AddCardanoIndexer(configuration)` +
`AddReducers(configuration)` + run, reference README §6): write an
appsettings.json, point it at a node endpoint, call
``run_indexer_from_config``. Everything else — transport selection,
single-instance lock (+ lease renewal), reducer allow-list, feed pump,
streaming loop — comes from the config keys.

This example stands up a local TCP "node" serving a synthetic chain
WITH a mid-stream reorg, writes a real appsettings.json next to the
store, and runs the full assembly twice: a first drain, then a restart
against a longer chain to show every layer resuming from its own
persisted state (pump seq → intersection, streaming checkpoint → files,
committed floor → blocks).

Usage:
    python scripts/example_runner.py [sf_dir] [n_blocks]
    # defaults: /root/testdata/sf0.001, 300 blocks
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    from argus_spark.chain.synth import synth_blocks, synth_watched
    from argus_spark.lifecycle.config import IndexerConfig
    from argus_spark.lifecycle.runner import run_indexer_from_config
    from argus_spark.lifecycle.store import ParquetStateStore
    from argus_spark.reducers.examples import build_example_registry
    from argus_spark.session import get_spark
    from argus_spark.sources.providers import serve_feed_once

    spark = get_spark("argus_example_runner")
    td = tempfile.mkdtemp(prefix="argus_runner_")
    try:
        blocks = synth_blocks(spark, sf_dir).limit(n_blocks).cache()
        watched = synth_watched(spark, sf_dir).cache()
        slots = sorted(r.slot for r in blocks.select("slot").collect())

        # the "node": first serves 80% of the chain, later (leg 2) the
        # full chain with a reorg at 90%
        cut = int(len(slots) * 0.8)
        rows1 = [
            {"seq": i, "action": "roll_forward", "block_slot": s,
             "rollback_slot": None, "rollback_type": None}
            for i, s in enumerate(slots[:cut])
        ]
        host, port = serve_feed_once(rows1)

        # the user's appsettings.json — every decision below comes from it
        cfg_path = os.path.join(td, "appsettings.json")
        with open(cfg_path, "w") as f:
            json.dump({
                "CardanoNodeConnection": {
                    "ConnectionType": "TCP",
                    "TCP": {"Host": host, "Port": port, "PipelineDepth": 50},
                    "NetworkMagic": 2,
                    "Hash": "genesis", "Slot": 0,
                    "MaxRollbackSlots": 10**12, "RollbackBuffer": 10,
                },
                "CardanoIndexReducers": {
                    "ActiveReducers": [
                        "block_tests", "transaction_tests", "utxos_by_address",
                    ]
                },
                "Sync": {
                    "Commit": {"BatchSize": 100, "MaxDelayMs": 10**12},
                    "Worker": {"ExitOnCompletion": True},
                    "SingleInstanceLock": {"Enabled": True,
                                           "LeaseSeconds": 30},
                },
            }, f, indent=2)
        cfg = IndexerConfig.from_json(cfg_path)

        store = ParquetStateStore(os.path.join(td, "store"))
        registry = build_example_registry(spark, watched)
        feed, ck = os.path.join(td, "feed"), os.path.join(td, "ck")

        r1 = run_indexer_from_config(
            spark, cfg, registry, store, blocks, feed, ck
        )
        print(f"leg 1: pumped {r1.pumped_events} events, "
              f"{r1.stats.driver.blocks} blocks committed")

        # leg 2: the node reorged near the tip and grew — serve the
        # rollback + full tail; a fresh runner call resumes every layer
        reorg_at = slots[int(len(slots) * 0.9)]
        tail = [s for s in slots if s > reorg_at]
        # the intersection server replays strictly AFTER the pump's
        # persisted seq, so leg 2's new rows continue the numbering
        rows2 = list(rows1)
        for s in slots[cut:int(len(slots) * 0.9) + 1]:
            rows2.append({"seq": len(rows2), "action": "roll_forward",
                          "block_slot": s, "rollback_slot": None,
                          "rollback_type": None})
        rows2.append({"seq": len(rows2), "action": "roll_back",
                      "block_slot": None, "rollback_slot": reorg_at,
                      "rollback_type": "exclusive"})
        for s in tail:
            rows2.append({"seq": len(rows2), "action": "roll_forward",
                          "block_slot": s, "rollback_slot": None,
                          "rollback_type": None})
        host2, port2 = serve_feed_once(rows2)
        cfg2 = IndexerConfig.from_dict({
            **json.load(open(cfg_path)),
            "CardanoNodeConnection": {
                **json.load(open(cfg_path))["CardanoNodeConnection"],
                "TCP": {"Host": host2, "Port": port2, "PipelineDepth": 50},
            },
        })
        r2 = run_indexer_from_config(
            spark, cfg2, registry, store, blocks, feed, ck
        )
        print(f"leg 2: pumped {r2.pumped_events} events "
              f"(reorg + tail only), {r2.stats.driver.rollbacks} rollback(s)")

        # gate: final committed block_tests table = the full chain
        got = sorted(
            r.slot for r in store.read_table(spark, "block_tests")
            .select("slot").collect()
        )
        ok = got == slots
        print(f"\nrunner gate: ok={ok} "
              f"({len(got)}/{len(slots)} blocks in final state)")
        return 0 if ok else 1
    finally:
        shutil.rmtree(td, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
