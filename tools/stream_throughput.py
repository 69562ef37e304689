"""Structured Streaming throughput at the events ×1000 replica: drive
`stream_hourly_counts` (the windowed-agg production path) over the
100M-row directory built by `stress_scale.py --events 1000`, in
bounded micro-batches (maxFilesPerTrigger), and report rows/second
end-to-end plus per-batch progress.

The replica's part files interleave all ~1000 days (the build is a
repartitioned cross join), so a realistic 2-hour watermark would drop
almost everything as late — an artifact of file order, not an engine
property. The run therefore uses a watermark wider than the full time
span: no row is late, the window state grows to its true full size
(~24,000 hour buckets × event types), and what is measured is the
shuffle/state throughput of the streaming aggregation itself. On a
real deployment the landing order is roughly time-sorted and the
watermark bounds state instead; SCALING.md "Events / streaming"
covers that contract.

Usage: python tools/stream_throughput.py [events_dir] [max_files_per_trigger]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voter_gateway_spark.session import build_spark  # noqa: E402
from voter_gateway_spark.streaming.events import stream_hourly_counts  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_ev_x1000/events.parquet"
    mfpt = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_spark(app_name="vgs-stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    agg = stream_hourly_counts(
        spark, src, watermark="26400 hours", maxFilesPerTrigger=mfpt
    )
    t0 = time.time()
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .trigger(availableNow=True)
        .start()
    )
    rows = 0
    last_ids = set()
    while q.isActive:
        time.sleep(1)
        p = q.lastProgress
        if p and p["batchId"] not in last_ids:
            last_ids.add(p["batchId"])
            rows += p["numInputRows"]
            print(
                f"batch {p['batchId']}: {p['numInputRows']} rows "
                f"{p['durationMs'].get('triggerExecution', 0)} ms",
                flush=True,
            )
    q.awaitTermination()
    wall = time.time() - t0
    # progress events can outrun the 1s poll loop, but recentProgress
    # is CAPPED (spark.sql.streaming.numRecentProgressUpdates, default
    # 100) — take the max of both accumulations so neither a missed
    # poll nor a >100-batch run undercounts
    rows = max(rows, sum(p.numInputRows for p in q.recentProgress))
    print(
        json.dumps(
            {
                "metric": "stream_hourly_rows_per_sec",
                "value": round(rows / wall),
                "unit": "rows/s",
                "rows": rows,
                "wall_sec": round(wall, 1),
                "batches": max(len(last_ids), len(q.recentProgress)),
                "src": src,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
