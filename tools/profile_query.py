"""Per-JOB wall-clock profile of one catalog query (r15 optimization
round, guide §1: measure first).

The barrier-heavy composites (pipeline_daily_ingest, the IVF family)
are sequences of many small Spark jobs at sf0.1 — eager checkpoints,
size-gate counts, fanout probes, Lloyd rounds — and wall-clock alone
cannot say whether time goes to per-job scheduler overhead or to real
compute. This runs ONE query with the Spark event log enabled, then
replays the log into a per-job table: job id, description (set by the
engine's setJobDescription sites or inferred from the call site),
submission->completion wall, task time sum, and the GAPS between jobs
(driver-side planning/collect time, which no job row shows).

Usage: python tools/profile_query.py <query> [sf_dir] [runs]
Prints one JSON line: {"query":..., "wall":..., "jobs":[...],
"gap_total":..., "task_time_total":...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

EVDIR = "/tmp/vgs_profile_events"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = build_spark(
        app_name=f"vgs-profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/codegen so job rows measure the plan, not class loading
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    best = float("inf")
    marks = []
    for _ in range(runs):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.sparkContext.setJobDescription(None)
        el = time.time() - t0
        marks.append((t0 * 1000.0, (t0 + el) * 1000.0))
        best = min(best, el)
    wall = best
    spark.stop()

    # replay the event log: one file per app in EVDIR
    jobs: dict[int, dict] = {}
    sql_descr: dict[int, str] = {}
    files: list[Path] = []
    for p in Path(EVDIR).iterdir():
        if p.name.startswith("."):
            continue
        if p.is_dir():  # eventlog_v2 layout: a dir of rolled files
            files.extend(f for f in p.iterdir() if f.is_file() and not f.name.startswith("appstatus"))
        else:
            files.append(p)
    for p in files:
        for line in p.open():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "id": jid,
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev["Submission Time"],
                    "stages": len(ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                pass

    # keep jobs inside the best run's window only
    out_jobs = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        for m0, m1 in marks:
            if j["t0"] >= m0 - 50 and j["t1"] <= m1 + 50:
                which = (m0, m1)
                break
        else:
            continue
        out_jobs.append(
            {
                "id": jid,
                "desc": j["desc"],
                "sec": round((j["t1"] - j["t0"]) / 1000.0, 3),
                "t0": j["t0"],
                "t1": j["t1"],
                "stages": j["stages"],
                "run": marks.index(which),
            }
        )
    # report only the BEST run's jobs (the one `wall` came from)
    best_idx = min(
        range(len(marks)),
        key=lambda i: marks[i][1] - marks[i][0],
    )
    run_jobs = [j for j in out_jobs if j["run"] == best_idx]
    gaps = []
    prev_end = marks[best_idx][0]
    for j in run_jobs:
        gaps.append(round((j["t0"] - prev_end) / 1000.0, 3))
        prev_end = max(prev_end, j["t1"])
    tail_gap = round((marks[best_idx][1] - prev_end) / 1000.0, 3)
    result = {
        "query": name,
        "sf_dir": sf_dir,
        "wall_best": round(wall, 3),
        "n_jobs": len(run_jobs),
        "jobs": [
            {
                "id": j["id"],
                "sec": j["sec"],
                "gap_before": g,
                "stages": j["stages"],
            }
            for j, g in zip(run_jobs, gaps)
        ],
        "tail_gap": tail_gap,
        "job_sec_total": round(sum(j["sec"] for j in run_jobs), 3),
        "gap_sec_total": round(sum(gaps) + tail_gap, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
