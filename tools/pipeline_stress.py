"""CurationPipeline counts_plan at replica scale (VERDICT r6 ask #7).

`counts_plan` eagerly checkpoints every stage output (the
multi-consumer trap fix); this measures what that eager chain costs
off the sf0.01 oracle grid: wall-clock for the full 4-stage dry-run
audit (the `pipeline_curation_audit` chain, unmodified) plus the
checkpoint storage it pins (RDD block memSize/diskSize from the
storage status API).

Usage: python tools/pipeline_stress.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x10"
    spark = build_spark(app_name="vgs-pipeline-stress")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    rows = QUERIES["pipeline_curation_audit"](spark, sf_dir).collect()
    wall = time.time() - t0
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    print(
        json.dumps(
            {
                "metric": "pipeline_curation_audit_wall",
                "value": round(wall, 1),
                "unit": "sec",
                "stage_counts": {r["stage"]: int(r["n_rows"]) for r in rows},
                "checkpoint_mem_bytes": int(mem),
                "checkpoint_disk_bytes": int(disk),
                "n_checkpointed_rdds": len(infos),
                "sf_dir": sf_dir,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
