from voter_gateway_spark.plans.staging import WorkingFrame
from voter_gateway_spark.plans.matching import MatchRule, MatchPlan
from voter_gateway_spark.plans.merging import (
    MergePlan,
    MergeResult,
    apply_changes,
    scd2_merge,
)
from voter_gateway_spark.plans.dedup import DedupPlan, MergeInvariantError
from voter_gateway_spark.plans import linkage

__all__ = [
    "linkage",
    "WorkingFrame",
    "MatchRule",
    "MatchPlan",
    "MergePlan",
    "MergeResult",
    "apply_changes",
    "scd2_merge",
    "DedupPlan",
    "MergeInvariantError",
]
