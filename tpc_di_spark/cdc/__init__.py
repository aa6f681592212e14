from tpc_di_spark.cdc.apply import align_events, current_state, lww_dedup, merge_batch_rows
from tpc_di_spark.cdc.orchestrator import CdcOrchestrator

__all__ = [
    "align_events",
    "current_state",
    "lww_dedup",
    "merge_batch_rows",
    "CdcOrchestrator",
]
