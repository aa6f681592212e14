from tpc_di_spark.lake.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
