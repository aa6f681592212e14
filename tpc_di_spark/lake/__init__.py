from tpc_di_spark.lake.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot", "IncrementalView", "ConvStatsConsumer"]


def __getattr__(name):  # lazy: avoid importing pyspark.sql.functions eagerly
    if name == "IncrementalView":
        from tpc_di_spark.lake.incremental_view import IncrementalView

        return IncrementalView
    if name == "ConvStatsConsumer":
        from tpc_di_spark.lake.incremental_agg import ConvStatsConsumer

        return ConvStatsConsumer
    raise AttributeError(name)
