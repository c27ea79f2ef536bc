from wage_etl_spark.lake.table import LakeTable, SnapshotConflict

__all__ = ["LakeTable", "SnapshotConflict"]
