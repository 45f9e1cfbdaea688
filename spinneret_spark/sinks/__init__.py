"""Partitioned table sinks, manifest/lineage, checkpointed resume."""
