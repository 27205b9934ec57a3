"""Plans: execution machinery shared by the iterative graph algorithms.

- :mod:`pregel` — the superstep driver (persist-per-step, lineage breaking,
  parquet vertex-state snapshots, per-partition lineage + convergence
  metrics, resume). Reference analog: the Pregel framework
  (pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:172-210).
- :mod:`partitioning` — skew helpers: salted two-level aggregation,
  degree statistics (reference analog: PartitionUtils degree partitioning,
  core/.../partition/PartitionUtils.java:49,125).
"""
