"""Sources: ingest paths that produce (nodes, edges) graphs.

- :mod:`repo_source` — deterministic synthetic source-code repository table
  (the BASELINE input_hint schema) with planted import edges.
- :mod:`edge_extraction` — vectorized import/include reference parser
  (the ``gds.graph.project`` native-projection analog for our domain).
- :mod:`idmap` — scalable dense-id assignment (IdMap analog).
- :mod:`generator` — seeded random graph generator
  (``gds.graph.generate`` analog).
- :mod:`csv_io` — graph CSV export/import
  (``gds.graph.export.csv`` analog).
"""
