"""progquery_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of ComputationalReflection/ProgQuery
(reference, read-only at /root/reference), re-targeted from Java ASTs to
multi-turn conversation/agent transcripts.

Pipeline stages (SURVEY.md §2, §7):
  1. transcripts source        (S2/S3 analog)   sources/ + datagen
  2. per-conversation extract  (E1-E10 analog)  extraction/
  3. entity linking            (J1-J4 analog)   linking/
  4. canonicalization          (J5/C1-C4)       canonicalize/
  5. graph materialization     (S4-S6)          graph/
  6. global passes             (G1-G7, A4)      graph/passes.py
  7. checkpoint/resume+lineage (§3.3)           io/ + pipeline.py

Everything is DataFrame-first; the only Python execution is vectorized
pandas/Arrow (mapInPandas / pandas UDFs) in the extraction and similarity
stages, per the BASELINE.json API constraint.
"""

__version__ = "0.1.0"
