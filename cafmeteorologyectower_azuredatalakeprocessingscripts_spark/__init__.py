"""PySpark-native analytics engine with the query/data-processing
capabilities of cafltar/CafMeteorologyECTower_AzureDataLakeProcessingScripts.

The reference (/root/reference, read-only) is a single-process pandas ETL
pipeline for eddy-covariance flux-tower + meteorology data. This package
re-expresses its semantics as lazy, distributed Spark DataFrame plans:

- ``sources``    — TOA5/processed CSV scans, file-name pruning, sinks
                   (reference: src/AzureDataLakeAccess.py:62-106, 152-188,
                   473-516)
- ``operators``  — keep-richest dedup, time-spine gap fill, unions,
                   incremental water-year window resolution, top-1-per-group
                   (reference: src/AzureDataLakeAccess.py:39-60, 282-332,
                   349-418)
- ``qc``         — Met_QAQC / Grade_cs quality control as pure Column
                   expressions (reference: src/AzureDataLakeAccess.py:519-804)
- ``functions``  — water-year calendar, day floor/ceil, null-semantics
                   helpers (reference: src/AzureDataLakeAccess.py:282-289)
- ``plans``      — composed end-to-end pipelines (reference:
                   src/AzureDataLakeAccess.py:334-494)
- ``streaming``  — Structured Streaming variant of the incremental contract
- ``config``     — site/workbook configuration contract + abfss OAuth conf
                   (reference: src/LTARCAFTowerReport.py:61,
                   src/AzureDataLakeAccess.py:125-137, 521-530)
- ``report``     — tower-report query surface + renderers (reference:
                   src/TowerReportPlots.py:18-128)
- ``llm``        — 100 TB-scale training-data-pipeline extensions: dedup
                   (exact/MinHash-LSH/SimHash/n-gram Jaccard/embedding),
                   similarity search, text analysis, multimodal plumbing

Everything is built on the public PySpark DataFrame API; no RDDs, no
row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
