"""PySpark-native analytics engine with the capabilities of
``CostaQiu/public-transit-data-platform-sql-nosql`` (GTFS transit analytics).

The reference (read-only at /root/reference) is a Flask + MySQL + pandas +
MongoDB stack; this package re-expresses its entire query surface on Spark
DataFrames / Spark SQL:

- explicit-schema GTFS ingest incl. service times past 24:00  (sources/, model/)
- the four parameterized analytics queries Q1-Q4               (queries/)
- the precomputed-result fast path                             (jobs/precompute.py)
- the stop-centric denormalization transform                   (jobs/denormalize.py)
- the timetable lookup operations                              (queries/timetable.py)
- LLM-training-data pipeline extensions: dedup, similarity
  search, text analysis, multimodal columns                    (llmdata/)
- Structured Streaming refresh of the denormalized table       (streaming/)

Design blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
