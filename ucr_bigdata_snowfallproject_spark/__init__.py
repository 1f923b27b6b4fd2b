"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference project
``puneetsinghania/UCR_bigData_snowfallProject`` (see ``SURVEY.md``).

Built from scratch on DataFrame / Spark SQL / Catalyst / MLlib /
Structured Streaming.  Layout:

- :mod:`.session`   — tuned ``SparkSession`` construction
- :mod:`.schemas`   — explicit ``StructType`` schemas for the canonical tables
- :mod:`.io`        — sources/sinks (parquet, CSV, gzip text, tar archives)
- :mod:`.operators` — relational / aggregate / window / dedup / similarity /
  text / multimodal operators
- :mod:`.functions` — scalar column expressions (cleaning, labels, parsing)
- :mod:`.pipeline`  — the end-to-end GSOD weather pipeline
  (ingest → clean → monthly medians → station join → export)
- :mod:`.ml`        — correlation analytics + GBT regression pipeline
- :mod:`.streaming` — watermarked windowed aggregation / latest-per-key /
  stream dedup over the events stream
- :mod:`.plans`     — plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
