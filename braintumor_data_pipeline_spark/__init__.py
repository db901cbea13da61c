"""braintumor_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Vinu-24-bot/BrainTumor-Data-Pipeline``
(an Apache Beam image-ETL pipeline + Streamlit segmentation app), extended
with the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) that a 100 TB training-data pipeline needs.

Layout:
- ``session``    — SparkSession factory with scale-oriented defaults.
- ``sources``    — fixture parquet loaders, binary-file scans, pure-Python
                   DICOM/PNG codecs (the reference's input formats).
- ``functions``  — numpy image math (windowing, CLAHE, blur, morphology,
                   SSIM, Butterworth, BF-score) and text/vector helpers.
- ``operators``  — relational query catalog, dedup, similarity, mask
                   algebra, segmentation; every oracle-checkable operator
                   registers (spark_fn, oracle_sql) pairs in ``registry``.
- ``plans``      — end-to-end ETL pipelines (the Beam dataflow port).
- ``streaming``  — Structured Streaming surface over the events table.
"""

__version__ = "0.1.0"
