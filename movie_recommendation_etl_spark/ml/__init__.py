"""ML layer: TF-IDF feature pipeline + LSH approximate nearest neighbors —
the reference's flagship capability (SURVEY.md §2.10 M1-M12) re-expressed
with core pyspark.ml (no Spark-NLP dependency)."""
