"""Training-data-pipeline operators over document/embedding tables:
deduplication, similarity search, text analysis, multimodal plumbing.
Everything is declarative pyspark.sql where possible; numpy-backed
pandas UDFs only where built-ins can't express the math (minhash,
simhash, hyperplane LSH)."""
