"""Sources: testdata parquet loaders + deterministic synthetic corpora."""
