"""Sources & sinks: testdata parquet loaders, tokenized views, checkpoints."""
