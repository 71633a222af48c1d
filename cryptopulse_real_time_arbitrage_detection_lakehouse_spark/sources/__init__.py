"""Source connectors: testdata parquet, Kafka, Delta/parquet lakehouse."""
