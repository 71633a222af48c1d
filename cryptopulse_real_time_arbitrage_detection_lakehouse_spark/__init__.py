"""PySpark-native streaming-lakehouse analytics engine.

A clean-room re-design (NOT a port) of the capabilities of the reference
repo ``raghavathyagaraj/CryptoPulse-Real-Time-Arbitrage-Detection-Lakehouse``
(see SURVEY.md): medallion ETL (bronze raw envelope -> silver typed ticks ->
gold 1-minute OHLC/VWAP candles), streaming semantics (watermark, append
mode, exactly-once checkpointing), plus the capabilities the reference
claims but never ships (dedup, true VWAP, cross-venue arbitrage joins) and
LLM-data-pipeline extension operators (text analysis, near-dup detection,
embedding similarity search).

Design stance (SURVEY.md section 7.1): every transform is a pure
``DataFrame -> DataFrame`` function, schema-declared, and agnostic to
batch vs streaming input, so the same code runs under ``spark.read``
(batch, DuckDB-oracle-checked) and ``spark.readStream`` (production).
"""

__version__ = "0.1.0"
