"""Data connectors: landing-table ingestion (reference: src/connectors/)."""
