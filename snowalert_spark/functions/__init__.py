"""Scalar/table function library (Snowflake-parity + pipeline helpers)."""
