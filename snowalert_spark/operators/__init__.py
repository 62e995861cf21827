"""Reusable relational operators (scale-path building blocks)."""
