"""Pipeline runners (reference: src/runners/*)."""
