"""Connector secret resolution hook (reference: helpers/vault.py:16-60
— KMS decryption of connection options before ingest,
connectors_runner.py:86-87).

No cloud KMS in this environment, so the chain is: explicit resolver
callable → ``SA_SECRET_<NAME>`` environment variables → passthrough.
Connection options whose values look like secret references
(``secret:NAME``) are resolved; everything else passes through
unchanged. A real deployment plugs a KMS/vault client into
``set_resolver``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

_resolver: Callable[[str], str] | None = None

PREFIX = "secret:"


def set_resolver(fn: Callable[[str], str] | None) -> None:
    global _resolver
    _resolver = fn


def resolve_value(value):
    if not isinstance(value, str) or not value.startswith(PREFIX):
        return value
    name = value[len(PREFIX) :]
    if _resolver is not None:
        return _resolver(name)
    env = os.environ.get(f"SA_SECRET_{name.upper()}")
    if env is not None:
        return env
    raise KeyError(f"unresolved secret {name!r}")


def resolve_options(options: dict) -> dict:
    """Decrypt-analog pass over connection options."""
    return {k: resolve_value(v) for k, v in options.items()}
