"""Connector configuration contract (reference:
webui/backend/webui/api/data.py:57-100 post_connector).

Connection options declared by a connector's ``CONNECTION_OPTIONS``
are validated and coerced before ``connect`` runs:

- missing *required* options fail with the reference's exact
  titles-bulleted error message;
- ``type: list`` values arriving as strings split on commas;
- ``type: int`` values coerce to int;
- ``secret: True`` values pass through an injectable encrypt hook
  (the reference's vault.encrypt) when one is configured.
"""

from __future__ import annotations

from collections.abc import Callable


def validate_options(
    connection_options: list[dict],
    options: dict,
    encrypt: Callable[[str], str] | None = None,
) -> dict:
    """Return the coerced options dict, or the reference's
    ``{'success': False, 'errorMessage': …}`` shape when required
    options are missing (data.py:63-75)."""
    options = dict(options)
    required = {o["name"]: o for o in connection_options if o.get("required")}
    missing_names = set(required) - set(options)
    if missing_names:
        titles = set(
            required[n].get("title", required[n]["name"]) for n in missing_names
        )
        bullet = "\n  - " + "\n  - ".join(titles)
        return {
            "success": False,
            "errorMessage": f"Missing required configuration options:{bullet}",
        }
    for o in connection_options:
        name = o["name"]
        value = options.get(name)
        if o.get("type") == "list" and type(value) is str:
            options[name] = None if value is None else value.split(",")
    for o in connection_options:
        if o.get("type") == "int" and o["name"] in options:
            options[o["name"]] = int(options[o["name"]])
    if encrypt is not None:
        for o in connection_options:
            if o.get("secret") and o["name"] in options:
                options[o["name"]] = encrypt(options[o["name"]])
    return options


def configure(connector_module, name: str, options: dict,
              encrypt: Callable[[str], str] | None = None) -> dict:
    """post_connector analog: validate/coerce, then run the module's
    ``connect`` (data.py:57-100)."""
    out = validate_options(connector_module.CONNECTION_OPTIONS, options, encrypt)
    if out.get("success") is False:
        return out
    return connector_module.connect(name, out)
