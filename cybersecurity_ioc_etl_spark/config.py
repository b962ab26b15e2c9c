"""Config/credential file loading + validation (SURVEY.md §2.1 S10).

The reference validates configs by set-difference before use —
``want = {...}; if want - have: raise KeyError`` at `h-isac.py:20-22`,
the ``.json`` extension check + key probing at `firehose.py:136-158` —
and has one crash path this module fixes instead of reproducing: with
``--splunk`` omitted it dereferences ``None.endswith`` (`h-isac.py:210`,
SURVEY §4.3.1).  Same set-diff semantics and error types here, usable by
every option-taking surface (CLI forks, RestClient, splunkkv options).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Mapping
from typing import Any


def validate_config(
    cfg: Mapping[str, Any], required: Iterable[str], context: str = "config"
) -> Mapping[str, Any]:
    """Set-diff key validation (`h-isac.py:20-22` parity): every key in
    ``required`` must be present in ``cfg``; raises ``KeyError`` naming
    the missing keys (sorted, so the message is deterministic)."""
    missing = set(required) - set(cfg)
    if missing:
        raise KeyError(
            f"{context} missing required keys: {', '.join(sorted(missing))}"
        )
    return cfg


def load_config(
    path: str, required: Iterable[str] = (), context: str | None = None
) -> dict[str, Any]:
    """Load a JSON config file and validate its keys.

    ``.json`` extension is enforced up front (`firehose.py:137-139`,
    `h-isac.py:210` — minus the None crash); a missing file raises
    ``ValueError`` with the reference's wording (`h-isac.py:16-17`)."""
    if not str(path).endswith(".json"):
        raise ValueError(f"The config file must be a JSON file, got {path!r}")
    try:
        with open(path) as f:
            cfg = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"{path} does not exist. Please try again with the correct file path."
        ) from None
    if not isinstance(cfg, dict):
        raise ValueError(f"{path} must contain a JSON object at top level")
    return dict(validate_config(cfg, required, context or path))
