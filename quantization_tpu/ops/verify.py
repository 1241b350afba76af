"""Shipped kernel-config verification table.

``experiments/kernel_smoke.py`` runs every shipped kernel config on a real
TPU chip (each in its own subprocess) and writes the pass/fault table to
``verified.json`` next to this module.  ``core.codec.encode`` with
``search_method="auto"`` consults it so the library default never routes a
user onto a config that has not been demonstrated to run on hardware.

The table is advisory-negative: a config marked ``ok: false`` is never
auto-selected; a config missing from the table (or a missing table, e.g. a
source checkout without the generated file) is treated as unverified and
also not auto-selected — explicit ``search_method=`` always bypasses the
gate.
"""

from __future__ import annotations

import functools
import json
import pathlib

_TABLE = pathlib.Path(__file__).with_name("verified.json")
_QUALITY = pathlib.Path(__file__).with_name("quality.json")


@functools.lru_cache(maxsize=1)
def _load() -> dict:
    try:
        return json.loads(_TABLE.read_text())["results"]
    except Exception:
        return {}


@functools.lru_cache(maxsize=1)
def _load_quality() -> dict:
    try:
        return json.loads(_QUALITY.read_text())["results"]
    except Exception:
        return {}


def kernel_verified(name: str) -> bool:
    """True iff the named smoke-gate config passed on real hardware."""
    entry = _load().get(name)
    return bool(entry and entry.get("ok"))


def quality_delta_pct(name: str):
    """Worst measured rel-reconstruction-error delta (percent vs the exact
    beam-5 search, max over eval seeds) of the named config on the trained
    flagship, from ``quality.json`` (written by
    experiments/kernel_quality.py on real hardware).  None when the config
    has no measurement — the ``auto`` margin guard then treats the config
    as documented-but-unguarded and does not demote it (the smoke gate
    still applies)."""
    entry = _load_quality().get(name)
    if not entry:
        return None
    return entry.get("max_delta_pct")
