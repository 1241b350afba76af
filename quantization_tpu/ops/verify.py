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


def train_ratio_vs_torch() -> float:
    """Measured rel-reconstruction-loss ratio of OUR shipped-default
    trainer vs the torch reference on the flagship head-to-head
    (experiments/head_to_head_d512_b8_10000+10000.json: 1.000109), carried
    in quality.json so the guard ships with the package.  1.0 when
    unrecorded."""
    try:
        return float(json.loads(_QUALITY.read_text()).get(
            "train_ratio_vs_torch", 1.0))
    except Exception:
        return 1.0


def combined_margin_pct(name: str):
    """COMBINED shipped-default margin vs the torch reference, percent:
    (train ratio x worst-seed encode delta) - 1.  This is the number the
    1%-relative parity bar (BASELINE.json) is actually measured against —
    gating on the encode delta alone understates the margin by the
    training gap (VERDICT r4 item 4).  None when the config has no encode
    measurement."""
    delta = quality_delta_pct(name)
    if delta is None:
        return None
    combined = train_ratio_vs_torch() * (1.0 + delta / 100.0)
    return (combined - 1.0) * 100.0
