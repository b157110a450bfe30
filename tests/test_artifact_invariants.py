"""Round artifacts must stay in lockstep with the query registry
(VERDICT r5 item 7): a forgotten `tools/check_oracle.py --json` refresh
after adding an entry should fail CI loudly instead of shipping a stale
correctness witness."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _latest_full_artifact() -> Path | None:
    cands = sorted(REPO.glob("CORRECTNESS_full_r*.json"))
    return cands[-1] if cands else None


def test_full_correctness_artifact_covers_every_query():
    art = _latest_full_artifact()
    assert art is not None, "no CORRECTNESS_full_r*.json committed"
    data = json.loads(art.read_text()).get("results", {})

    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    witnessed = set(data)
    missing = sorted(registered - witnessed)
    assert not missing, (
        f"{art.name} is stale: {len(missing)} registered queries have no "
        f"correctness witness (e.g. {missing[:5]}) — re-run "
        "`python tools/check_oracle.py --json CORRECTNESS_full_r<N>.json`"
    )


def test_full_correctness_artifact_is_green():
    art = _latest_full_artifact()
    assert art is not None
    payload = json.loads(art.read_text())
    assert payload.get("failures", 1) == 0, (
        f"{art.name} records failures={payload.get('failures')}"
    )
    data = payload.get("results", {})
    bad = {
        k: v
        for k, v in data.items()
        if v.get("err") or v.get("rows_match") is False
        or v.get("hash_match") is False
    }
    assert not bad, f"{art.name} carries non-green entries: {sorted(bad)[:5]}"
