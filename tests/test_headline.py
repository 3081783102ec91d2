"""Headline ledger drift guard (VERDICT r3 weak #4).

The repo's rule is ONE source of truth for headline figures: the
current-defaults campaign artifacts are parsed into
``docs/campaigns/HEADLINE.json`` and README's generated blocks are spliced
from it (``scripts/update_headline.py``). This test runs the script's
``--check`` mode so any hand-edit of the README blocks — or a ledger that
no longer matches the committed artifacts — fails the suite instead of
shipping a third number in flight.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


def test_readme_headline_matches_campaign_artifacts():
    ledger = REPO / "docs" / "campaigns" / "HEADLINE.json"
    if not ledger.exists():
        pytest.skip("no HEADLINE.json yet (campaign not landed)")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "update_headline.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        "README headline blocks / HEADLINE.json are stale vs the campaign "
        f"artifacts — rerun scripts/update_headline.py:\n{proc.stdout}{proc.stderr}"
    )
