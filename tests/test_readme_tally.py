"""README tallies are GENERATED, not hand-edited (they drifted in
rounds 3 and 4). scripts/tally.py --check recomputes every count from
the live surfaces (catalog registry, bench list, pytest collection)
and fails if the README's tally sentence disagrees."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_readme_tally_matches_live_counts():
    out = subprocess.run(
        [sys.executable, "scripts/tally.py", "--check"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr + out.stdout
