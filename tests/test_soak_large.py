"""Entry point for the 2M-base streaming soak (scripts/soak_large.py).

Env-gated: the full run (2M base + 100k pushed docs over hundreds of
micro-batches) takes tens of minutes and belongs to the drive battery, not
the default suite — set HS_SOAK_LARGE=1 to run it here. The same code path
at toy scale is covered unconditionally by tests/test_streaming_soak.py and
tests/test_overlay_catalog.py; the script asserts its own invariants
(≤3-delta chain, bounded serving latency, final bit-identity vs rebuild)
and exits nonzero on breach. BENCH.md records the measured curve.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("HS_SOAK_LARGE") != "1",
    reason="2M-base soak (tens of minutes); set HS_SOAK_LARGE=1",
)
def test_soak_large_2m():
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "soak_large.py",
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=7200
    )
    sys.stdout.write(proc.stdout[-4000:])
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert '"latency_bounded_3x": true' in proc.stdout
    assert '"final_identity_vs_rebuild": true' in proc.stdout
