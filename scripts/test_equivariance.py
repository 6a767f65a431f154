"""CLI shim mirroring the reference's `python experiments/test_equivariance.py`
(reference: experiments/test_equivariance.py): runs the property-based
equivariance suite (group theory, FFTs, per-layer equivariance, whole-model
invariance, kernel parity)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = [
    "tests/test_d8_group.py",
    "tests/test_posembed.py",
    "tests/test_layers_equivariance.py",
    "tests/test_models.py",
    "tests/test_pallas_gelu.py",
    "tests/test_pallas_attention.py",
    "tests/test_attention_reference_layout.py",
]

if __name__ == "__main__":
    raise SystemExit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *TESTS, *sys.argv[1:]],
            cwd=REPO,
        )
    )
