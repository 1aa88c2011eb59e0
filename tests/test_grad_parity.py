"""Gradient parity: d(loss)/d(params) matches the reference autograd.

Runs as a float64 subprocess (tests/grad_parity_x64.py) so the x64
switch doesn't leak into the rest of the suite: identical weights,
inputs and labels through the reference model+loss (torch oracle) and
our model+dense loss; representative gradients across the net — stem
conv, a mid-backbone depthwise conv, BN scale/bias, FPN head convs, all
three output heads — must agree to ~1e-5 relative (measured ~1e-7; the
oracle's own fp32 loss accumulators set the floor).

This pins the entire differentiable path: model forward, dense target
building, CIoU/BCE/softmax-CE composition, and weight-layout transposes.
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@requires_reference
def test_grad_parity_x64():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "grad_parity_x64.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "GRAD PARITY OK" in r.stdout
    # every compared tensor is ~fp32-epsilon close
    for line in r.stdout.splitlines():
        if line.startswith("MAXDIFF"):
            assert float(line.split()[-1]) < 2e-5, line
