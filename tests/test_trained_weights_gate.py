"""Trained-weights cross-runtime parity (round-4 VERDICT item 4).

Every other torch<->JAX parity test runs at random init; this one
trains REAL weights first — the reference torch ForwardTacotron with
its own losses (evolving BatchNorm running stats, Adam-shaped
magnitudes) and our JAX model with its fused train step — and requires
free-running generate() to agree across runtimes through both
checkpoint converters. See tools/trained_weights_gate.py; the
committed full-strength report is docs/parity_trained.md.
"""
import sys
from pathlib import Path

import pytest

REFERENCE = Path('/root/reference')
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference repo not available')

TOOLS = str(Path(__file__).parent.parent / 'tools')


@pytest.mark.slow
def test_trained_weights_gate_both_directions(tmp_path):
    sys.path.insert(0, TOOLS)
    from trained_weights_gate import run_gate
    out = run_gate(steps_torch=40, steps_jax=15, tmpdir=tmp_path)
    assert out['passes_1e-3'], out
    # trained weights actually moved: losses are finite and the gate
    # didn't silently compare random inits
    assert out['torch_to_jax']['final_train_loss'] < 20.0
    assert out['jax_to_torch']['final_train_loss'] < 20.0
    # the north-star contract with margin: trained-weight generate
    # parity is float32-tight, not just under the 1e-3 gate
    assert out['worst_mel_l1'] < 1e-4, out
