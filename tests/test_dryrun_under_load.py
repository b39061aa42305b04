"""Robustness of the driver's multi-chip dryrun gate under host load.

Round-3 post-mortem: `MULTICHIP_r{1,3}.json` were red with rc=-6 —
XLA's CPU in-process collective rendezvous hard-aborts the process when
a participant thread is starved past a hardcoded 40 s termination
timeout (xla rendezvous.cc:127). This host exposes ONE core, so an
8-virtual-device mesh time-shares it and background driver load could
push any all-gather past the timeout even though the sharded program is
correct. `__graft_entry__.dryrun_multichip` now isolates the three
validation stages into separate bounded-thread, priority-boosted
subprocesses and retries a stage exactly once on the abort signature.

This test reproduces the failure environment deliberately: it saturates
the CPU with spin processes and requires the full dryrun to still pass.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_HOGS = 4  # pure-python spinners; host has 1 core, so this is ~5x oversubscription


@pytest.mark.slow
def test_dryrun_multichip_passes_under_cpu_load():
    hogs = [
        subprocess.Popen([sys.executable, '-c', 'while True: pass'],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
        for _ in range(N_HOGS)
    ]
    try:
        # Fresh interpreter so dryrun_multichip takes the driver's
        # subprocess-staged path (in-process jax is not yet imported
        # there), exactly as the MULTICHIP gate runs it.
        proc = subprocess.run(
            [sys.executable, '-c',
             'import __graft_entry__ as g; g.dryrun_multichip(8)'],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
    finally:
        for h in hogs:
            h.kill()
        for h in hogs:
            h.wait()
    assert proc.returncode == 0, (
        f'dryrun failed under load rc={proc.returncode}\n'
        f'stdout: {proc.stdout[-1500:]}\nstderr: {proc.stderr[-1500:]}')
    assert 'dryrun_multichip OK' in proc.stdout
    assert 'dryrun_orbax_resume OK' in proc.stdout
    assert 'dryrun_gan_step OK' in proc.stdout


def test_stage_retry_on_abort_signature(tmp_path, monkeypatch):
    """_run_dryrun_stage retries exactly once on the rendezvous-abort
    signature and surfaces a second failure as real (fast unit test of
    the retry policy, no jax involved)."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    calls = []

    class FakeProc:
        def __init__(self, rc, stderr=''):
            self.returncode = rc
            self.stdout = ''
            self.stderr = stderr

    def fake_run(cmd, **kw):
        calls.append(cmd)
        # first attempt: rendezvous abort; second: success
        if len(calls) == 1:
            return FakeProc(-6, 'Termination timeout for `all gather ...`')
        return FakeProc(0)

    monkeypatch.setattr(subprocess, 'run', fake_run)
    g._run_dryrun_stage('train', 8)
    assert len(calls) == 2, 'abort signature must be retried exactly once'

    # Non-abort failure: no retry, raises immediately.
    calls.clear()

    def fake_run_real_failure(cmd, **kw):
        calls.append(cmd)
        return FakeProc(1, 'AssertionError: non-finite loss in dryrun')

    monkeypatch.setattr(subprocess, 'run', fake_run_real_failure)
    with pytest.raises(RuntimeError, match='stage train failed'):
        g._run_dryrun_stage('train', 8)
    assert len(calls) == 1, 'a real (non-abort) failure must not be retried'

    # Two consecutive aborts: retried once, then surfaced as real.
    calls.clear()

    def fake_run_double_abort(cmd, **kw):
        calls.append(cmd)
        return FakeProc(-6, 'rendezvous.cc:127 Termination timeout')

    monkeypatch.setattr(subprocess, 'run', fake_run_double_abort)
    with pytest.raises(RuntimeError, match='stage train failed'):
        g._run_dryrun_stage('train', 8)
    assert len(calls) == 2
