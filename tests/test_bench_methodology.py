"""Pin the tunnel-proof bench methodology helpers (bench.py, round 4).

The device-time RTF / MFU fields added in round 4 rest on three small
pieces of machinery; these tests keep them honest on the CPU backend:

- `_repeat_device_seconds` must measure the *marginal* per-iteration
  cost of a k-times-repeated program (subtracting the fixed dispatch +
  fetch overhead), with the trip count TRACED so one compile covers
  every k.
- `_xla_flops` must return XLA's analytic FLOP count for a compiled
  program (a known matmul gives a known number).
- `_peak_bf16_tflops` must resolve the device kind table and fall back
  to the v5e figure.
"""
import numpy as np
import jax
import jax.numpy as jnp

import bench


def test_repeat_device_seconds_measures_marginal_cost():
    # Workload with a deliberately heavy "per-call" constant: the
    # repeat methodology must charge only the per-iteration work.
    calls = []

    def run_k(k, seed):
        calls.append(k)
        key = jax.random.PRNGKey(seed)

        def body(i, acc):
            ki = jax.random.fold_in(key, i)
            x = jax.random.normal(ki, (32, 32))
            return acc + jnp.sum(x @ x)

        return jax.jit(
            lambda k, key: jax.lax.fori_loop(0, k, body,
                                             jnp.float32(0.0)))(k, key)

    # tiny CPU workload: the k_hi-k_lo delta may drown in host noise,
    # in which case the helper now refuses to report a degenerate
    # (<= 0) delta rather than returning 0.0 (div-by-zero downstream)
    try:
        dt = bench._repeat_device_seconds(run_k, k_lo=1, k_hi=9, reps=2)
        assert dt > 0.0
    except RuntimeError as e:
        assert 'degenerate device-time delta' in str(e)
    # warmup covers both trip counts, then reps of each
    assert sorted(set(calls)) == [1, 9]


def test_repeat_device_seconds_single_compile_for_all_k():
    """The trip count must be traced: k=1 and k=9 share ONE executable
    (this is what makes t(hi)-t(lo) a pure device-time delta)."""
    traces = []

    def rep(k, key):
        traces.append(1)

        def body(i, acc):
            return acc + jnp.float32(1.0)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    jit_rep = jax.jit(rep)

    def run_k(k, seed):
        return jit_rep(k, jax.random.PRNGKey(seed))

    try:
        bench._repeat_device_seconds(run_k, k_lo=1, k_hi=9, reps=2)
    except RuntimeError as e:  # trivial body: delta can degenerate
        assert 'degenerate device-time delta' in str(e)
    assert len(traces) == 1, 'trip count retraced -> per-k recompiles'


def test_xla_flops_known_matmul():
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((128, 64), jnp.float32)
    b = jnp.ones((64, 256), jnp.float32)
    flops = bench._xla_flops(f, a, b)
    # 2*M*N*K, exact for a lone dot in XLA's cost model
    assert flops == 2 * 128 * 64 * 256


def test_xla_flops_unavailable_returns_zero():
    # a non-lowerable callable must degrade to 0.0, never raise
    assert bench._xla_flops(object()) == 0.0


def test_peak_table_matches_v5e_default_and_known_kinds():
    assert bench._peak_bf16_tflops() > 0
    table = dict(bench._PEAK_BF16_TFLOPS)
    assert table['v5 lite'] == 197.0       # bench target platform
    assert table['v4'] == 275.0


def test_vocoder_gate_is_device_time_based():
    """Round-5 gate re-draw: the batched-serving pass/fail is the
    device-time RTF (wall stays informational). Pinned so the gate
    cannot silently float again."""
    g = bench._vocoder_gate(0.0019)
    assert g['metric'] == 'vocoder_rtf_batched4_device'
    assert g['target'] == 0.005 and g['pass'] is True
    assert bench._vocoder_gate(0.0051)['pass'] is False
    # a failed device measurement must read as gate-failed, not pass
    assert bench._vocoder_gate(None)['pass'] is False


def test_mel_device_fields_shape_of_output():
    """End-to-end micro-check of the repeat program pattern used for
    the mel path: per-iteration PRNG-derived inputs make every
    iteration distinct (relay memoization cannot fake it)."""
    def mk(B):
        def rep(k, key):
            def body(i, acc):
                ki = jax.random.fold_in(key, i)
                x = jax.random.randint(ki, (B, 8), 1, 60, jnp.int32)
                return acc + jnp.sum(x).astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        jit_rep = jax.jit(rep)
        return lambda k, seed: jit_rep(k, jax.random.PRNGKey(seed))

    run = mk(2)
    a = np.asarray(run(3, 7))
    b = np.asarray(run(3, 8))
    assert a != b, 'different seeds must produce different checksums'
