"""AsyncCheckpointWriter (utils/async_ckpt.py): the step loop's
non-blocking checkpoint path.

The critical property is donation safety: the trainers' jitted steps
donate the TrainState buffers (donate_argnums=(0,)), so by the time the
background thread fetches the payload, the *original* arrays may have
been invalidated. The writer snapshots on device first; these tests
prove the written file holds the pre-donation values."""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forwardtacotron_tpu.utils.async_ckpt import AsyncCheckpointWriter
from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                   save_checkpoint)


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {'params': {'w': jnp.asarray(rng.randn(8, 8), jnp.float32),
                       'b': jnp.asarray(rng.randn(8), jnp.float32)},
            'batch_stats': {}}


def test_matches_sync_save(tmp_path):
    tree = _tree()
    w = AsyncCheckpointWriter()
    w.save(tree, {'cfg': 1}, tmp_path / 'async.fjax', step=7)
    w.close()
    save_checkpoint(tree, {'cfg': 1}, tmp_path / 'sync.fjax', step=7)
    a = restore_checkpoint(tmp_path / 'async.fjax')
    s = restore_checkpoint(tmp_path / 'sync.fjax')
    assert a['step'] == s['step'] == 7
    assert a['config'] == s['config']
    for ka, ks in zip(jax.tree.leaves(a['model']),
                      jax.tree.leaves(s['model'])):
        np.testing.assert_array_equal(ka, ks)


def test_snapshot_survives_donation(tmp_path):
    """Save, then immediately invalidate the saved buffers with a
    donating jit step (exactly the trainer pattern) — the checkpoint
    must hold the pre-donation values."""
    tree = _tree(1)
    want = jax.tree.map(np.asarray, tree)

    donating_step = jax.jit(lambda t: jax.tree.map(
        lambda x: x * 0 - 1.0, t), donate_argnums=(0,))

    w = AsyncCheckpointWriter()
    w.save(tree, {}, tmp_path / 'ck.fjax', step=3)
    tree = donating_step(tree)   # invalidates the original buffers
    jax.block_until_ready(tree)
    w.close()
    got = restore_checkpoint(tmp_path / 'ck.fjax')
    for g, ww in zip(jax.tree.leaves(got['model']),
                     jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), ww)


def test_opt_state_round_trip(tmp_path):
    import optax
    tree = _tree(2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(tree['params'])
    w = AsyncCheckpointWriter()
    w.save(tree, {}, tmp_path / 'ck.fjax', opt_state=opt_state, step=1)
    w.close()
    got = restore_checkpoint(tmp_path / 'ck.fjax')
    assert got['optim'] is not None
    assert len(got['optim']) == len(jax.tree.leaves(opt_state))


def test_last_save_wins(tmp_path):
    w = AsyncCheckpointWriter()
    for step in range(1, 5):
        tree = {'params': {'w': jnp.full((4,), float(step))}}
        w.save(tree, {}, tmp_path / 'latest.fjax', step=step)
    w.close()
    got = restore_checkpoint(tmp_path / 'latest.fjax')
    assert got['step'] == 4
    np.testing.assert_array_equal(np.asarray(got['model']['params']['w']),
                                  np.full((4,), 4.0))


def test_background_errors_surface_at_wait(tmp_path):
    w = AsyncCheckpointWriter()
    w.save(_tree(), {}, tmp_path / 'no_such_dir' / 'ck.fjax', step=1)
    with pytest.raises(Exception):
        w.wait()
    # the writer stays usable after a failed save
    w.save(_tree(), {}, tmp_path / 'ok.fjax', step=2)
    w.close()
    assert restore_checkpoint(tmp_path / 'ok.fjax')['step'] == 2


def test_file_is_atomic_no_partial(tmp_path):
    """save_checkpoint writes tmp-then-rename; a reader never sees a
    torn file. Here: after close(), the path unpickles cleanly and no
    .tmp remains."""
    w = AsyncCheckpointWriter()
    w.save(_tree(3), {}, tmp_path / 'ck.fjax', step=9)
    w.close()
    assert not list(tmp_path.glob('*.tmp'))
    with open(tmp_path / 'ck.fjax', 'rb') as f:
        payload = pickle.load(f)
    assert payload['step'] == 9


def test_topk_with_async_writer_no_orphans(tmp_path):
    """With the async writer, top-k pruning must still see every file
    (the save is made durable before pruning/indexing), non-qualifying
    offers must write NO file, and an exact-resume replay of the same
    boundary must not duplicate index entries."""
    from forwardtacotron_tpu.train.common import TopKTracker
    w = AsyncCheckpointWriter()
    t = TopKTracker(tmp_path, k=2, prefix='fw', ckpt_writer=w)
    variables = {'params': {'x': jnp.ones(4)}}
    assert t.update(3.0, variables, {}, None, step=10)
    assert t.update(1.0, variables, {}, None, step=20)
    assert t.update(2.0, variables, {}, None, step=30)   # evicts 3.0
    assert not t.update(9.0, variables, {}, None, step=40)  # no file
    w.wait()
    files = sorted(p.name for p in tmp_path.glob('*.fjax'))
    assert len(files) == 2, files       # no orphans, loser pruned
    assert not any('step10' in f or 'step40' in f for f in files)
    # exact-resume replay: a boundary whose score ties the current max
    # is simply rejected (nothing to redo)...
    assert not t.update(2.0, variables, {}, None, step=30)
    # ...and replaying the BEST boundary passes the gate but must
    # replace its own entry, never duplicate it
    assert t.update(1.0, variables, {}, None, step=20)
    assert len(t.entries) == 2
    assert len(sorted(tmp_path.glob('*.fjax'))) == 2
    # index durability ordering: every indexed file exists on disk
    for _, _, name in t.entries:
        assert (tmp_path / name).exists()
    w.close()


def test_topk_update_does_not_block_on_serialize(tmp_path, monkeypatch):
    """Round-4 fix: TopKTracker.update must stall the step loop only
    for the on-device snapshot dispatch — the fetch/serialize AND the
    prune + index write all happen on the writer thread. Proven by
    parking the writer thread on a gate: if update() waited for
    durability (the old `wait()` call), it would deadlock until the
    gate times out and the elapsed-time assertion would fail."""
    import threading
    import time

    from forwardtacotron_tpu.train.common import TopKTracker
    from forwardtacotron_tpu.utils import async_ckpt as ac

    gate = threading.Event()
    real_save = ac.save_checkpoint

    def slow_save(*a, **kw):
        gate.wait(30)
        return real_save(*a, **kw)

    monkeypatch.setattr(ac, 'save_checkpoint', slow_save)
    w = AsyncCheckpointWriter()
    t = TopKTracker(tmp_path, k=1, prefix='fw', ckpt_writer=w)
    variables = {'params': {'x': jnp.ones(4)}}
    t0 = time.monotonic()
    assert t.update(1.0, variables, {}, None, step=5)
    elapsed = time.monotonic() - t0
    assert elapsed < 15.0, \
        f'update() blocked {elapsed:.1f}s — waited for the serialize'
    # in-memory leaderboard is current immediately...
    assert len(t.entries) == 1
    # ...but nothing is durable yet: the index write is ordered AFTER
    # the checkpoint file lands (crash-safety invariant)
    assert not t.index_path.exists()
    gate.set()
    w.wait()
    assert t.index_path.exists()
    assert (tmp_path / t.entries[0][2]).exists()
    w.close()


def test_topk_index_never_references_failed_save(tmp_path):
    """If the checkpoint write fails, finalize (prune + index) must not
    run: top_k.pkl never points at a file that was never written."""
    from forwardtacotron_tpu.train.common import TopKTracker
    w = AsyncCheckpointWriter()
    missing = tmp_path / 'no_such_dir'
    t = TopKTracker(missing, k=1, prefix='fw', ckpt_writer=w)
    variables = {'params': {'x': jnp.ones(4)}}
    assert t.update(1.0, variables, {}, None, step=5)
    with pytest.raises(Exception):
        w.wait()
    assert not t.index_path.exists()
    w.close()


def test_topk_phantom_entry_purged_after_failed_save(tmp_path,
                                                     monkeypatch):
    """update() mutates the in-memory leaderboard before the async
    save lands; if that save FAILS, the phantom entry must not
    survive into later finalizes (review finding: a caller that
    catches the re-raised failure and continues used to get the
    phantom name persisted into top_k.pkl by the next successful
    update)."""
    from forwardtacotron_tpu.train.common import TopKTracker
    from forwardtacotron_tpu.utils import async_ckpt as ac

    real_save = ac.save_checkpoint
    fail = {'n': 1}

    def flaky_save(*a, **kw):
        if fail['n']:
            fail['n'] -= 1
            raise OSError('transient disk error')
        return real_save(*a, **kw)

    monkeypatch.setattr(ac, 'save_checkpoint', flaky_save)
    w = AsyncCheckpointWriter()
    t = TopKTracker(tmp_path, k=3, prefix='fw', ckpt_writer=w)
    variables = {'params': {'x': jnp.ones(4)}}
    assert t.update(1.0, variables, {}, None, step=5)   # save will fail
    # next offer drains the failed save -> re-raises; the phantom
    # (step5) and the never-submitted current offer must be purged
    with pytest.raises(OSError):
        t.update(0.5, variables, {}, None, step=10)
    assert t.entries == []
    # caller catches and continues: the retry succeeds and the index
    # must reference ONLY files that exist
    assert t.update(0.5, variables, {}, None, step=10)
    w.wait()
    names = [e[2] for e in t.entries]
    assert names == ['fw_step10_score0.50000.fjax']
    import pickle as _pkl
    kept = _pkl.loads(t.index_path.read_bytes())
    assert [e[2] for e in kept] == names
    assert (tmp_path / names[0]).exists()
    w.close()


def test_back_to_back_saves_both_land(tmp_path):
    """Epoch boundaries issue latest + top-k saves in a row; the
    snapshot-first ordering must still write both files correctly."""
    w = AsyncCheckpointWriter()
    t1 = {'params': {'w': jnp.full((4,), 1.0)}}
    t2 = {'params': {'w': jnp.full((4,), 2.0)}}
    w.save(t1, {}, tmp_path / 'a.fjax', step=1)
    w.save(t2, {}, tmp_path / 'b.fjax', step=2)   # immediately after
    w.close()
    a = restore_checkpoint(tmp_path / 'a.fjax')
    b = restore_checkpoint(tmp_path / 'b.fjax')
    np.testing.assert_array_equal(np.asarray(a['model']['params']['w']),
                                  np.full((4,), 1.0))
    np.testing.assert_array_equal(np.asarray(b['model']['params']['w']),
                                  np.full((4,), 2.0))
