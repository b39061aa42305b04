"""Device-side fold gather must equal the numpy fold_with_overlap."""
import pytest  # noqa: E402
import numpy as np

import jax.numpy as jnp

from forwardtacotron_tpu.models.wavernn import (fold_device,
                                                fold_with_overlap)


def test_fold_device_matches_numpy():
    rng = np.random.RandomState(0)
    for total, target, overlap in [(57, 10, 2), (100, 20, 5), (37, 30, 3)]:
        x = rng.randn(1, total, 4).astype(np.float32)
        ref = fold_with_overlap(x, target, overlap)
        dev = np.asarray(fold_device(jnp.asarray(x), target, overlap))
        np.testing.assert_allclose(dev, ref, atol=1e-6)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
