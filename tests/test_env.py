import jax


def test_virtual_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == 'cpu'
    assert len(devices) == 8
