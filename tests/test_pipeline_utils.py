import numpy as np
import os
import pytest

from yolov3_tpu.data.pipeline import Batcher, Dataset, DevicePrefetcher


def _ds(n=10):
    def gen():
        for i in range(n):
            yield np.full((4, 4, 3), i, np.float32), np.zeros((5, 6), np.float32)

    return Dataset(gen, size=n)


def test_batcher_drops_remainder():
    batches = list(Batcher(_ds(10), 4))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 4, 4, 3)


def test_dataset_take_and_map():
    ds = _ds(10).take(3).map(lambda img, lab: (img * 2, lab))
    items = list(ds)
    assert len(items) == 3
    assert items[1][0].max() == 2.0


def test_prefetcher_preserves_order_and_count():
    out = [float(np.asarray(img)[0, 0, 0, 0]) for img, _ in DevicePrefetcher(Batcher(_ds(8), 2))]
    assert out == [0.0, 2.0, 4.0, 6.0]


def test_prefetcher_propagates_errors():
    def gen():
        yield np.zeros((4, 4, 3), np.float32), np.zeros((5, 6), np.float32)
        raise RuntimeError("decode failed")

    ds = Dataset(gen)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(DevicePrefetcher(Batcher(ds, 1)))


def test_compilation_cache_populates(tmp_path):
    """compilation_cache wiring: enabling points JAX's persistent cache at
    the dir and a jitted call writes an entry; a fresh compile of the same
    program is served from disk (observable as a cache hit via the
    miss-count API would need internals — entry presence is the contract)."""
    import jax
    import jax.numpy as jnp
    from yolov3_tpu.utils.compile_cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir  # conftest may have set one
    cache_dir = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(cache_dir) == cache_dir
    try:
        @jax.jit
        def f(x):
            return (x * 3.5 + 1).sum()

        f(jnp.arange(128.0)).block_until_ready()
        entries = os.listdir(cache_dir)
        assert entries, "no persistent cache entry written"
    finally:
        # restore the suite-wide cache (and reset the initialized cache
        # object so the restored dir actually takes effect)
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
        jax.config.update("jax_compilation_cache_dir", prev)


def test_compilation_cache_disabled_values():
    from yolov3_tpu.utils.compile_cache import enable_compilation_cache

    for v in (False, None, "", "0", "false", "no", "OFF", " False "):
        assert enable_compilation_cache(v) is None


def _ids(ds):
    return [int(np.asarray(img)[0, 0, 0]) for img, _ in ds]


def test_shuffled_is_permutation_and_deterministic():
    from yolov3_tpu.data.pipeline import shuffled

    ds = _ds(32)
    a = _ids(shuffled(ds, buffer_size=8, seed=7))
    b = _ids(shuffled(ds, buffer_size=8, seed=7))
    c = _ids(shuffled(ds, buffer_size=8, seed=8))
    assert sorted(a) == list(range(32))  # every example exactly once
    assert a == b                        # same seed → same order
    assert a != c                        # epoch-keyed seeds → fresh order
    assert a != list(range(32))          # actually shuffled


def test_shuffled_small_buffer_window():
    """tf.data shuffle semantics: with buffer k an example can move at most
    ~k positions earlier, so a buffer-1 shuffle is the identity."""
    from yolov3_tpu.data.pipeline import shuffled

    assert _ids(shuffled(_ds(16), buffer_size=1, seed=0)) == list(range(16))
    with pytest.raises(ValueError, match="buffer_size"):
        shuffled(_ds(4), buffer_size=0, seed=0)


def test_shuffled_restartable():
    from yolov3_tpu.data.pipeline import shuffled

    ds = shuffled(_ds(12), buffer_size=4, seed=3)
    assert _ids(ds) == _ids(ds)  # re-iteration replays the same order
