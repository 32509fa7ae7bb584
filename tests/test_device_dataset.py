"""Device-resident dataset (data/pipeline.py::DeviceDataset, the
`device_dataset` train key): batch equivalence with the host Batcher path,
uint8 storage rounding, full-permutation shuffle, DP-sharded staging, and a
train-CLI e2e whose result is bit-equal to the host-path run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.data.pipeline import Batcher, Dataset, DeviceDataset


def _toy_dataset(n=10, hw=8, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, hw, hw, 3).astype(np.float32)
    labs = rng.rand(n, 5, 6).astype(np.float32)

    def gen():
        yield from zip(imgs, labs)

    return Dataset(gen, size=n), imgs, labs


def test_matches_host_batcher_f32():
    ds, imgs, labs = _toy_dataset()
    dd = DeviceDataset(ds, batch_size=3)
    host = list(Batcher(ds, 3))
    dev = list(dd.batches(None))
    assert len(dev) == len(host) == 3
    for (hi, hl), (di, dl) in zip(host, dev):
        np.testing.assert_array_equal(hi, np.asarray(di))
        np.testing.assert_array_equal(hl, np.asarray(dl))


def test_uint8_storage_rounding_bound():
    ds, imgs, labs = _toy_dataset()
    dd = DeviceDataset(ds, batch_size=5, store_uint8=True)
    for b, (di, dl) in enumerate(dd.batches(None)):
        ref = imgs[b * 5:(b + 1) * 5]
        # stored as round(x*255) → back as /255: worst case half a lattice step
        assert np.abs(np.asarray(di) - ref).max() <= 0.5 / 255 + 1e-7
        np.testing.assert_array_equal(labs[b * 5:(b + 1) * 5], np.asarray(dl))
    # on-lattice values (JPEG decode output) round-trip to ≤1 ulp: XLA
    # compiles /255 as a reciprocal multiply (documented in DeviceDataset)
    lattice = (np.arange(256, dtype=np.float32) / 255.0).reshape(1, 16, 16, 1)
    lab = np.zeros((1, 1, 6), np.float32)
    dsq = Dataset(lambda: iter([(lattice[0].repeat(3, -1), lab[0])]), size=1)
    ddq = DeviceDataset(dsq, batch_size=1, store_uint8=True)
    (di, _), = ddq.batches(None)
    np.testing.assert_allclose(np.asarray(di)[..., 0], lattice[..., 0],
                               rtol=0, atol=6e-8)


def test_shuffle_is_full_permutation_and_epoch_keyed():
    ds, imgs, labs = _toy_dataset(n=9)
    dd = DeviceDataset(ds, batch_size=3)
    seen = np.concatenate([np.asarray(di)[:, 0, 0, 0]
                           for di, _ in dd.batches(shuffle_seed=123)])
    orig = imgs[:, 0, 0, 0]
    assert sorted(seen.tolist()) == sorted(orig.tolist())  # every example once
    assert not np.array_equal(seen, orig)  # and actually permuted
    seen2 = np.concatenate([np.asarray(di)[:, 0, 0, 0]
                            for di, _ in dd.batches(shuffle_seed=123)])
    np.testing.assert_array_equal(seen, seen2)  # deterministic per seed
    seen3 = np.concatenate([np.asarray(di)[:, 0, 0, 0]
                            for di, _ in dd.batches(shuffle_seed=124)])
    assert not np.array_equal(seen, seen3)  # fresh order per epoch


def test_empty_and_sub_batch_splits():
    empty = Dataset(lambda: iter(()), size=0)
    dd = DeviceDataset(empty, batch_size=4)
    assert dd.n == 0 and list(dd.batches(None)) == []
    ds, _, _ = _toy_dataset(n=3)
    dd = DeviceDataset(ds, batch_size=4)  # drop_remainder semantics
    assert dd.nbatches == 0 and list(dd.batches(7)) == []


def test_sharded_staging_matches_unsharded():
    from yolov3_tpu.parallel.mesh import batch_sharding, make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    ds, imgs, labs = _toy_dataset(n=16)
    dd = DeviceDataset(ds, batch_size=8, sharding=sharding)
    dd0 = DeviceDataset(ds, batch_size=8)
    for (si, sl), (ui, ul) in zip(dd.batches(5), dd0.batches(5)):
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ui))
        np.testing.assert_array_equal(np.asarray(sl), np.asarray(ul))


def test_train_cli_device_dataset_bitmatches_host_path(tmp_path, repo_root):
    """`device_dataset: true` must not change training math — same config,
    same seed, host-fed vs HBM-resident: final checkpoints bit-equal."""
    import yaml

    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.checkpoint import load_checkpoint

    from .conftest import absolutize_run_config

    cfg = yaml.safe_load(open(os.path.join(repo_root, "config/train_config.yaml")))
    absolutize_run_config(cfg, repo_root)
    cfg.update(image_size=96, epochs=1, batch_size=8, training_mode="fit",
               max_dataset_examples=16, early_stopping=False,
               shuffle=False, resume=False)

    outs = {}
    for mode in ("host", "device"):
        cfg["device_dataset"] = (mode == "device")
        cfg["output_checkpoints_path"] = str(tmp_path / f"{mode}.tf")
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            Train()(**cfg)
        finally:
            os.chdir(cwd)
        tree, _ = load_checkpoint(str(tmp_path / f"{mode}.tf.npz"))
        outs[mode] = tree
    host_leaves = jax.tree_util.tree_leaves_with_path(outs["host"])
    dev_leaves = jax.tree_util.tree_leaves_with_path(outs["device"])
    assert len(host_leaves) == len(dev_leaves)
    for (hp, ha), (dp, da) in zip(host_leaves, dev_leaves):
        assert hp == dp
        np.testing.assert_array_equal(np.asarray(ha), np.asarray(da),
                                      err_msg=str(hp))
