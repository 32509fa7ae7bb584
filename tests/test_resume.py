import jax.numpy as jnp
import numpy as np
import optax

from yolov3_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from yolov3_tpu.parallel.train_step import init_train_state, make_adam


def test_full_train_state_roundtrip(tmp_path):
    """Optimizer moments (optax namedtuple states) survive the native
    checkpoint format — true resume, which the reference lacks."""
    params = {"backbone": {"layer1": {"kernel": jnp.ones((3, 3, 2, 4))}}}
    state = {"backbone": {"layer1": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}}
    optimizer = make_adam(1e-3)
    ts = init_train_state(params, state, optimizer)

    # advance the optimizer so moments are non-trivial
    grads = {"backbone": {"layer1": {"kernel": jnp.full((3, 3, 2, 4), 0.5)}}}
    updates, opt_state = optimizer.update(grads, ts["opt_state"], ts["params"])
    ts["params"] = optax.apply_updates(ts["params"], updates)
    ts["opt_state"] = opt_state
    ts["step"] = ts["step"] + 1

    path = str(tmp_path / "state.train_state.npz")
    save_checkpoint(path, ts, step=3)
    restored, step = load_checkpoint(path, like=init_train_state(params, state, optimizer))
    assert step == 3
    for a, b in zip(
        np.asarray(restored["params"]["backbone"]["layer1"]["kernel"]).ravel(),
        np.asarray(ts["params"]["backbone"]["layer1"]["kernel"]).ravel(),
    ):
        assert a == b
    # optimizer first/second moments restored exactly
    import jax

    for a, b in zip(jax.tree.leaves(restored["opt_state"]), jax.tree.leaves(ts["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 1
