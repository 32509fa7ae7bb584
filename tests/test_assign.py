import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.assign import assign_targets, best_anchor_indices

ANCHORS = np.array(
    [[0.05, 0.06], [0.1, 0.12], [0.2, 0.18],
     [0.3, 0.28], [0.38, 0.4], [0.5, 0.45],
     [0.6, 0.62], [0.75, 0.7], [0.9, 0.88]], np.float32).reshape(3, 3, 2)
GRIDS = (13, 26, 52)


def random_labels(rng, b=4, m=20, nclasses=7):
    labels = np.zeros((b, m, 6), np.float32)
    for i in range(b):
        n = rng.randint(1, 8)
        xy = rng.rand(n, 2) * 0.6
        wh = rng.rand(n, 2) * 0.35 + 0.02
        labels[i, :n, 0:2] = xy
        labels[i, :n, 2:4] = np.clip(xy + wh, 0, 0.999)
        labels[i, :n, 4] = 1
        labels[i, :n, 5] = rng.randint(0, nclasses, n)
    return labels


def test_roundtrip_scatter_extract():
    """The reference's dev-test intent (tests/test_dataset_grid_scatter.py):
    boxes scattered into the grids can be extracted back exactly."""
    rng = np.random.RandomState(0)
    labels = random_labels(rng)
    grids = assign_targets(jnp.asarray(labels), ANCHORS, GRIDS)
    extracted = []
    for cube in grids:
        cube = np.asarray(cube)
        rows = cube[cube[..., 4] == 1]
        extracted.append(rows)
    extracted = np.concatenate(extracted)
    original = labels[labels[..., 4] == 1]
    # same multiset of rows (scatter collisions aside — keep gt sparse here)
    key = lambda a: np.lexsort(a.T[::-1])
    np.testing.assert_allclose(extracted[key(extracted)], original[key(original)], rtol=1e-6)


def test_duplicate_slot_last_box_wins_deterministically():
    """Two boxes with the same center cell and best anchor: the LAST label
    row must occupy the slot — deterministic, unlike a raw duplicate-index
    scatter (and matching TF's documented last-update-wins)."""
    labels = np.zeros((1, 4, 6), np.float32)
    # identical geometry ⇒ same cell, same best anchor; different class ids
    for slot, cls in ((0, 2.0), (1, 5.0)):
        labels[0, slot] = [0.4, 0.4, 0.5, 0.5, 1.0, cls]
    grids = assign_targets(jnp.asarray(labels), ANCHORS, GRIDS)
    rows = np.concatenate([np.asarray(c).reshape(-1, 6) for c in grids])
    occupied = rows[rows[:, 4] == 1]
    assert occupied.shape[0] == 1  # one slot, one winner
    assert occupied[0, 5] == 5.0, "later label row must win the slot"


def test_scale_ownership_matches_best_anchor():
    rng = np.random.RandomState(1)
    labels = random_labels(rng, b=2)
    best = np.asarray(best_anchor_indices(jnp.asarray(labels), ANCHORS))
    grids = assign_targets(jnp.asarray(labels), ANCHORS, GRIDS)
    for b in range(labels.shape[0]):
        for j in range(labels.shape[1]):
            if labels[b, j, 4] == 0:
                continue
            s = best[b, j] // 3
            a = best[b, j] % 3
            g = GRIDS[s]
            cx = (labels[b, j, 0] + labels[b, j, 2]) / 2
            cy = (labels[b, j, 1] + labels[b, j, 3]) / 2
            row, col = int(cy * g), int(cx * g)
            cell = np.asarray(grids[s])[b, row, col, a]
            # the cell holds this box (unless another box collided into it)
            if np.allclose(cell[:4], labels[b, j, :4], rtol=1e-6):
                assert cell[4] == 1


def test_padded_rows_not_scattered():
    labels = np.zeros((1, 10, 6), np.float32)  # all padding
    grids = assign_targets(jnp.asarray(labels), ANCHORS, GRIDS)
    for cube in grids:
        assert float(np.abs(np.asarray(cube)).sum()) == 0.0


def test_wh_only_iou_ignores_position():
    a = np.zeros((1, 2, 6), np.float32)
    a[0, 0] = [0.0, 0.0, 0.3, 0.28, 1, 0]      # at origin
    a[0, 1] = [0.6, 0.6, 0.9, 0.88, 1, 0]      # same wh, elsewhere
    best = np.asarray(best_anchor_indices(jnp.asarray(a), ANCHORS))
    assert best[0, 0] == best[0, 1] == 3  # anchor (0.3, 0.28)
