#!/usr/bin/env python
"""Checkpoint averaging (SWA-style) — extension; the reference has no
checkpoint tooling beyond save_weights.

Averages N native ``.npz`` weight checkpoints elementwise (params AND the
BN moving statistics — both must be averaged together or the folded
inference statistics drift) and writes a new checkpoint loadable by every
app. Classic use: average the last K epoch snapshots for a flatter
minimum (Izmailov et al., arXiv 1803.05407) — with `weights_save_peroid`
producing the snapshots.

    python tools/average_checkpoints.py --out avg.tf ckpt_a.tf ckpt_b.tf …
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def average_checkpoints(paths, out_path):
    """Elementwise mean of the checkpoints' flat arrays; key sets must
    match exactly. Returns the number of arrays averaged."""
    import numpy as np

    from yolov3_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from yolov3_tpu.io.resolve import native_path

    if len(paths) < 2:
        raise ValueError("need at least two checkpoints to average")
    trees = [load_checkpoint(native_path(p))[0] for p in paths]

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flat(v, key))
            else:
                out[key] = np.asarray(v)
        return out

    flats = [flat(t) for t in trees]
    keys = set(flats[0])
    for p, fl in zip(paths[1:], flats[1:]):
        if set(fl) != keys:
            missing = keys.symmetric_difference(fl)
            raise ValueError(f"{p}: key set differs from {paths[0]} "
                             f"(e.g. {sorted(missing)[:5]})")

    mean_flat = {k: np.mean([fl[k].astype(np.float64) for fl in flats],
                            axis=0).astype(flats[0][k].dtype)
                 for k in keys}

    def unflat(flat_dict):
        tree = {}
        for key, v in flat_dict.items():
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = v
        return tree

    save_checkpoint(native_path(out_path), unflat(mean_flat))
    return len(mean_flat)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoints", nargs="+",
                        help="two or more native .npz checkpoints")
    parser.add_argument("--out", required=True, help="output checkpoint path")
    args = parser.parse_args(argv)
    n = average_checkpoints(args.checkpoints, args.out)
    print(f"averaged {len(args.checkpoints)} checkpoints "
          f"({n} arrays) -> {args.out}")


if __name__ == "__main__":
    main()
