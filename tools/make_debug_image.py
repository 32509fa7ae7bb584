#!/usr/bin/env python
"""Generate the standalone debug image fixture.

The reference bundles a photo (datasets/coco2012/images/girl.png) whose 3
hardcoded debug-mode boxes (person, chair, cell phone —
core/create_dataset.py:18-33) drive ``load_debug_dataset``. We cannot bundle
that photo, so this tool renders a synthetic scene with recognizable blobs
at exactly those normalized box positions, making ``debug_mode: true`` and
the COCO detect config runnable without the reference mount.

Deterministic; writes datasets/coco2012/images/girl.png (filename kept so
reference run-configs resolve unchanged).
"""

from __future__ import annotations

import os

from PIL import Image, ImageDraw

# normalized xyxy boxes + class ids, identical to the debug-mode labels in
# yolov3_tpu/data/pipeline.py::load_debug_dataset
BOXES = [
    ((0.18494931, 0.03049111, 0.9435849, 0.96302897), 0, "person"),
    ((0.01586703, 0.35938117, 0.17582396, 0.6069674), 56, "chair"),
    ((0.09158827, 0.48252046, 0.26967454, 0.6403017), 67, "cell phone"),
]

W, H = 512, 512


def main(out_path=None):
    if out_path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_path = os.path.join(root, "datasets/coco2012/images/girl.png")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    img = Image.new("RGB", (W, H), (190, 200, 210))
    d = ImageDraw.Draw(img)
    # floor
    d.rectangle([0, int(0.75 * H), W, H], fill=(150, 140, 120))

    # person: head + torso + legs filling the person box
    (x0, y0, x1, y1), _, _ = BOXES[0]
    px0, py0, px1, py1 = x0 * W, y0 * H, x1 * W, y1 * H
    cx = (px0 + px1) / 2
    head_r = 0.10 * (py1 - py0)
    d.ellipse([cx - head_r, py0, cx + head_r, py0 + 2 * head_r], fill=(224, 172, 138))
    torso_top = py0 + 2 * head_r
    torso_bot = py0 + 0.55 * (py1 - py0)
    d.polygon(
        [(px0 + 0.25 * (px1 - px0), torso_top), (px1 - 0.25 * (px1 - px0), torso_top),
         (px1 - 0.15 * (px1 - px0), torso_bot), (px0 + 0.15 * (px1 - px0), torso_bot)],
        fill=(180, 40, 60),
    )
    for leg in (-1, 1):
        lx = cx + leg * 0.12 * (px1 - px0)
        d.rectangle([lx - 0.06 * (px1 - px0), torso_bot, lx + 0.06 * (px1 - px0), py1],
                    fill=(40, 50, 120))

    # chair: seat + back + legs
    (x0, y0, x1, y1), _, _ = BOXES[1]
    cx0, cy0, cx1, cy1 = x0 * W, y0 * H, x1 * W, y1 * H
    seat_y = cy0 + 0.55 * (cy1 - cy0)
    d.rectangle([cx0, cy0, cx0 + 0.2 * (cx1 - cx0), seat_y], fill=(120, 80, 40))  # back
    d.rectangle([cx0, seat_y, cx1, seat_y + 0.12 * (cy1 - cy0)], fill=(140, 95, 50))  # seat
    for fx in (cx0 + 0.05 * (cx1 - cx0), cx1 - 0.1 * (cx1 - cx0)):
        d.rectangle([fx, seat_y, fx + 0.08 * (cx1 - cx0), cy1], fill=(110, 72, 36))

    # cell phone: rounded slab + screen
    (x0, y0, x1, y1), _, _ = BOXES[2]
    fx0, fy0, fx1, fy1 = x0 * W, y0 * H, x1 * W, y1 * H
    d.rounded_rectangle([fx0, fy0, fx1, fy1], radius=8, fill=(30, 30, 34))
    m = 0.08 * (fx1 - fx0)
    d.rectangle([fx0 + m, fy0 + 2 * m, fx1 - m, fy1 - 2 * m], fill=(80, 160, 220))

    img.save(out_path)
    print(f"wrote {out_path} ({W}x{H})")


if __name__ == "__main__":
    main()
