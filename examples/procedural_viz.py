"""Render a labeled grid of the procedural shape-counting dataset.

The task behind CONVERGENCE.md: count the circles (1-5), spot the optional
square; triangles/backgrounds are distractors (vitx/data/procedural.py).
Writes ``examples/procedural_grid.png`` — one column per class, rows are
independent samples.

Run: ``python examples/procedural_viz.py``
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(rows: int = 3, image_size: int = 224):
    from PIL import Image

    from vitx.data.procedural import NUM_CLASSES, ProceduralShapes

    ds = ProceduralShapes(num_examples=4096, image_size=image_size, seed=0)
    by_class = {k: [] for k in range(NUM_CLASSES)}
    for i in range(len(ds)):
        lab = int(ds.labels[i])
        if len(by_class[lab]) < rows:
            by_class[lab].append(i)
        if all(len(v) >= rows for v in by_class.values()):
            break

    pad = 4
    s = image_size
    grid = np.full((rows * (s + pad) + pad,
                    NUM_CLASSES * (s + pad) + pad, 3), 255, np.uint8)
    for k in range(NUM_CLASSES):
        for r, idx in enumerate(by_class[k]):
            img, lab = ds.get_example(idx)
            assert lab == k
            y0 = pad + r * (s + pad)
            x0 = pad + k * (s + pad)
            grid[y0:y0 + s, x0:x0 + s] = img

    out = pathlib.Path(__file__).parent / "procedural_grid.png"
    Image.fromarray(grid).save(out)
    print(f"wrote {out} — columns: "
          + ", ".join(ds.classes))


if __name__ == "__main__":
    main()
