"""Generate a synthetic paired-PNG dataset + YAML manifests for trying the
framework without photoacoustic data.

    python examples/make_dataset.py out_dir --n 64 --size 256

Produces out_dir/{in,gt}_*.png, out_dir/train.yaml, out_dir/val.yaml with the
manifest schema the reference uses (dataset.py:22-46): a YAML list of
{input, ground_truth} path pairs relative to the manifest. The synthetic task
is smooth blob images with their intensity inversion as ground truth.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def blob_image(rng, size):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size), np.float32)
    for _ in range(6):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        s = rng.uniform(0.03, 0.15)
        a = rng.uniform(0.3, 1.0)
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    img = img / img.max()
    return (img * 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--val-frac", type=float, default=0.2)
    args = parser.parse_args()

    from pai_tpu.utils.images import write_png

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    train, val = [], []
    n_val = int(args.n * args.val_frac)
    for i in range(args.n):
        x = blob_image(rng, args.size)
        y = 255 - x
        write_png(x, os.path.join(args.out_dir, f"in_{i}.png"))
        write_png(y, os.path.join(args.out_dir, f"gt_{i}.png"))
        entry = f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n"
        (val if i < n_val else train).append(entry)
    with open(os.path.join(args.out_dir, "train.yaml"), "w") as f:
        f.write("".join(train))
    with open(os.path.join(args.out_dir, "val.yaml"), "w") as f:
        f.write("".join(val))
    print(f"wrote {args.n} pairs to {args.out_dir} "
          f"({len(train)} train / {len(val)} val)")


if __name__ == "__main__":
    main()
