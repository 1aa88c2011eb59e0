#!/usr/bin/env python
"""Host data-pipeline throughput: python/cv2 loader vs C++ native loader.

The pipeline must outrun the chip (≈2.8k img/s training at b256) or it
becomes the bottleneck (the reference leans on 8 DataLoader workers,
train.py:38).  Prints img/s for both paths on a synthetic JPEG dataset.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    import tempfile

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="loaderbench")
    n = 512
    paths = []
    for i in range(n):
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        p = os.path.join(tmp, f"im{i}.jpg")
        cv2.imwrite(p, img)
        with open(os.path.join(tmp, f"im{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.5 0.5\n")
        paths.append(p)
    lst = os.path.join(tmp, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths))

    # python threaded loader (cv2)
    from fastdet.data import DarknetDataset, DataLoader
    ds = DarknetDataset(lst, 352, 352, augment=None)
    loader = DataLoader(ds, batch_size=64, num_workers=8)
    for _ in loader:   # warm the page cache
        pass
    t0 = time.time()
    count = 0
    for images, labels, mask in loader:
        count += len(images)
    dt = time.time() - t0
    print(f"python/cv2 loader: {count / dt:.0f} img/s")

    # native loader
    from fastdet import native
    if native.available():
        native.preprocess_batch(paths[:64], 352, 352)
        t0 = time.time()
        for i in range(0, n, 64):
            native.preprocess_batch(paths[i:i + 64], 352, 352)
        dt = time.time() - t0
        print(f"native C++ loader: {n / dt:.0f} img/s")
    else:
        print("native loader unavailable")


if __name__ == "__main__":
    main()
